// CTC prefix beam search with n-gram LM fusion — native host decoder.
//
// Replaces the reference's ctcdecode (C++) + KenLM (C++) dependency
// (decoders.py:19-55): same parameters (beam_width, alpha, beta,
// cutoff_top_n, cutoff_prob, blank id, labels) and the same fusion rule
// (word-level LM applied when a space closes a word:
// score += alpha * lm_logp(word | context) + beta).
//
// The LM is a self-contained ARPA-format n-gram reader (KenLM's input
// format) with standard Katz backoff scoring. Build: g++ -O3 -shared -fPIC.
//
// Algorithm: Hannun et al. 2014 prefix beam search in log space.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -1e30f;
constexpr float kLog10 = 2.302585092994046f;  // ARPA log10 -> natural log

inline float logsumexp(float a, float b) {
  if (a <= kNegInf / 2) return b;
  if (b <= kNegInf / 2) return a;
  float m = std::max(a, b);
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// ---------------- ARPA n-gram LM ----------------

struct NgramLM {
  // key: joined word-ids; value: (logp, backoff) in natural log
  std::unordered_map<std::string, std::pair<float, float>> ngrams;
  std::unordered_map<std::string, int> vocab;
  int order = 0;
  int unk_id = -1;

  int word_id(const std::string& w) const {
    auto it = vocab.find(w);
    return it == vocab.end() ? unk_id : it->second;
  }

  static std::string key(const std::vector<int>& ids, size_t begin, size_t end) {
    std::string k;
    for (size_t i = begin; i < end; ++i) {
      if (!k.empty()) k.push_back(' ');
      k += std::to_string(ids[i]);
    }
    return k;
  }

  bool load(const std::string& path) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    int current_order = 0;
    bool in_data = false;
    while (std::getline(f, line)) {
      if (line.empty()) continue;
      if (line.rfind("\\data\\", 0) == 0) { in_data = true; continue; }
      if (line.rfind("\\end\\", 0) == 0) break;
      if (line[0] == '\\') {  // "\N-grams:"
        current_order = std::atoi(line.c_str() + 1);
        order = std::max(order, current_order);
        continue;
      }
      if (current_order == 0) continue;
      std::istringstream ss(line);
      float logp, backoff = 0.0f;
      if (!(ss >> logp)) continue;
      std::vector<std::string> words(current_order);
      for (int i = 0; i < current_order; ++i)
        if (!(ss >> words[i])) goto next_line;
      ss >> backoff;  // optional
      {
        std::vector<int> ids(current_order);
        for (int i = 0; i < current_order; ++i) {
          auto it = vocab.find(words[i]);
          if (it == vocab.end()) {
            int id = static_cast<int>(vocab.size());
            vocab.emplace(words[i], id);
            ids[i] = id;
          } else {
            ids[i] = it->second;
          }
        }
        ngrams[key(ids, 0, ids.size())] = {logp * kLog10, backoff * kLog10};
      }
      next_line:;
    }
    auto it = vocab.find("<unk>");
    unk_id = it == vocab.end() ? -1 : it->second;
    return order > 0;
  }

  // score of word ids.back() given the preceding context (Katz backoff)
  float score(const std::vector<int>& ids) const {
    size_t begin = ids.size() > static_cast<size_t>(order)
                       ? ids.size() - order : 0;
    return score_from(ids, begin);
  }

  float score_from(const std::vector<int>& ids, size_t begin) const {
    if (begin >= ids.size()) return kNegInf;
    auto it = ngrams.find(key(ids, begin, ids.size()));
    if (it != ngrams.end()) return it->second.first;
    if (begin + 1 == ids.size()) {
      // unseen unigram -> <unk> if present
      if (unk_id >= 0) {
        auto u = ngrams.find(std::to_string(unk_id));
        if (u != ngrams.end()) return u->second.first;
      }
      return -10.0f * kLog10;
    }
    float backoff = 0.0f;
    auto ctx = ngrams.find(key(ids, begin, ids.size() - 1));
    if (ctx != ngrams.end()) backoff = ctx->second.second;
    return backoff + score_from(ids, begin + 1);
  }
};

// ---------------- prefix beam search ----------------

struct Beam {
  std::vector<int> prefix;      // token ids (chars)
  std::vector<int> words;       // completed word ids for LM context
  float p_b = kNegInf;          // log prob ending in blank
  float p_nb = kNegInf;         // log prob ending in non-blank
  float lm_score = 0.0f;        // accumulated alpha*lm + beta*word_count

  float total() const { return logsumexp(p_b, p_nb) + lm_score; }
};

struct Decoder {
  std::vector<std::string> labels;
  int blank_id;
  int space_id = -1;
  NgramLM lm;
  bool has_lm = false;
  float alpha, beta;
  int beam_width, cutoff_top_n;
  float cutoff_prob;

  // NOTE: the LM context (completed words + accumulated alpha*lm + beta
  // bonuses) is a DETERMINISTIC function of the prefix, so it is initialized
  // exactly once when a prefix first appears, regardless of which parent
  // created it.
  std::vector<std::pair<std::vector<int>, float>> decode(
      const float* log_probs, int T, int C, int topk) {
    std::vector<Beam> beams(1);
    beams[0].p_b = 0.0f;

    std::vector<int> cand(C);
    for (int t = 0; t < T; ++t) {
      const float* lp = log_probs + static_cast<int64_t>(t) * C;
      // candidate pruning: top cutoff_top_n classes w/ cumulative cutoff_prob
      for (int c = 0; c < C; ++c) cand[c] = c;
      int ncand = std::min(cutoff_top_n, C);
      std::partial_sort(cand.begin(), cand.begin() + ncand, cand.end(),
                        [&](int a, int b) { return lp[a] > lp[b]; });
      if (cutoff_prob < 1.0f) {
        float cum = 0.0f;
        int keep = 0;
        for (; keep < ncand; ++keep) {
          cum += std::exp(lp[cand[keep]]);
          if (cum >= cutoff_prob) { ++keep; break; }
        }
        ncand = std::max(1, keep);
      }

      std::unordered_map<std::string, size_t> index;
      std::vector<Beam> next;
      next.reserve(beams.size() * (ncand + 1));

      // ext_char < 0: same prefix as parent. ext_char >= 0: prefix =
      // parent.prefix + ext_char (LM bonus applied if ext_char is space).
      auto get_next = [&](const Beam& parent, const std::vector<int>& prefix,
                          int ext_char) -> Beam& {
        std::string k;
        k.reserve(prefix.size() * 3);
        for (int id : prefix) { k += std::to_string(id); k.push_back(','); }
        auto it = index.find(k);
        if (it != index.end()) return next[it->second];
        index.emplace(std::move(k), next.size());
        next.push_back(Beam());
        Beam& b = next.back();
        b.prefix = prefix;
        b.words = parent.words;
        b.lm_score = parent.lm_score;
        if (ext_char == space_id && has_lm) {
          std::string word;
          for (size_t i = parent.prefix.size(); i-- > 0;) {
            if (parent.prefix[i] == space_id) break;
            word = labels[parent.prefix[i]] + word;
          }
          if (!word.empty()) {
            b.words.push_back(lm.word_id(word));
            b.lm_score += alpha * lm.score(b.words) + beta;
          }
        }
        return b;
      };

      for (const Beam& beam : beams) {
        float p_total = logsumexp(beam.p_b, beam.p_nb);
        for (int ci = 0; ci < ncand; ++ci) {
          int c = cand[ci];
          float p = lp[c];
          if (c == blank_id) {
            Beam& nb = get_next(beam, beam.prefix, -1);
            nb.p_b = logsumexp(nb.p_b, p_total + p);
          } else if (!beam.prefix.empty() && c == beam.prefix.back()) {
            // repeated char: continues the same prefix from p_nb; starts a
            // new (doubled) char only across a blank
            Beam& same = get_next(beam, beam.prefix, -1);
            same.p_nb = logsumexp(same.p_nb, beam.p_nb + p);
            if (beam.p_b > kNegInf / 2) {
              std::vector<int> ext = beam.prefix;
              ext.push_back(c);
              Beam& nb = get_next(beam, ext, c);
              nb.p_nb = logsumexp(nb.p_nb, beam.p_b + p);
            }
          } else {
            std::vector<int> ext = beam.prefix;
            ext.push_back(c);
            Beam& nb = get_next(beam, ext, c);
            nb.p_nb = logsumexp(nb.p_nb, p_total + p);
          }
        }
      }

      std::sort(next.begin(), next.end(),
                [](const Beam& a, const Beam& b) { return a.total() > b.total(); });
      if (static_cast<int>(next.size()) > beam_width) next.resize(beam_width);
      beams.swap(next);
    }

    std::vector<std::pair<std::vector<int>, float>> out;
    for (int i = 0; i < std::min<int>(topk, beams.size()); ++i)
      out.emplace_back(beams[i].prefix, beams[i].total());
    return out;
  }
};

}  // namespace

extern "C" {

void* bsd_create(const char** labels, int num_labels, int blank_id,
                 const char* lm_path, float alpha, float beta, int beam_width,
                 int cutoff_top_n, float cutoff_prob) {
  auto* d = new Decoder();
  d->labels.assign(labels, labels + num_labels);
  d->blank_id = blank_id;
  for (int i = 0; i < num_labels; ++i)
    if (d->labels[i] == " ") d->space_id = i;
  if (lm_path != nullptr && lm_path[0] != '\0')
    d->has_lm = d->lm.load(lm_path);
  d->alpha = alpha;
  d->beta = beta;
  d->beam_width = beam_width;
  d->cutoff_top_n = cutoff_top_n > 0 ? cutoff_top_n : num_labels;
  d->cutoff_prob = cutoff_prob;
  return d;
}

int bsd_has_lm(void* handle) { return static_cast<Decoder*>(handle)->has_lm; }

// decode one utterance; returns number of hypotheses written.
// out_tokens: (topk, max_len) row-major, -1 padded; out_lens/out_scores: (topk,)
int bsd_decode(void* handle, const float* log_probs, int T, int C, int topk,
               int max_len, int* out_tokens, int* out_lens, float* out_scores) {
  auto* d = static_cast<Decoder*>(handle);
  auto hyps = d->decode(log_probs, T, C, topk);
  for (size_t i = 0; i < hyps.size(); ++i) {
    int len = std::min<int>(hyps[i].first.size(), max_len);
    for (int j = 0; j < len; ++j) out_tokens[i * max_len + j] = hyps[i].first[j];
    for (int j = len; j < max_len; ++j) out_tokens[i * max_len + j] = -1;
    out_lens[i] = len;
    out_scores[i] = hyps[i].second;
  }
  return static_cast<int>(hyps.size());
}

void bsd_free(void* handle) { delete static_cast<Decoder*>(handle); }

}  // extern "C"
