"""Root-cause the hybrid decoder's K non-monotonicity (VERDICT r4 weak #2).

Evidence (r5 stress ladder, noise 0.09 + RT60 0.16): oracle WER improves
monotonically with beam width (K=16: 0.253, K=32: 0.221, K=64: 0.215) while
1-best WER degrades past K=32 — SEARCH is fine, the RANKING rule
`total = ctc + alpha*lm + beta*n_words` (decode/beam.rescore_with_lm,
reference semantics /root/reference/decoders.py:19-45) misranks among the
larger candidate set.

Mechanism hypothesis: lm = sum logP(word|ctx) < 0 per word, so with few
tuning points a large alpha rewards DELETING words (fewer negative terms);
wider beams surface more short hypotheses for the rule to promote. This
probe quantifies it and tests the fixes on held-out utterances:

  rules: (a) standard         ctc + a*lm + b*W
         (b) word-normalized  ctc + a*(lm/max(W,1)) + b*W   (per-word LM)

  protocol: tune (a, b) per (rule, K) on utts[::2] (dev), report WER on
  utts[1::2] (eval) — so "K=64 fixed by retuning" is not an overfit claim.

Inputs: the .npz from formant_ladder_probe --save-lp (posteriors, refs, and
the word-ARPA path of the stress split).

Usage: python scripts/hybrid_rank_probe.py /tmp/ladder_full/lp_n09.npz
"""
import argparse
import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('npz')
    ap.add_argument('--ks', type=int, nargs='+', default=[16, 32, 64])
    ap.add_argument('--device', default='cpu')
    args = ap.parse_args()

    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    d = np.load(args.npz, allow_pickle=True)
    lp, olen = d['lp'], d['olen']
    refs = [str(r) for r in d['refs']]
    word_arpa = str(d['word_arpa'])
    print(f'{len(lp)} utts, T={lp.shape[1]}, split={d["split"]}')

    from convasr_tpu.cli.transcribe import build_parser  # noqa: F401 (env)
    from convasr_tpu.decode.beam import load_lm
    from convasr_tpu.metrics import wer as wer_fn
    from convasr_tpu.ops.beam_device import beam_search_device
    from convasr_tpu.text import ProcessingPipeline

    config = ProcessingPipeline.load_config(
        str(ROOT / 'configs' / 'ru_text_config.json'))
    pipe = ProcessingPipeline.make(config, 'char_legacy')
    tok = pipe.tokenizer
    labels = [str(l).lower() for l in tok.vocab]
    wlm = load_lm(word_arpa)

    def to_text(tokens):
        return pipe.postprocess(pipe.decode([tokens])[0])

    # hypotheses per K (the search output is fixed; only ranking varies)
    hyp_sets = {}
    for K in args.ks:
        tks, lens, scores = beam_search_device(
            jnp.asarray(lp), jnp.asarray(olen), tok.eps_id, beam_width=K,
            cutoff_top_n=8, max_len=int(lp.shape[1]) + 1, compact_tokens=True)
        tks, lens, scores = map(np.asarray, (tks, lens, scores))
        utts = []
        for b in range(len(lp)):
            hyps = []
            for k in range(K):
                toks = tks[b, k, :lens[b, k]].tolist()
                text = to_text(toks)
                words = text.split()
                lm_score = sum(wlm.score(words[:i + 1])
                               for i in range(len(words)))
                hyps.append(dict(text=text, ctc=float(scores[b, k]),
                                 lm=lm_score, W=len(words),
                                 wer=wer_fn(hyp=text, ref=refs[b])))
            utts.append(hyps)
        hyp_sets[K] = utts
        oracle = float(np.mean([min(h['wer'] for h in u) for u in utts]))
        print(f'K={K}: oracle WER {oracle:.4f} | mean candidates with '
              f'W < ref words: '
              f'{np.mean([sum(h["W"] < len(r.split()) for h in u) / len(u) for u, r in zip(utts, refs)]):.2f}')

    def rank_wer(utt_idx, K, rule, a, b):
        tot = 0.0
        for i in utt_idx:
            hyps = hyp_sets[K][i]
            if rule == 'std':
                best = max(hyps, key=lambda h: h['ctc'] + a * h['lm'] + b * h['W'])
            else:
                best = max(hyps, key=lambda h: h['ctc']
                           + a * (h['lm'] / max(h['W'], 1)) + b * h['W'])
            tot += best['wer']
        return tot / len(utt_idx)

    dev_idx = list(range(0, len(lp), 2))
    eval_idx = list(range(1, len(lp), 2))
    alphas = [0.2, 0.3, 0.5, 0.7, 1.0, 1.5, 2.0]
    betas = [0.0, 0.25, 0.5, 1.0, 1.5, 2.0, 3.0]

    results = {}
    print(f'\n{"rule":6s} {"K":>3s} {"dev-tuned (a,b)":>16s} '
          f'{"devWER":>7s} {"evalWER":>8s}')
    for rule in ['std', 'wnorm']:
        for K in args.ks:
            best = None
            for a in alphas:
                for b in betas:
                    w = rank_wer(dev_idx, K, rule, a, b)
                    if best is None or w < best[0]:
                        best = (w, a, b)
            ew = rank_wer(eval_idx, K, rule, best[1], best[2])
            results[f'{rule}_K{K}'] = dict(a=best[1], b=best[2],
                                           dev=best[0], eval=ew)
            print(f'{rule:6s} {K:3d} {f"({best[1]}, {best[2]})":>16s} '
                  f'{best[0]:7.4f} {ew:8.4f}')

    # the r4 configuration for reference: one (a, b) for every K (tuned on
    # dev at K=16, applied to all) — the setup that produced the anomaly
    base = None
    for a in alphas:
        for b in betas:
            w = rank_wer(dev_idx, 16, 'std', a, b)
            if base is None or w < base[0]:
                base = (w, a, b)
    print(f'\nfixed (a={base[1]}, b={base[2]}) tuned at K=16 (the r4 setup):')
    for K in args.ks:
        print(f'  K={K}: eval WER {rank_wer(eval_idx, K, "std", base[1], base[2]):.4f}')
    print(json.dumps(results))


if __name__ == '__main__':
    main()
