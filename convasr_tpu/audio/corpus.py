"""Scaled formant-synthesis corpus: lexicon, bigram grammar, disjoint splits.

The in-image stand-in for real-data accuracy validation (the reference trains
on 2,686-3,369 h of ru_open_stt — /root/reference/datasets/README.md:100-133 —
none of which ships here). Round 4's corpus was a 6-phone/6-word/4-speaker
toy; this builder scales the same source-filter model (audio/synth.py
PHONE_SPECS: vowels, fricatives, stops, nasals, trills) to

  - a >=100-word lexicon of 1-3-syllable phonotactic words,
  - 3-8-word utterances sampled from a seeded bigram grammar (so a word
    n-gram LM has real structure to learn),
  - >=20 speakers with DISJOINT train/dev/test speaker sets,
  - disjoint noise levels and room responses per split (held-out test
    utterances carry an unseen speaker AND an unseen noise level AND an
    unseen reverb).

Everything is deterministic given the seeds: tests, probes, the LM builder,
and the BPE trainer all reconstruct the identical corpus.

Consumers: tests/test_wer_harness.py (TestFormantWERHarness),
scripts/formant_ladder_probe.py (full WER ladder: greedy / beam / beam+LM /
rescore / hybrid), tests/test_bpe_wer.py.
"""
import json
import pathlib
import typing

import numpy as np

from .synth import CONSONANTS, PHONE_SPECS, VOWELS, speaker_profile, synth_sentence

SR = 8000

# condition splits: test noise/reverb levels are NOT seen in training
TRAIN_NOISE = (0.004, 0.012, 0.025)
DEV_NOISE = (0.018,)
TEST_NOISE = (0.035,)
TRAIN_RT60 = (0.0, 0.0, 0.10)     # 1/3 of train utterances reverberant
DEV_RT60 = (0.0, 0.08)
TEST_RT60 = (0.0, 0.16)


def make_lexicon(n_words: int = 120, seed: int = 11,
                 max_syllables: int = 3) -> typing.List[str]:
    """>=n_words unique phonotactic words (CV / CVC / VC syllables) over the
    full PHONE_SPECS inventory, no adjacent repeats (the char pipeline's
    repeat_character convention never triggers), lengths 2-7."""
    rng = np.random.RandomState(seed)
    cons, vows = list(CONSONANTS), list(VOWELS)
    words: list = []
    seen = set()
    while len(words) < n_words:
        n_syll = rng.randint(1, max_syllables + 1)
        w = ''
        for s in range(n_syll):
            pat = ['CV', 'CVC', 'VC', 'CV'][rng.randint(4)] if n_syll > 1 \
                else ['CVC', 'CV', 'VC'][rng.randint(3)]
            for p in pat:
                pool = cons if p == 'C' else vows
                ch = pool[rng.randint(len(pool))]
                while w and ch == w[-1]:
                    ch = pool[rng.randint(len(pool))]
                w += ch
        if 2 <= len(w) <= 7 and w not in seen:
            seen.add(w)
            words.append(w)
    return words


def make_bigram_grammar(words: typing.Sequence[str], seed: int = 12,
                        branching: int = 8) -> typing.Dict[str, typing.List[str]]:
    """Each word gets `branching` allowed successors — the sentence source is
    a random walk on this graph, so train-transcript bigram statistics are
    sparse and LEARNABLE by the word n-gram LM (the LM-decode ladder needs a
    grammar whose constraints greedy decoding ignores)."""
    rng = np.random.RandomState(seed)
    return {w: [words[j] for j in rng.choice(len(words), size=branching,
                                             replace=False)]
            for w in words}


def sample_sentence(rng: np.random.RandomState, words: typing.Sequence[str],
                    grammar: typing.Dict[str, typing.List[str]],
                    min_words: int = 3, max_words: int = 8) -> typing.List[str]:
    n = rng.randint(min_words, max_words + 1)
    w = words[rng.randint(len(words))]
    out = [w]
    for _ in range(n - 1):
        succ = grammar[out[-1]]
        out.append(succ[rng.randint(len(succ))])
    return out


def speaker_sets(n_speakers: int = 20, seed: int = 13):
    """(profiles, train_idx, dev_idx, test_idx) — disjoint speaker splits."""
    rng = np.random.RandomState(seed)
    profiles = [speaker_profile(rng) for _ in range(n_speakers)]
    idx = list(range(n_speakers))
    n_dev = max(1, n_speakers // 10)
    n_test = max(2, n_speakers // 10)
    return (profiles, idx[:n_speakers - n_dev - n_test],
            idx[n_speakers - n_dev - n_test:n_speakers - n_test],
            idx[n_speakers - n_test:])


def _render_split(out_dir: pathlib.Path, split: str, speakers, profiles,
                  words, grammar, utts_per_speaker: int, noise_levels,
                  rt60_levels, seed: int, min_words: int, max_words: int):
    entries = []
    for spk_i in speakers:
        # per-(split, speaker) RNG: resizing one split never reshuffles another
        rng = np.random.RandomState(seed * 1000 + spk_i)
        for u in range(utts_per_speaker):
            sent = sample_sentence(rng, words, grammar, min_words, max_words)
            noise = noise_levels[int(rng.randint(len(noise_levels)))]
            rt60 = rt60_levels[int(rng.randint(len(rt60_levels)))]
            wave = synth_sentence(rng, sent, SR, speaker=profiles[spk_i],
                                  noise=noise, reverb_rt60=rt60,
                                  formant_table=PHONE_SPECS)
            path = out_dir / f'{split}_spk{spk_i:02d}_{u:03d}.wav'
            from . import write_audio
            write_audio(str(path), wave[None, :], SR)
            entries.append(dict(audio_path=str(path), ref=' '.join(sent),
                                begin=0.0, end=len(wave) / SR,
                                speaker_name=f'spk{spk_i:02d}'))
    return entries


def build_corpus(out_dir, n_speakers: int = 20, utts_per_speaker: int = 30,
                 dev_utts_per_speaker: int = 10, test_utts_per_speaker: int = 12,
                 n_words: int = 120, min_words: int = 3, max_words: int = 8,
                 seed: int = 0) -> dict:
    """Render the corpus under out_dir; returns paths + metadata.

    Defaults: 20 speakers (16 train / 2 dev / 2 test), 120-word lexicon,
    3-8-word utterances -> ~480 train / ~20 dev / ~24 test utterances,
    ~25 min of train audio. Scale down (n_speakers, utts_per_speaker,
    max_words) for the CPU test harness; scale up for chip probes.
    """
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    words = make_lexicon(n_words=n_words, seed=seed + 11)
    grammar = make_bigram_grammar(words, seed=seed + 12)
    profiles, train_spk, dev_spk, test_spk = speaker_sets(
        n_speakers=n_speakers, seed=seed + 13)

    splits = {}
    for split, speakers, n_utt, noise, rt60 in [
            ('train', train_spk, utts_per_speaker, TRAIN_NOISE, TRAIN_RT60),
            ('dev', dev_spk, dev_utts_per_speaker, DEV_NOISE, DEV_RT60),
            ('test', test_spk, test_utts_per_speaker, TEST_NOISE, TEST_RT60)]:
        entries = _render_split(out_dir, split, speakers, profiles, words,
                                grammar, n_utt, noise, rt60, seed, min_words,
                                max_words)
        path = out_dir / f'{split}.json'
        with open(path, 'w') as f:
            json.dump(entries, f, ensure_ascii=False)
        splits[split] = str(path)
        splits[f'{split}_entries'] = entries

    # word-LM / BPE training text: TRAIN transcripts only (no test leakage)
    lm_text = out_dir / 'lm.txt'
    _write_lm_text(lm_text, splits['train_entries'])
    splits['lm_text'] = str(lm_text)
    splits['words'] = words
    return splits


def _write_lm_text(lm_text, entries):
    with open(lm_text, 'w') as f:
        for e in entries:
            f.write(e['ref'] + '\n')


def build_eval_split(out_dir, tag: str, noise_levels, rt60_levels,
                     n_speakers: int = 20, utts_per_speaker: int = 12,
                     n_words: int = 120, min_words: int = 3,
                     max_words: int = 8, seed: int = 0) -> str:
    """Render an EXTRA eval split against an existing corpus: identical
    lexicon/grammar/speaker pool (same seeds as build_corpus), TEST speakers,
    but caller-chosen noise/reverb. Purpose: stress conditions for the WER
    ladder — the matched test split saturates near 0 once training converges
    (scripts/formant_ladder_probe.py r5), so decoder deltas (beam/LM/hybrid
    rungs) are measured where the acoustics actually produce errors.
    Returns the split json path; entries land in out_dir as {tag}_*.wav."""
    out_dir = pathlib.Path(out_dir)
    words = make_lexicon(n_words=n_words, seed=seed + 11)
    grammar = make_bigram_grammar(words, seed=seed + 12)
    profiles, _, _, test_spk = speaker_sets(n_speakers=n_speakers,
                                            seed=seed + 13)
    # seed * 1000 + 500 + spk: disjoint from every _render_split RNG stream
    entries = []
    for spk_i in test_spk:
        rng = np.random.RandomState(seed * 1000 + 500 + spk_i)
        for u in range(utts_per_speaker):
            sent = sample_sentence(rng, words, grammar, min_words, max_words)
            noise = noise_levels[int(rng.randint(len(noise_levels)))]
            rt60 = rt60_levels[int(rng.randint(len(rt60_levels)))]
            wave = synth_sentence(rng, sent, SR, speaker=profiles[spk_i],
                                  noise=noise, reverb_rt60=rt60,
                                  formant_table=PHONE_SPECS)
            path = out_dir / f'{tag}_spk{spk_i:02d}_{u:03d}.wav'
            from . import write_audio
            write_audio(str(path), wave[None, :], SR)
            entries.append(dict(audio_path=str(path), ref=' '.join(sent),
                                begin=0.0, end=len(wave) / SR,
                                speaker_name=f'spk{spk_i:02d}'))
    path = out_dir / f'{tag}.json'
    with open(path, 'w') as f:
        json.dump(entries, f, ensure_ascii=False)
    return str(path)
