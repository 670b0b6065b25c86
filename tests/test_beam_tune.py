"""Per-beam-width (alpha, beta) dev-tuning for the hybrid decoder.

Covers decode/beam.tune_rescore_weights (the productized r5 fix for the
beam-width non-monotonicity root cause — the word bonus beta must rise with
K) and the `tools.py lmtune` operator CLI over `transcribe --logits` dumps.
"""
import json
import pathlib

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

from convasr_tpu.decode.beam import lm_word_scores, load_lm, tune_rescore_weights
from convasr_tpu.text import CharTokenizer
from convasr_tpu.text.ngram_lm import save_arpa, train_ngram_lm

TOK = CharTokenizer('ab')  # a=0 b=1 * . 2 ' '=5 blank=6
BLANK, SPACE = TOK.eps_id, TOK.space_id
REFS = ['ab a', 'ab a', 'ba a', 'ab', 'ba a', 'ab a']
TRAIN_TEXTS = ['ab a', 'ba a', 'ab', 'ab a', 'ba a', 'ab a', 'ab']


def to_text(tokens):
    text = ''.join(TOK.idx2char[t] for t in tokens)
    return ' '.join(text.split())


def make_posteriors(seed=0, noise=0.25):
    """(B, T, 7) log-probs that mostly spell REFS, with enough confusion
    mass (a<->b) that beam candidates differ and ranking matters."""
    rng = np.random.RandomState(seed)
    seqs = []
    for ref in REFS:
        frames = []
        for ch in ref:
            tid = TOK.char2idx[ch]
            for _ in range(2):
                p = np.full(7, 0.01)
                p[tid] = 0.55
                p[1 - tid if tid in (0, 1) else tid] += 0.15
                p[BLANK] = 0.25
                frames.append(p)
        p = np.full(7, 0.01)
        p[BLANK] = 0.9
        frames.append(p)
        seqs.append(np.asarray(frames))
    T = max(len(s) for s in seqs)
    lp = np.full((len(seqs), T, 7), np.log(1e-4), np.float32)
    olen = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        s = s + noise * rng.rand(*s.shape)
        s = s / s.sum(-1, keepdims=True)
        lp[i, :len(s)] = np.log(s).astype(np.float32)
        olen[i] = len(s)
    return lp, olen


@pytest.fixture(scope='module')
def word_arpa(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('lmtune')
    return save_arpa(train_ngram_lm([s.split() for s in TRAIN_TEXTS], order=2),
                     str(tmp / 'word.arpa'))


class TestTuneRescoreWeights:
    def test_tunes_per_k_with_holdout(self, word_arpa):
        lp, olen = make_posteriors()
        res = tune_rescore_weights(
            lp, olen, REFS, TOK, to_text, word_arpa,
            beam_widths=(2, 4), alphas=(0.0, 0.5, 1.0), betas=(0.0, 0.5, 1.0))
        assert set(res) == {2, 4}
        for K, r in res.items():
            assert r['alpha'] in (0.0, 0.5, 1.0)
            assert r['beta'] in (0.0, 0.5, 1.0)
            # oracle (best candidate) can never lose to any ranking rule
            assert r['oracle_wer'] <= r['dev_wer'] + 1e-9
            assert 0.0 <= r['dev_wer'] <= 1.5 and 0.0 <= r['eval_wer'] <= 1.5
        # wider beam exposes a superset of candidates: oracle must not lose
        assert res[4]['oracle_wer'] <= res[2]['oracle_wer'] + 1e-9

    def test_no_holdout_tunes_on_everything(self, word_arpa):
        lp, olen = make_posteriors()
        res = tune_rescore_weights(
            lp, olen, REFS, TOK, to_text, word_arpa, beam_widths=(2,),
            alphas=(0.0, 0.5), betas=(0.0, 0.5), holdout=False)
        assert res[2]['dev_wer'] == pytest.approx(res[2]['eval_wer'])

    def test_lm_word_scores_matches_python_rule(self, word_arpa):
        lm = load_lm(word_arpa)
        texts = ['ab a', 'ba', '']
        scores, counts = lm_word_scores(texts, lm)
        assert list(counts) == [2, 1, 0]
        for t, s in zip(texts, scores):
            words = t.split()
            expected = sum(lm.score(words[:i + 1]) for i in range(len(words)))
            assert float(s) == pytest.approx(expected, abs=1e-4)


class TestLmtuneCLI:
    def test_end_to_end_from_logits_dumps(self, word_arpa, tmp_path):
        from convasr_tpu.cli import tools
        lp, olen = make_posteriors()
        dumps = tmp_path / 'dumps'
        dumps.mkdir()
        for i in range(len(lp)):
            # what `transcribe --logits` writes: raw logits + ref
            # (cli/transcribe.py:614-632); log-probs ARE valid logits
            np.savez(dumps / f'utt{i}.npz', logits_0=lp[i, :olen[i]],
                     ref=REFS[i], hyp='', audio_path=f'utt{i}.wav')
        config = json.load(open(ROOT / 'configs' / 'ru_text_config.json'))
        config['tokenizers']['char_legacy']['alphabet'] = 'ab'
        for section in ('preprocess', 'postprocess'):
            for c in config[section].values():
                c['allowed_chars'] = 'ab '
        cfg = tmp_path / 'text_config.json'
        json.dump(config, open(cfg, 'w'))
        out = tmp_path / 'tuned.json'
        tools.main(['lmtune', '-i', str(dumps), '--lm', word_arpa,
                    '--beam-widths', '2', '4', '--alphas', '0.0', '0.5',
                    '--betas', '0.0', '0.5', '--text-config', str(cfg),
                    '-o', str(out)])
        tuned = json.load(open(out))
        assert set(tuned) == {'2', '4'}
        for r in tuned.values():
            assert {'alpha', 'beta', 'dev_wer', 'eval_wer',
                    'oracle_wer'} <= set(r)
