"""CNLM binary LM format (text/binlm.py + native/ctc_beam.cpp load_binary).

The reference's LM workflow converts .arpa to binary KenLM because big word
LMs are slow to parse per process (/root/reference/README.md:152-172);
ctcdecode then loads the binary (decoders.py:19-45). These tests pin the
in-repo replacement: exact score parity with the ARPA text loaders and
decode equality through every consumer (python beam fallback, C++ beam,
char_lm_table device fusion).
"""
import random

import numpy as np
import pytest

from convasr_tpu.decode.beam import (ArpaLM, BeamSearchDecoder, char_lm_table,
                                     load_lm, load_native, prefix_beam_search)
from convasr_tpu.text.binlm import BinaryLM, build_binary_lm, is_binary_lm
from convasr_tpu.text.ngram_lm import char_tokenize, save_arpa, train_ngram_lm

WORDS = ['аб', 'ав', 'ба', 'вг', 'гв', 'бг', 'привет', 'мир']


@pytest.fixture(scope='module')
def lm_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('binlm')
    rng = random.Random(0)
    sents = [[rng.choice(WORDS) for _ in range(rng.randint(2, 6))]
             for _ in range(300)]
    arpa = save_arpa(train_ngram_lm(sents, order=3), str(tmp / 'word.arpa'))
    binlm = build_binary_lm(arpa, str(tmp / 'word.binlm'))
    return arpa, binlm


class TestFormat:
    def test_magic_detection(self, lm_paths, tmp_path):
        arpa, binlm = lm_paths
        assert is_binary_lm(binlm)
        assert not is_binary_lm(arpa)
        assert not is_binary_lm(str(tmp_path / 'missing.binlm'))
        assert isinstance(load_lm(binlm), BinaryLM)
        assert isinstance(load_lm(arpa), ArpaLM)

    def test_gz_arpa_input(self, lm_paths, tmp_path):
        import gzip
        arpa, binlm = lm_paths
        gz = str(tmp_path / 'word.arpa.gz')
        with open(arpa, 'rb') as f, gzip.open(gz, 'wb') as g:
            g.write(f.read())
        b2 = build_binary_lm(gz, str(tmp_path / 'from_gz.binlm'))
        with open(binlm, 'rb') as f1, open(b2, 'rb') as f2:
            assert f1.read() == f2.read()

    def test_score_parity_with_arpa(self, lm_paths):
        """Exact Katz-backoff score parity on random contexts incl. OOV
        words and full backoff chains (float32 storage tolerance)."""
        arpa, binlm = lm_paths
        a, b = ArpaLM(arpa), BinaryLM(binlm)
        assert b.order == a.order == 3
        rng = random.Random(1)
        pool = WORDS + ['<s>', '</s>', 'неизвестное', 'слово']
        for _ in range(2000):
            ctx = [rng.choice(pool) for _ in range(rng.randint(1, 4))]
            assert a.score(ctx) == pytest.approx(b.score(ctx), abs=1e-5), ctx


class _Tok:
    vocab = list('абвг') + [' ', '|']
    eps_id = 5


def _rand_logprobs(T=60, C=6, seed=0):
    rng = np.random.RandomState(seed)
    return np.log(rng.dirichlet(np.ones(C) * 0.5, size=T).astype(np.float32))


class TestConsumers:
    def test_python_beam_fallback_equal(self, lm_paths):
        arpa, binlm = lm_paths
        lp = _rand_logprobs()
        labels = [str(l) for l in _Tok.vocab]
        out = [prefix_beam_search(lp, _Tok.eps_id, beam_width=8, labels=labels,
                                  lm=load_lm(p), alpha=0.8, beta=0.3,
                                  cutoff_top_n=6)
               for p in (arpa, binlm)]
        assert out[0][0][0] == out[1][0][0]
        assert out[0][0][1] == pytest.approx(out[1][0][1], abs=1e-4)

    @pytest.mark.skipif(load_native() is None, reason='no g++')
    def test_cpp_beam_equal(self, lm_paths):
        """The C++ decoder mmap-loads the binary (NgramLM::load_binary) and
        must produce the identical hypothesis + score as the ARPA text."""
        arpa, binlm = lm_paths
        lp = _rand_logprobs(T=80, seed=3)
        outs = []
        for p in (arpa, binlm):
            d = BeamSearchDecoder(_Tok(), lm_path=p, beam_width=16,
                                  beam_alpha=0.8, beam_beta=0.3, cutoff_top_n=6)
            assert d.lib.bsd_has_lm(d.handle), f'LM failed to load from {p}'
            outs.append(d.decode_one(lp)[0])
        assert outs[0][0] == outs[1][0]
        assert outs[0][1] == pytest.approx(outs[1][1], abs=1e-4)

    def test_char_lm_table_equal(self, lm_paths, tmp_path):
        rng = random.Random(2)
        texts = [' '.join(rng.choice(WORDS) for _ in range(4))
                 for _ in range(100)]
        arpa = save_arpa(train_ngram_lm([char_tokenize(t) for t in texts],
                                        order=2), str(tmp_path / 'char.arpa'))
        binlm = build_binary_lm(arpa, str(tmp_path / 'char.binlm'))
        ta = char_lm_table(ArpaLM(arpa), _Tok.vocab)
        tb = char_lm_table(BinaryLM(binlm), _Tok.vocab)
        np.testing.assert_allclose(tb, ta, atol=1e-5)


class TestNativeRescore:
    """C++ batch word-LM rescoring (ctc_beam.cpp lm_rescore) vs the python
    per-word loop — the hybrid decoder's host stage (decode/beam.py
    rescore_with_lm) must rank identically whichever path runs."""

    @pytest.mark.skipif(load_native() is None, reason='no g++')
    def test_score_parity_incl_oov(self, lm_paths):
        from convasr_tpu.decode.beam import load_native_lm
        arpa, binlm = lm_paths
        native = load_native_lm(binlm)
        assert native is not None and native.order == 3
        py = BinaryLM(binlm)
        rng = random.Random(4)
        pool = WORDS + ['неизвестное', 'слово', '']
        texts = [' '.join(rng.choice(pool) for _ in range(rng.randint(0, 7)))
                 for _ in range(200)] + ['', ' ', '  аб  ']
        lm_scores, word_counts = native.rescore(texts)
        for text, s, w in zip(texts, lm_scores, word_counts):
            words = text.split()
            expect = sum(py.score(words[:i + 1]) for i in range(len(words)))
            assert w == len(words), text
            assert s == pytest.approx(expect, abs=1e-4), text

    @pytest.mark.skipif(load_native() is None, reason='no g++')
    def test_rescore_with_lm_ranking_equal(self, lm_paths, monkeypatch):
        """rescore_with_lm through the native path == forced python path."""
        import convasr_tpu.decode.beam as beam_mod
        arpa, binlm = lm_paths
        lm = load_lm(binlm)
        labels = [str(l) for l in _Tok.vocab]
        rng = random.Random(5)
        char_pool = list('абвг')
        hyps = []
        for k in range(16):
            n_words = rng.randint(1, 4)
            toks = []
            for i in range(n_words):
                if i:
                    toks.append(labels.index(' '))
                toks += [labels.index(rng.choice(char_pool))
                         for _ in range(rng.randint(1, 4))]
            hyps.append((toks, -float(k)))
        got_native = beam_mod.rescore_with_lm(hyps, labels, lm, 0.7, 0.2)
        monkeypatch.setattr(beam_mod, 'load_native_lm', lambda path: None)
        got_python = beam_mod.rescore_with_lm(hyps, labels, lm, 0.7, 0.2)
        assert [t for t, _ in got_native] == [t for t, _ in got_python]
        for (_, sa), (_, sb) in zip(got_native, got_python):
            assert sa == pytest.approx(sb, abs=1e-4)
