"""Beam-search decoder tests: python spec vs native C++, LM fusion, greedy."""
import math

import numpy as np
import pytest

from convasr_tpu.decode.beam import (
    ArpaLM, BeamSearchDecoder, GreedyDecoder, load_native, prefix_beam_search,
)
from convasr_tpu.text import CharTokenizer


def softlog(p):
    p = np.asarray(p, np.float64)
    p = p / p.sum(-1, keepdims=True)
    return np.log(np.maximum(p, 1e-10)).astype(np.float32)


ARPA = '''\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<unk>
-0.5\tмир\t-0.3
-0.7\tдом\t-0.3
-0.9\tпривет\t-0.2
-2.0\tмип\t-0.1

\\2-grams:
-0.2\tпривет мир
-1.5\tпривет дом
-0.4\tмир дом

\\end\\
'''


@pytest.fixture
def lm_path(tmp_path):
    path = str(tmp_path / 'lm.arpa')
    with open(path, 'w') as f:
        f.write(ARPA)
    return path


class TestArpaLM:
    def test_unigram(self, lm_path):
        lm = ArpaLM(lm_path)
        assert lm.order == 2
        assert lm.score(['мир']) == pytest.approx(-0.5 * math.log(10))

    def test_bigram(self, lm_path):
        lm = ArpaLM(lm_path)
        assert lm.score(['привет', 'мир']) == pytest.approx(-0.2 * math.log(10))

    def test_backoff(self, lm_path):
        lm = ArpaLM(lm_path)
        # unseen bigram 'дом мир' -> backoff(дом) + unigram(мир)
        expected = (-0.3 + -0.5) * math.log(10)
        assert lm.score(['дом', 'мир']) == pytest.approx(expected)

    def test_unk(self, lm_path):
        lm = ArpaLM(lm_path)
        assert lm.score(['ыыы']) == pytest.approx(-1.0 * math.log(10))


class TestPrefixBeamSearchPython:
    def test_simple_path(self):
        # classes: a, b, blank
        lp = softlog([[0.9, 0.05, 0.05], [0.05, 0.05, 0.9], [0.05, 0.9, 0.05]])
        [(tokens, score)] = prefix_beam_search(lp, blank_id=2, beam_width=8)
        assert tokens == [0, 1]

    def test_repeat_collapse(self):
        lp = softlog([[0.9, 0.05, 0.05], [0.9, 0.05, 0.05]])
        [(tokens, _)] = prefix_beam_search(lp, blank_id=2, beam_width=8)
        assert tokens == [0]

    def test_repeat_across_blank(self):
        lp = softlog([[0.95, 0.01, 0.04], [0.02, 0.01, 0.97], [0.95, 0.01, 0.04]])
        [(tokens, _)] = prefix_beam_search(lp, blank_id=2, beam_width=8)
        assert tokens == [0, 0]

    def test_beats_greedy_on_ambiguous(self):
        # greedy picks per-frame argmax 'ab'; total-path mass favors 'aa'... use
        # the classic case where summing paths matters
        lp = softlog([[0.5, 0.5, 0.0001], [0.4, 0.29, 0.31]])
        hyps = prefix_beam_search(lp, blank_id=2, beam_width=16, topk=3)
        assert len(hyps) >= 2
        assert hyps[0][1] >= hyps[1][1]


class TestNativeParity:
    def test_native_builds(self):
        lib = load_native()
        assert lib is not None, 'g++ native build failed'

    def test_matches_python_no_lm(self):
        tok = CharTokenizer('аб')
        rng = np.random.RandomState(0)
        for trial in range(3):
            lp = softlog(rng.dirichlet(np.ones(tok.vocab_size), size=12))
            dec = BeamSearchDecoder(tok, beam_width=16)
            assert dec.handle is not None
            native = dec.decode_one(lp)
            ref = prefix_beam_search(lp, tok.eps_id, beam_width=16,
                                     labels=[s.lower() for s in tok.vocab], topk=1)
            assert native[0][0] == ref[0][0], trial
            assert native[0][1] == pytest.approx(ref[0][1], abs=1e-3)

    def test_matches_python_with_lm(self, lm_path):
        tok = CharTokenizer('деимпрстüв'.replace('ü', 'о'))
        labels = [s.lower() for s in tok.vocab]
        rng = np.random.RandomState(1)
        lp = softlog(rng.dirichlet(np.ones(tok.vocab_size) * 2, size=10))
        dec = BeamSearchDecoder(tok, lm_path=lm_path, beam_width=8,
                                beam_alpha=0.5, beam_beta=1.0)
        native = dec.decode_one(lp)
        ref = prefix_beam_search(lp, tok.eps_id, beam_width=8, labels=labels,
                                 lm=ArpaLM(lm_path), alpha=0.5, beta=1.0, topk=1)
        assert native[0][0] == ref[0][0]
        assert native[0][1] == pytest.approx(ref[0][1], abs=1e-3)

    def test_lm_steers_to_known_word(self, lm_path):
        # acoustics slightly prefer 'мип' (low LM prob) over 'мир' (high):
        # with enough LM weight the beam should flip to 'мир'
        alphabet = 'мипр'
        tok = CharTokenizer(alphabet)
        labels = [s.lower() for s in tok.vocab]
        m, i, p, r = [labels.index(c) for c in 'мипр']
        blank = tok.eps_id
        C = tok.vocab_size
        frames = []
        for target, alt, pr in [(m, m, 0.95), (i, i, 0.95), (p, r, 0.55)]:
            probs = np.full(C, 0.001)
            probs[target] = pr
            probs[alt] = 1.0 - pr - 0.001 * (C - 2)
            frames.append(probs)
        # close the word with a space so the LM fires
        space_frame = np.full(C, 0.001)
        space_frame[tok.space_id] = 1.0 - 0.001 * (C - 1)
        frames.append(space_frame)
        lp = softlog(np.stack(frames))

        no_lm = BeamSearchDecoder(tok, beam_width=16).decode_one(lp)
        with_lm = BeamSearchDecoder(tok, lm_path=lm_path, beam_width=16,
                                    beam_alpha=2.0, beam_beta=0.0).decode_one(lp)
        decode = lambda toks: ''.join(labels[t] for t in toks)
        assert decode(no_lm[0][0]).strip() == 'мип'
        assert decode(with_lm[0][0]).strip() == 'мир'

    def test_batch_decode_api(self):
        tok = CharTokenizer('аб')
        rng = np.random.RandomState(2)
        lp = softlog(rng.dirichlet(np.ones(tok.vocab_size), size=(2, 8)))
        dec = BeamSearchDecoder(tok, beam_width=8)
        out = dec.decode(lp, output_lengths=[8, 5])
        assert len(out) == 2
        assert all(isinstance(o, list) for o in out)

    def test_threaded_batch_matches_serial(self):
        tok = CharTokenizer('абв')
        rng = np.random.RandomState(3)
        lp = softlog(rng.dirichlet(np.ones(tok.vocab_size), size=(8, 20)))
        serial = BeamSearchDecoder(tok, beam_width=8, num_workers=1).decode(lp)
        threaded = BeamSearchDecoder(tok, beam_width=8, num_workers=4).decode(lp)
        assert serial == threaded


class TestBlankCollapse:
    def test_drops_confident_blank_runs(self):
        from convasr_tpu.decode.beam import collapse_blanks
        C, blank = 4, 3
        frames = []
        for kind in ['a', 'blank'] * 3 + ['blank'] * 20:
            p = np.full(C, 0.0001)
            p[0 if kind == 'a' else blank] = 1 - 0.0001 * (C - 1)
            frames.append(p)
        lp = softlog(np.stack(frames))
        out = collapse_blanks(lp, blank)
        assert out.shape[0] < lp.shape[0]
        # 3 'a' frames + exactly one keeper per blank run (3 runs)
        assert out.shape[0] == 6

    def test_decode_equivalent(self):
        tok = CharTokenizer('аб')
        rng = np.random.RandomState(5)
        # peaky distribution with long blank tails (realistic CTC output)
        T, C = 40, tok.vocab_size
        probs = np.full((T, C), 0.001)
        chars = [0, tok.eps_id, tok.eps_id, 1] + [tok.eps_id] * 30 + [0] * 2 + [tok.eps_id] * 4
        for t, c in enumerate(chars):
            probs[t, c] = 0.99
        lp = softlog(probs)
        full = BeamSearchDecoder(tok, beam_width=16,
                                 blank_collapse_threshold=None).decode_one(lp)
        collapsed = BeamSearchDecoder(tok, beam_width=16,
                                      blank_collapse_threshold=0.999).decode_one(lp)
        assert full[0][0] == collapsed[0][0]


class TestGreedyDecoder:
    def test_decode(self):
        lp = np.zeros((1, 4, 3), np.float32)
        lp[0, :, 1] = 1.0
        out = GreedyDecoder().decode(lp, output_lengths=[3])
        assert out == [[1, 1, 1]]


class TestGzippedArpa:
    def test_gz_matches_plain(self, lm_path, tmp_path):
        """.arpa.gz loads identically to plain ARPA in both the python LM and
        the BeamSearchDecoder path (README 'Language models')."""
        import gzip
        gz_path = str(tmp_path / 'lm.arpa.gz')
        with open(lm_path, 'rb') as f, gzip.open(gz_path, 'wb') as g:
            g.write(f.read())
        lm_plain, lm_gz = ArpaLM(lm_path), ArpaLM(gz_path)
        assert lm_gz.order == lm_plain.order
        assert lm_gz.ngrams == lm_plain.ngrams

        from convasr_tpu.text import CharTokenizer
        tok = CharTokenizer('абвгдежзийклмнопрстуфхцчшщъыьэюя')
        dec_gz = BeamSearchDecoder(tok, lm_path=gz_path, beam_width=8,
                                   beam_alpha=0.5, beam_beta=1.0)
        dec_plain = BeamSearchDecoder(tok, lm_path=lm_path, beam_width=8,
                                      beam_alpha=0.5, beam_beta=1.0)
        rng = np.random.RandomState(0)
        lp = np.log(np.random.RandomState(0).dirichlet(
            np.ones(tok.vocab_size), size=(1, 20)).astype(np.float32))
        out_gz = dec_gz.decode(lp, [20])
        out_plain = dec_plain.decode(lp, [20])
        assert repr(out_gz) == repr(out_plain)


class TestRescoreMode:
    """rescore=True: acoustic-only beam + word-LM rescoring of complete
    hypotheses (the host-only hybrid recipe — scripts/lm_wer_probe.py
    measured it equal to the device hybrid's WER, better than in-beam
    fusion on the confusable probe)."""

    def test_equals_manual_pipeline(self, lm_path):
        from convasr_tpu.decode.beam import load_lm, rescore_with_lm
        tok = CharTokenizer('деимпрстüв'.replace('ü', 'о'))
        labels = [s.lower() for s in tok.vocab]
        rng = np.random.RandomState(3)
        lp = softlog(rng.dirichlet(np.ones(tok.vocab_size) * 2, size=14))
        dec = BeamSearchDecoder(tok, lm_path=lm_path, beam_width=16,
                                beam_alpha=0.7, beam_beta=0.3,
                                rescore=True, rescore_topk=8)
        got = dec.decode_one(lp)
        base = BeamSearchDecoder(tok, beam_width=16, topk=8).decode_one(lp)
        manual = rescore_with_lm(base, labels, load_lm(lm_path), 0.7, 0.3)
        assert got[0][0] == manual[0][0]
        assert got[0][1] == pytest.approx(manual[0][1], abs=1e-3)

    def test_rescore_steers_to_known_word(self, lm_path):
        """Same мип/мир flip as the in-beam fusion test, via rescoring."""
        tok = CharTokenizer('мипр')
        labels = [s.lower() for s in tok.vocab]
        m, i, p, r = [labels.index(c) for c in 'мипр']
        C = tok.vocab_size
        frames = []
        for target, alt, pr in [(m, m, 0.95), (i, i, 0.95), (p, r, 0.55)]:
            probs = np.full(C, 0.001)
            probs[target] = pr
            probs[alt] = 1.0 - pr - 0.001 * (C - 2)
            frames.append(probs)
        space_frame = np.full(C, 0.001)
        space_frame[tok.space_id] = 1.0 - 0.001 * (C - 1)
        frames.append(space_frame)
        lp = softlog(np.stack(frames))
        no_lm = BeamSearchDecoder(tok, beam_width=16).decode_one(lp)
        resc = BeamSearchDecoder(tok, lm_path=lm_path, beam_width=16,
                                 beam_alpha=2.0, beam_beta=0.0,
                                 rescore=True).decode_one(lp)
        decode = lambda toks: ''.join(labels[t] for t in toks)
        assert decode(no_lm[0][0]).strip() == 'мип'
        assert decode(resc[0][0]).strip() == 'мир'

    def test_topk_contract_preserved(self, lm_path):
        tok = CharTokenizer('аб')
        rng = np.random.RandomState(4)
        lp = softlog(rng.dirichlet(np.ones(tok.vocab_size), size=(2, 10)))
        dec = BeamSearchDecoder(tok, lm_path=lm_path, beam_width=8,
                                beam_alpha=0.5, rescore=True, topk=3)
        out = dec.decode(lp, output_lengths=[10, 7])
        assert len(out) == 2 and all(len(o) == 3 for o in out)
