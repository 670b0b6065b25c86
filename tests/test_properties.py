"""Property-based tests (hypothesis) for the deterministic host components."""
import numpy as np
from hypothesis import given, settings, strategies as st

from convasr_tpu.metrics import Needleman, cer, edit_distance, wer
from convasr_tpu.metrics.analyzer import align_strings
from convasr_tpu.text import CharTokenizer

RU = 'абвгд'
texts = st.text(alphabet=RU + ' ', max_size=24)
words = st.text(alphabet=RU, min_size=0, max_size=10)


class TestEditDistanceProperties:
    @given(words, words)
    @settings(max_examples=200, deadline=None)
    def test_metric_axioms(self, a, b):
        d = edit_distance(a, b)
        assert d == edit_distance(b, a)                    # symmetry
        assert (d == 0) == (a == b)                        # identity
        assert d <= max(len(a), len(b))                    # upper bound
        assert d >= abs(len(a) - len(b))                   # lower bound

    @given(words, words, words)
    @settings(max_examples=100, deadline=None)
    def test_triangle_inequality(self, a, b, c):
        assert edit_distance(a, c) <= edit_distance(a, b) + edit_distance(b, c)

    @given(texts, texts)
    @settings(max_examples=100, deadline=None)
    def test_cer_wer_nonnegative(self, hyp, ref):
        assert cer(hyp=hyp, ref=ref) >= 0
        assert wer(hyp=hyp, ref=ref) >= 0


class TestTokenizerProperties:
    TOK = CharTokenizer(RU)

    @given(st.text(alphabet=RU + ' ', max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, text):
        [ids] = self.TOK.encode([text])
        assert self.TOK.decode([ids]) == [text]

    @given(st.text(max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_arbitrary_text_never_crashes(self, text):
        [ids] = self.TOK.encode([text])
        assert all(0 <= i < self.TOK.vocab_size for i in ids)


class TestAlignmentProperties:
    @given(texts.filter(lambda s: s.strip()), texts.filter(lambda s: s.strip()))
    @settings(max_examples=100, deadline=None)
    def test_align_strings_invariants(self, hyp, ref):
        h, r = align_strings(hyp=hyp, ref=ref)
        assert len(h) == len(r)
        # stripping placeholders recovers the (whitespace-normalized) inputs
        assert h.replace('|', '').split() == hyp.split()
        assert r.replace('|', '').split() == ref.split()

    @given(st.lists(words.filter(bool), min_size=1, max_size=6),
           st.lists(words.filter(bool), min_size=1, max_size=6))
    @settings(max_examples=100, deadline=None)
    def test_needleman_preserves_sequences(self, a, b):
        nw = Needleman(score_null=5, score_sub=-3, score_del=-4, score_ins=-3)
        aa, bb = nw.align(a, b)
        assert len(aa) == len(bb)
        assert [w for w in aa if '|' not in w] == a
        assert [w for w in bb if '|' not in w] == b
