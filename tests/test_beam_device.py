"""On-device beam search vs the python executable spec."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.decode.beam import prefix_beam_search
from convasr_tpu.ops.beam_device import beam_search_device


def softlog(p):
    p = np.asarray(p, np.float64)
    p = p / p.sum(-1, keepdims=True)
    return np.log(np.maximum(p, 1e-10)).astype(np.float32)


def run_both(lp, blank_id, K=8, N=None):
    C = lp.shape[-1]
    N = N if N is not None else C - 1
    tokens, lengths, scores = beam_search_device(
        jnp.asarray(lp[None]), jnp.asarray([lp.shape[0]], np.int32), blank_id,
        beam_width=K, cutoff_top_n=N, max_len=32)
    dev = np.asarray(tokens[0, 0])[:int(lengths[0, 0])].tolist()
    dev_score = float(scores[0, 0])
    ref = prefix_beam_search(lp, blank_id, beam_width=K,
                             cutoff_top_n=N + 1, topk=1)
    return dev, dev_score, ref[0][0], ref[0][1]


class TestBeamDevice:
    def test_simple_path(self):
        lp = softlog([[0.9, 0.05, 0.05], [0.05, 0.05, 0.9], [0.05, 0.9, 0.05]])
        dev, ds, ref, rs = run_both(lp, blank_id=2)
        assert dev == ref == [0, 1]
        assert ds == pytest.approx(rs, abs=1e-3)

    def test_repeat_collapse_and_split(self):
        lp = softlog([[0.95, 0.01, 0.04], [0.02, 0.01, 0.97], [0.95, 0.01, 0.04]])
        dev, ds, ref, rs = run_both(lp, blank_id=2)
        assert dev == ref == [0, 0]
        assert ds == pytest.approx(rs, abs=1e-3)

    def test_random_parity(self):
        rng = np.random.RandomState(0)
        agree = 0
        for trial in range(10):
            lp = softlog(rng.dirichlet(np.ones(4) * 1.5, size=10))
            dev, ds, ref, rs = run_both(lp, blank_id=3, K=8)
            assert ds == pytest.approx(rs, abs=2e-3), trial
            agree += dev == ref
        assert agree >= 9  # score ties may reorder equal-score beams

    def test_variable_lengths(self):
        rng = np.random.RandomState(1)
        lp = softlog(rng.dirichlet(np.ones(4), size=(2, 12)))
        tokens, lengths, scores = beam_search_device(
            jnp.asarray(lp), jnp.asarray([12, 6], np.int32), 3,
            beam_width=4, cutoff_top_n=3, max_len=16)
        # row 1 decoded on 6 frames must equal decoding the truncated input
        ref = prefix_beam_search(lp[1, :6], 3, beam_width=4, cutoff_top_n=4)
        got = np.asarray(tokens[1, 0])[:int(lengths[1, 0])].tolist()
        assert got == ref[0][0]

    def test_scores_sorted(self):
        rng = np.random.RandomState(2)
        lp = softlog(rng.dirichlet(np.ones(5), size=(1, 15)))
        _, _, scores = beam_search_device(jnp.asarray(lp),
                                          jnp.asarray([15], np.int32), 4,
                                          beam_width=8, cutoff_top_n=4, max_len=16)
        s = np.asarray(scores[0])
        finite = s[np.isfinite(np.maximum(s, -1e29))]
        assert (np.diff(s) <= 1e-5).all()

    def test_jit_and_batch(self):
        rng = np.random.RandomState(3)
        lp = softlog(rng.dirichlet(np.ones(6), size=(4, 20)))
        tokens, lengths, scores = beam_search_device(
            jnp.asarray(lp), jnp.full(4, 20, np.int32), 5,
            beam_width=8, cutoff_top_n=4, max_len=24)
        assert tokens.shape == (4, 8, 24)
        assert np.isfinite(np.asarray(scores[:, 0])).all()
