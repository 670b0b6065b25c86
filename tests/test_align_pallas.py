"""Pallas Viterbi alignment vs scan implementation (interpret mode)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import convasr_tpu.ops.align_pallas as ap
from convasr_tpu.ops.ctc import ctc_alignment as scan_align


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ap.pl, 'pallas_call',
                        functools.partial(ap.pl.pallas_call, interpret=True))


def make_batch(rng, B=4, T=24, C=7, L=5):
    logits = rng.randn(B, T, C).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    y = jnp.asarray(rng.randint(0, C - 1, size=(B, L)).astype(np.int32))
    xlen = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    ylen = jnp.asarray(rng.randint(1, L + 1, size=B).astype(np.int32))
    return lp, y, xlen, ylen


class TestPallasAlignment:
    def test_matches_scan(self):
        rng = np.random.RandomState(0)
        for trial in range(3):
            lp, y, xlen, ylen = make_batch(rng)
            ours = np.asarray(ap.ctc_alignment_pallas(lp, y, xlen, ylen))
            ref = np.asarray(scan_align(lp, y, xlen, ylen))
            np.testing.assert_array_equal(ours, ref, err_msg=str(trial))

    def test_odd_batch_and_time(self):
        rng = np.random.RandomState(1)
        lp, y, xlen, ylen = make_batch(rng, B=3, T=19)
        ours = np.asarray(ap.ctc_alignment_pallas(lp, y, xlen, ylen))
        ref = np.asarray(scan_align(lp, y, xlen, ylen))
        np.testing.assert_array_equal(ours, ref)

    def test_monotonic(self):
        rng = np.random.RandomState(2)
        lp, y, xlen, ylen = make_batch(rng, B=4, T=30, C=6, L=6)
        frames = np.asarray(ap.ctc_alignment_pallas(lp, y, xlen, ylen))
        for b in range(4):
            valid = frames[b, :int(ylen[b])]
            assert (np.diff(valid) > 0).all()
            assert valid.max() < int(xlen[b])
