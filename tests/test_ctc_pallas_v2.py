"""v2 (time-chunked) Pallas CTC kernel vs scan, interpret mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.ops.ctc import ctc_loss as ctc_loss_scan
from convasr_tpu.ops.ctc_pallas_v2 import ctc_loss_pallas_v2


def make_batch(rng, B=5, T=37, C=7, L=5):
    logits = rng.randn(B, T, C).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    y = jnp.asarray(rng.randint(0, C - 1, size=(B, L)).astype(np.int32))
    xlen = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    ylen = jnp.asarray(rng.randint(1, L + 1, size=B).astype(np.int32))
    return lp, y, xlen, ylen


class TestPallasV2:
    def test_forward_matches_scan(self):
        rng = np.random.RandomState(0)
        for trial in range(3):
            lp, y, xlen, ylen = make_batch(rng)
            ours = np.asarray(ctc_loss_pallas_v2(lp, y, xlen, ylen, None, True))
            ref = np.asarray(ctc_loss_scan(lp, y, xlen, ylen))
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4, err_msg=str(trial))

    def test_odd_shapes(self):
        # B and T not multiples of the tile/chunk sizes
        rng = np.random.RandomState(1)
        lp, y, xlen, ylen = make_batch(rng, B=3, T=19, C=6, L=4)
        ours = np.asarray(ctc_loss_pallas_v2(lp, y, xlen, ylen, None, True))
        ref = np.asarray(ctc_loss_scan(lp, y, xlen, ylen))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_empty_target(self):
        rng = np.random.RandomState(2)
        lp, y, xlen, ylen = make_batch(rng, B=2)
        ylen = jnp.asarray([0, 3], jnp.int32)
        ours = np.asarray(ctc_loss_pallas_v2(lp, y, xlen, ylen, None, True))
        ref = np.asarray(ctc_loss_scan(lp, y, xlen, ylen))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_gradient_matches_scan(self):
        rng = np.random.RandomState(3)
        lp, y, xlen, ylen = make_batch(rng, B=2, T=21, C=6, L=4)

        g1 = np.asarray(jax.grad(
            lambda l: ctc_loss_pallas_v2(l, y, xlen, ylen, None, True).sum())(lp))
        g2 = np.asarray(jax.grad(lambda l: ctc_loss_scan(l, y, xlen, ylen).sum())(lp))
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)

    def test_infeasible_is_inf_and_grads_zero(self):
        # rows whose lattice cannot fit into xlen frames: inf loss, zero grad
        B, T, C, L = 3, 18, 6, 5
        rng = np.random.RandomState(4)
        lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), -1)
        y = jnp.asarray(np.tile(np.array([0, 1, 0, 1, 0], np.int32), (B, 1)))
        xlen = jnp.asarray([18, 4, 18], jnp.int32)   # row 1 infeasible (needs >=9)
        ylen = jnp.asarray([5, 5, 3], jnp.int32)
        loss = np.asarray(ctc_loss_pallas_v2(lp, y, xlen, ylen, None, True))
        ref = np.asarray(ctc_loss_scan(lp, y, xlen, ylen))
        assert np.isinf(loss[1]) and np.isinf(ref[1])
        np.testing.assert_allclose(loss[[0, 2]], ref[[0, 2]], rtol=1e-4, atol=1e-4)

        def masked_sum(l):
            out = ctc_loss_pallas_v2(l, y, xlen, ylen, None, True)
            return jnp.where(jnp.isfinite(out), out, 0.0).sum()
        g = np.asarray(jax.grad(masked_sum)(lp))
        assert np.isfinite(g).all()
        assert np.abs(g[1]).max() == 0.0
