"""Pallas CTC kernel vs the scan implementation (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.ops.ctc import ctc_loss as ctc_loss_scan
from convasr_tpu.ops.ctc_pallas import ctc_loss_pallas, vmem_fits


def make_batch(rng, B=4, T=24, C=7, L=5):
    logits = rng.randn(B, T, C).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    y = jnp.asarray(rng.randint(0, C - 1, size=(B, L)).astype(np.int32))
    xlen = jnp.asarray(rng.randint(T // 2, T + 1, size=B).astype(np.int32))
    ylen = jnp.asarray(rng.randint(1, L + 1, size=B).astype(np.int32))
    return lp, y, xlen, ylen


class TestPallasCTC:
    def test_forward_matches_scan(self):
        rng = np.random.RandomState(0)
        for _ in range(3):
            lp, y, xlen, ylen = make_batch(rng)
            ours = np.asarray(ctc_loss_pallas(lp, y, xlen, ylen, None, True))
            ref = np.asarray(ctc_loss_scan(lp, y, xlen, ylen))
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_empty_target(self):
        rng = np.random.RandomState(1)
        lp, y, xlen, ylen = make_batch(rng, B=2)
        ylen = jnp.asarray([0, 3], jnp.int32)
        ours = np.asarray(ctc_loss_pallas(lp, y, xlen, ylen, None, True))
        ref = np.asarray(ctc_loss_scan(lp, y, xlen, ylen))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_batch_not_multiple_of_tile(self):
        rng = np.random.RandomState(2)
        lp, y, xlen, ylen = make_batch(rng, B=3)
        ours = np.asarray(ctc_loss_pallas(lp, y, xlen, ylen, None, True))
        ref = np.asarray(ctc_loss_scan(lp, y, xlen, ylen))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_gradient_matches_scan(self):
        rng = np.random.RandomState(3)
        B, T, C, L = 2, 16, 6, 4
        logits = rng.randn(B, T, C).astype(np.float32)
        y = jnp.asarray(rng.randint(0, C - 1, size=(B, L)).astype(np.int32))
        xlen = jnp.asarray([16, 12], jnp.int32)
        ylen = jnp.asarray([4, 3], jnp.int32)

        def loss_pallas(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return ctc_loss_pallas(lp, y, xlen, ylen, None, True).sum()

        def loss_scan(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return ctc_loss_scan(lp, y, xlen, ylen).sum()

        g_pallas = np.asarray(jax.grad(loss_pallas)(jnp.asarray(logits)))
        g_scan = np.asarray(jax.grad(loss_scan)(jnp.asarray(logits)))
        np.testing.assert_allclose(g_pallas, g_scan, rtol=1e-3, atol=1e-4)

    def test_weighted_cotangent(self):
        rng = np.random.RandomState(4)
        lp, y, xlen, ylen = make_batch(rng, B=2)
        w = jnp.asarray([0.5, 2.0])

        def f(lp_):
            return jnp.sum(w * ctc_loss_pallas(lp_, y, xlen, ylen, None, True))

        def f_ref(lp_):
            return jnp.sum(w * ctc_loss_scan(lp_, y, xlen, ylen))

        g1 = np.asarray(jax.grad(f)(lp))
        g2 = np.asarray(jax.grad(f_ref)(lp))
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)

    def test_vmem_guard(self):
        assert vmem_fits(B=64, T=600, L=60)
        assert not vmem_fits(B=64, T=40000, L=500)
