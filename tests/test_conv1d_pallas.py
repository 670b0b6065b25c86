"""Pallas conv1d kernel: parity with lax.conv (interpret mode) + VJP."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import convasr_tpu.ops.conv1d_pallas as cp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(cp.pl, 'pallas_call',
                        functools.partial(cp.pl.pallas_call, interpret=True))


def lax_conv(x, w):
    K = w.shape[0]
    return jax.lax.conv_general_dilated(x, w, (1,), [(K // 2, K // 2)],
                                        dimension_numbers=('NWC', 'WIO', 'NWC'))


class TestConv1dPallas:
    def test_forward_parity(self):
        rng = np.random.RandomState(0)
        B, T, C, K = 16, 16, 128, 5
        x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
        w = jnp.asarray((rng.randn(K, C, C) * 0.05).astype(np.float32))
        y = cp.conv1d_mxu(x, w, jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(lax_conv(x, w)),
                                   rtol=1e-4, atol=1e-4)

    def test_vjp_parity(self):
        rng = np.random.RandomState(1)
        B, T, C, K = 16, 16, 128, 3
        x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
        w = jnp.asarray((rng.randn(K, C, C) * 0.05).astype(np.float32))
        f = lambda x, w: (cp.conv1d_mxu(x, w, jnp.float32) ** 2).sum()
        g = lambda x, w: (lax_conv(x, w) ** 2).sum()
        gx1, gw1 = jax.grad(f, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(g, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-3, atol=1e-3)

    def test_eligibility(self):
        assert cp.eligible((256, 304, 768), (25, 768, 768))
        assert not cp.eligible((256, 304, 768), (25, 768, 768), stride=2)
        assert not cp.eligible((256, 300, 768), (25, 768, 768))  # T not tile-divisible
        assert not cp.eligible((256, 304, 100), (25, 100, 768))  # channels not 128x
