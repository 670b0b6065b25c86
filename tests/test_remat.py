"""Rematerialization (--remat) must not change outputs or gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.models.jasper import JasperNet
from convasr_tpu.train.loop import compute_losses


def build(remat):
    return JasperNet(num_input_features=8, num_classes=(6,), repeat=2, num_subblocks=1,
                     residual='dense', kernel_sizes=(3,), kernel_size_prologue=3,
                     kernel_size_epilogue=3, base_width=4, out_width_factors=(2,),
                     out_width_factors_large=(3, 3), dropout=0.0, temporal_mask=True,
                     stride1=2, remat=remat)


class TestRemat:
    def test_forward_and_grads_match(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
        xlen = jnp.asarray([1.0, 0.5])
        y = jnp.asarray(rng.randint(0, 5, size=(2, 1, 4)))
        ylen = jnp.full((2, 1), 4)

        base = build(remat=False)
        variables = base.init(jax.random.PRNGKey(0), x, xlen=xlen)
        rematted = build(remat=True)

        def loss(model, params):
            out = model.apply({'params': params,
                               'batch_stats': variables['batch_stats']}, x, xlen=xlen)
            return jnp.mean(compute_losses(out, y, ylen))

        l0 = float(loss(base, variables['params']))
        l1 = float(loss(rematted, variables['params']))
        assert l0 == pytest.approx(l1, rel=1e-6)

        g0 = jax.grad(lambda p: loss(base, p))(variables['params'])
        g1 = jax.grad(lambda p: loss(rematted, p))(variables['params'])
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
