"""NovoGrad / schedule tests vs a torch oracle implementing the reference
semantics (optimizers.py:66-90)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from convasr_tpu.train.optim import (
    multistep_lr, make_optimizer, novograd, polynomial_decay_lr, scale_by_novograd,
)


class TorchNovoGradOracle:
    """Reference NovoGrad semantics re-implemented for testing."""

    def __init__(self, params, lr=1.0, betas=(0.95, 0.98), eps=1e-8,
                 weight_decay=0.0, dampening=False):
        self.params = params
        self.lr, self.betas, self.eps = lr, betas, eps
        self.weight_decay, self.dampening = weight_decay, dampening
        self.state = [dict() for _ in params]

    @torch.no_grad()
    def step(self, grads):
        for p, g, st in zip(self.params, grads, self.state):
            g2 = (g ** 2).sum()
            st['ema'] = g2 if 'ema' not in st else st['ema'] * self.betas[1] + g2 * (1 - self.betas[1])
            d = g / (st['ema'] + self.eps).sqrt()
            if self.weight_decay > 0:
                d = d + self.weight_decay * p
            if self.dampening:
                d = d * (1 - self.betas[0])
            st['mom'] = st['mom'].mul(self.betas[0]).add(d) if 'mom' in st else d
            p.add_(st['mom'], alpha=-self.lr)


def run_novograd_compare(weight_decay=0.0, dampening=False, steps=5, lr=0.1):
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    p1 = rng.randn(5).astype(np.float32)
    grads = [(rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32))
             for _ in range(steps)]

    # torch oracle
    tp = [torch.as_tensor(p0.copy()), torch.as_tensor(p1.copy())]
    opt_t = TorchNovoGradOracle(tp, lr=lr, weight_decay=weight_decay, dampening=dampening)
    for g0, g1 in grads:
        opt_t.step([torch.as_tensor(g0), torch.as_tensor(g1)])

    # jax
    params = dict(a=jnp.asarray(p0), b=jnp.asarray(p1))
    opt = novograd(lambda s: lr, weight_decay=weight_decay, dampening=dampening)
    state = opt.init(params)
    for g0, g1 in grads:
        updates, state = opt.update(dict(a=jnp.asarray(g0), b=jnp.asarray(g1)), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params['a']), tp[0].numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params['b']), tp[1].numpy(), rtol=1e-5, atol=1e-6)


class TestNovoGrad:
    def test_basic(self):
        run_novograd_compare()

    def test_weight_decay(self):
        run_novograd_compare(weight_decay=1e-3)

    def test_dampening(self):
        run_novograd_compare(dampening=True)

    def test_single_step_matches_momentum_init(self):
        run_novograd_compare(steps=1)


class TestSchedules:
    def test_multistep(self):
        sched = multistep_lr(1.0, gamma=0.1, milestones=[10, 20])
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(10)) == pytest.approx(0.1)
        assert float(sched(15)) == pytest.approx(0.1)
        assert float(sched(25)) == pytest.approx(0.01)

    def test_polynomial_warmup(self):
        sched = polynomial_decay_lr(1.0, decay_steps=100, warmup_steps=10,
                                    begin_decay_at=10, end_lr=0.0)
        assert float(sched(5)) == pytest.approx(0.5)
        assert float(sched(10)) == pytest.approx(1.0)
        assert float(sched(60)) == pytest.approx(0.5)
        assert float(sched(110)) == pytest.approx(0.0)

    def test_make_optimizer_names(self):
        params = dict(w=jnp.ones((2, 2)))
        for name in ['sgd', 'adamw', 'novograd', 'fusednovograd']:
            opt = make_optimizer(name, learning_rate=0.1)
            state = opt.init(params)
            updates, _ = opt.update(dict(w=jnp.ones((2, 2))), state, params)
            assert jnp.isfinite(updates['w']).all()

    def test_novograd_trains_quadratic(self):
        # sanity: novograd minimizes a simple quadratic
        params = dict(w=jnp.asarray([3.0, -2.0]))
        opt = novograd(lambda s: 0.05)
        state = opt.init(params)
        for _ in range(200):
            grads = jax.grad(lambda p: jnp.sum(p['w'] ** 2))(params)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        assert float(jnp.abs(params['w']).max()) < 0.1
