"""Optimizers and LR schedules (optax-style, pure JAX).

Behavior spec: /root/reference/optimizers.py — NovoGrad optimizers.py:66-90
(layer-wise second-moment normalization), larc_ optimizers.py:93-106,
MultiStepLR/PolynomialDecayLR/NoopLR optimizers.py:18-63.

NovoGrad here is an `optax.GradientTransformation` whose semantics match the
reference exactly, including the first-step initialization (ema := g², and
momentum := normalized grad, NOT scaled by (1-beta1)).
"""
import typing

import chex
import jax
import jax.numpy as jnp
import optax


class NovoGradState(typing.NamedTuple):
    step: chex.Array
    grads_ema: typing.Any   # per-leaf scalar EMA of sum(grad^2)
    momentum: typing.Any


def scale_by_novograd(betas=(0.95, 0.98), eps: float = 1e-8,
                      weight_decay: float = 0.0, dampening: bool = False):
    b1, b2 = betas

    def init_fn(params):
        return NovoGradState(
            step=jnp.zeros([], jnp.int32),
            grads_ema=jax.tree.map(lambda p: jnp.zeros([], jnp.float32), params),
            momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        first = state.step == 0

        def leaf(g, ema, mom, p):
            g2 = jnp.sum(jnp.square(g.astype(jnp.float32)))
            new_ema = jnp.where(first, g2, ema * b2 + g2 * (1.0 - b2))
            d = g / jnp.sqrt(new_ema + eps)
            if weight_decay > 0:
                d = d + weight_decay * p
            if dampening:
                d = d * (1.0 - b1)
            new_mom = jnp.where(first, d, mom * b1 + d)
            return new_ema, new_mom

        flat_g, treedef = jax.tree.flatten(updates)
        flat_ema = treedef.flatten_up_to(state.grads_ema)
        flat_mom = treedef.flatten_up_to(state.momentum)
        flat_p = treedef.flatten_up_to(params) if params is not None else [None] * len(flat_g)
        out = [leaf(g, e, m, p) for g, e, m, p in zip(flat_g, flat_ema, flat_mom, flat_p)]
        new_ema = jax.tree.unflatten(treedef, [o[0] for o in out])
        new_mom = jax.tree.unflatten(treedef, [o[1] for o in out])
        new_updates = jax.tree.map(lambda m: -m, new_mom)
        return new_updates, NovoGradState(state.step + 1, new_ema, new_mom)

    return optax.GradientTransformation(init_fn, update_fn)


def novograd(learning_rate, betas=(0.95, 0.98), eps: float = 1e-8,
             weight_decay: float = 0.0, dampening: bool = False):
    """NovoGrad with a schedule. Note: the update is -lr * momentum where
    momentum already includes -1 sign from scale_by_novograd."""
    return optax.chain(
        scale_by_novograd(betas=betas, eps=eps, weight_decay=weight_decay, dampening=dampening),
        optax.scale_by_schedule(learning_rate) if callable(learning_rate)
        else optax.scale(learning_rate))


def larc(learning_rate_fn, mode: str = 'clip', eps: float = 1e-7,
         min_update: float = 1e-7, eta: float = 0.1):
    """Layer-wise adaptive rate clipping/scaling of gradients (spec:
    optimizers.py:93-106). Apply BEFORE the optimizer in an optax.chain."""

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        lr = learning_rate_fn(state.count) if callable(learning_rate_fn) else learning_rate_fn

        def leaf(g, p):
            v_norm = jnp.linalg.norm(p.reshape(-1))
            g_norm = jnp.linalg.norm(g.reshape(-1))
            if mode == 'clip':
                s = jnp.clip(eta * v_norm / (lr * (g_norm + eps)), min_update, 1.0)
            else:
                s = jnp.maximum(eta * v_norm / (g_norm + eps), min_update)
            return g * s

        new_updates = jax.tree.map(leaf, updates, params)
        return new_updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


# --- step-based LR schedules (spec: optimizers.py:18-63) ---

def noop_lr(base_lr: float):
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def multistep_lr(base_lr: float, gamma: float, milestones: typing.Sequence[int]):
    milestones = jnp.asarray(sorted(milestones))

    def schedule(step):
        power = jnp.sum(step >= milestones)
        return base_lr * gamma ** power
    return schedule


def polynomial_decay_lr(base_lr: float, decay_steps, power: float = 1.0,
                        begin_decay_at: int = 0, end_lr: float = 0.0,
                        warmup_steps: int = 0):
    """decay_steps may be a callable resolved at trace time (--decay-epochs
    late-binds batches-per-epoch, reference train.py:689)."""
    def schedule(step):
        ds = decay_steps() if callable(decay_steps) else decay_steps
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.where((warmup_steps > 0) & (step < warmup_steps),
                       base_lr * step / max(warmup_steps, 1), base_lr)
        decay_pos = jnp.minimum(jnp.maximum(step - begin_decay_at, 0.0), ds)
        decayed = end_lr + (base_lr - end_lr) * ((ds - decay_pos) / ds) ** power
        # (the reference's decay branch crashes on an undefined variable,
        # optimizers.py:60 — this implements the documented intent)
        return jnp.where(step >= begin_decay_at, decayed, lr)
    return schedule


def make_optimizer(name: str, learning_rate, momentum: float = 0.9,
                   weight_decay: float = 0.0, betas=(0.9, 0.999), eps: float = 1e-8,
                   nesterov: bool = False):
    """Optimizer factory mirroring train.py:657-679 choices
    (SGD | AdamW | NovoGrad | FusedNovoGrad)."""
    lr = learning_rate if callable(learning_rate) else (lambda step: learning_rate)
    name = name.lower()
    if name == 'sgd':
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(lr, momentum=momentum, nesterov=nesterov))
    if name == 'adamw':
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    if name in ('novograd', 'fusednovograd'):
        return optax.chain(
            scale_by_novograd(betas=betas, eps=eps, weight_decay=weight_decay),
            optax.scale_by_schedule(lambda step: lr(step)))
    raise ValueError(f'unknown optimizer {name}')
