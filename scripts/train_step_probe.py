"""Decompose the training-step cost on the real chip (run ALONE on the chip).

Slope-timed chains (see scripts/perf_probe.py / CLAUDE.md): each measurement
threads the FULL state through `lax.scan` so nothing is dead-code-eliminated,
and the per-step time is the slope between two chain lengths (cancels the
~25-30 ms tunnel dispatch+fetch constant).

Stages:
  fwd_infer   model fwd, training=False (the transcribe path)
  fwd_train   model fwd, training=True (dropout+dither RNG) + CTC loss
  grad        value_and_grad of the training loss
  step        full train_step (grad + NovoGrad update + nan-guard + norms)

Usage: python scripts/train_step_probe.py [B] [T_sec]
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

from convasr_tpu.infra.utils import enable_compilation_cache

enable_compilation_cache()


def timed(fn, *args):
    np.asarray(fn(*args)).reshape(-1)[:1]
    tic = time.perf_counter()
    np.asarray(fn(*args)).reshape(-1)[:1]
    return time.perf_counter() - tic


def slope(make_chain, args, short=4, long=12):
    return (timed(make_chain(long), *args) - timed(make_chain(short), *args)) / (long - short)


def main():
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend
    from convasr_tpu.models.zoo import create_model
    from convasr_tpu.train import loop as train_loop
    from convasr_tpu.train.optim import make_optimizer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    sr = 8000
    T = int(sr * T_sec)
    L = 128  # target chars

    frontend = LogFilterBankFrontend(out_channels=64, sample_rate=sr,
                                     window_size=0.02, window_stride=0.01,
                                     dither=1e-5)
    model = create_model('JasperNetBig', num_input_features=64, num_classes=(38,),
                         frontend=frontend, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    batch = dict(
        x=jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1),
        xlen=jnp.ones((B,), jnp.float32),
        y=jnp.asarray(rng.randint(0, 33, (B, 1, L)).astype(np.int32)),
        ylen=jnp.asarray(np.full((B, 1), L, np.int32)))

    optimizer = make_optimizer('NovoGrad', 1e-2, weight_decay=1e-3,
                               betas=(0.95, 0.5))
    state = train_loop.init_train_state(
        model, optimizer, batch, jax.random.PRNGKey(0))
    state = jax.device_put(state)
    train_step = train_loop.make_train_step(model, optimizer)

    audio_sec = B * T_sec

    def report(name, per):
        print(f'{name:10s} {per * 1e3:8.1f} ms/it   {audio_sec / per:8.0f} audio-sec/s')
        return per

    # --- fwd inference (training=False), norm-fed chain over x-like feature
    def make_fwd_infer(iters):
        @jax.jit
        def f(variables, x, xlen):
            def body(x, _):
                out = model.apply(variables, x, xlen=xlen, training=False)
                lp = out['log_probs'][0]
                # feed a full-rank signal derived from the output back into x
                d = jnp.mean(lp.astype(jnp.float32)) * 1e-6
                return x + d, ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x[0, :2]
        return f
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    fwd_i = report('fwd_infer', slope(make_fwd_infer, (variables, batch['x'], batch['xlen'])))

    # --- fwd training-mode + CTC loss (no grad)
    def make_fwd_train(iters):
        @jax.jit
        def f(params, batch_stats, batch, key):
            def body(carry, _):
                x, key = carry
                key, sub = jax.random.split(key)
                b = dict(batch, x=x)
                k_d, k_a, k_dth = jax.random.split(sub, 3)
                outputs, _ = model.apply(
                    {'params': params, 'batch_stats': batch_stats}, b['x'],
                    xlen=b['xlen'], training=True, mutable=['batch_stats'],
                    rngs={'dropout': k_d, 'augment': k_a}, dither_key=k_dth)
                loss = jnp.mean(train_loop.compute_losses(outputs, b['y'], b['ylen']))
                return (x + loss * 1e-9, key), ()
            (x, _), _ = jax.lax.scan(body, (batch['x'], key), None, length=iters)
            return x[0, :2]
        return f
    fwd_t = report('fwd_train', slope(
        make_fwd_train, (state.params, state.batch_stats, batch, jax.random.PRNGKey(1))))

    # --- value_and_grad (no optimizer): thread grads into params epsilon-style
    def make_grad(iters):
        @jax.jit
        def f(params, batch_stats, batch, key):
            def loss_fn(params, x, key):
                k_d, k_a, k_dth = jax.random.split(key, 3)
                outputs, mutated = model.apply(
                    {'params': params, 'batch_stats': batch_stats}, x,
                    xlen=batch['xlen'], training=True, mutable=['batch_stats'],
                    rngs={'dropout': k_d, 'augment': k_a}, dither_key=k_dth)
                return jnp.mean(train_loop.compute_losses(outputs, batch['y'], batch['ylen']))
            def body(carry, _):
                params, key = carry
                key, sub = jax.random.split(key)
                loss, grads = jax.value_and_grad(loss_fn)(params, batch['x'], sub)
                # thread grads into params (keeps the whole bwd live)
                params = jax.tree.map(lambda p, g: p - 1e-12 * g.astype(p.dtype),
                                      params, grads)
                return (params, key), ()
            (params, _), _ = jax.lax.scan(body, (params, key), None, length=iters)
            return jax.tree.leaves(params)[0].reshape(-1)[:2]
        return f
    grad_t = report('grad', slope(
        make_grad, (state.params, state.batch_stats, batch, jax.random.PRNGKey(2))))

    # --- full train step
    def make_step(iters):
        @jax.jit
        def f(state, batch, key):
            def body(carry, _):
                state, key = carry
                key, sub = jax.random.split(key)
                state, metrics = train_step(state, batch, sub)
                return (state, key), ()
            (state, _), _ = jax.lax.scan(body, (state, key), None, length=iters)
            return jax.tree.leaves(state.params)[0].reshape(-1)[:2]
        return f
    step_t = report('step', slope(make_step, (state, batch, jax.random.PRNGKey(3))))

    print(f'\nbreakdown @ B={B} T={T_sec}s:')
    print(f'  bwd-only        {(grad_t - fwd_t) * 1e3:8.1f} ms  '
          f'(fwd_train x{(grad_t - fwd_t) / fwd_t:.2f})')
    print(f'  optimizer+guard {(step_t - grad_t) * 1e3:8.1f} ms')
    print(f'  train-mode tax  {(fwd_t - fwd_i) * 1e3:8.1f} ms (dropout+dither+CTC)')


if __name__ == '__main__':
    main()
