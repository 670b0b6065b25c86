"""Sustained train-loop throughput with REAL per-step host->device feeding.

Complements scripts/train_step_probe.py (which measured the pure compiled
step at 123.6 ms/step @ B=64 T=6s = 3106 audio-sec/s): here every step
uploads a FRESH host batch, as the train CLI does, so the number includes
the tunnel upload and dispatch overheads that a chain hides.

Variants:
  f32  spd=1   per-step float32 upload (the r2-recorded 183 ms/step config)
  f32  spd=8   8 stacked batches per dispatch (amortized dispatch)
  i16  spd=1   audio uploaded as int16 PCM, /32767 on device (half the bytes)
  i16  spd=8   both

Usage: python scripts/train_feed_probe.py [B] [T_sec] [iters]
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

from convasr_tpu.infra.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend
    from convasr_tpu.models.zoo import create_model
    from convasr_tpu.train import loop as train_loop
    from convasr_tpu.train.optim import make_optimizer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    sr = 8000
    T = int(sr * T_sec)
    L = 128

    frontend = LogFilterBankFrontend(out_channels=64, sample_rate=sr,
                                     window_size=0.02, window_stride=0.01,
                                     dither=1e-5)
    model = create_model('JasperNetBig', num_input_features=64, num_classes=(38,),
                         frontend=frontend, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    x_f32 = (rng.randn(B, T) * 0.1).astype(np.float32)
    x_i16 = (np.clip(x_f32, -1, 1) * 32767).astype(np.int16)
    y = rng.randint(0, 33, (B, 1, L)).astype(np.int32)
    ylen = np.full((B, 1), L, np.int32)
    xlen = np.ones((B,), np.float32)

    optimizer = make_optimizer('NovoGrad', 1e-2, weight_decay=1e-3, betas=(0.95, 0.5))
    batch0 = dict(x=jnp.asarray(x_f32), xlen=jnp.asarray(xlen),
                  y=jnp.asarray(y), ylen=jnp.asarray(ylen))
    state0 = train_loop.init_train_state(model, optimizer, batch0, jax.random.PRNGKey(0))
    base_step = train_loop.make_train_step(model, optimizer)

    def step_any(state, batch, key):
        x = batch['x']
        if x.dtype == jnp.int16:
            batch = dict(batch, x=x.astype(jnp.float32) / jnp.float32(32767.0))
        return base_step(state, batch, key)

    def multi_step(state, stacked, keys):
        def body(state, bk):
            b, k = bk
            state, metrics = step_any(state, b, k)
            return state, metrics['loss']
        return jax.lax.scan(body, state, (stacked, keys))

    step_j = jax.jit(step_any, donate_argnums=(0,))
    multi_j = jax.jit(multi_step, donate_argnums=(0,))

    audio_sec = B * T_sec
    results = {}
    for name, x_host in [('f32', x_f32), ('i16', x_i16)]:
        for spd in (1, 8):
            state = jax.device_put(jax.device_get(state0))
            key = jax.random.PRNGKey(1)
            # warm compile
            if spd == 1:
                b = dict(x=jax.device_put(x_host), xlen=jnp.asarray(xlen),
                         y=jnp.asarray(y), ylen=jnp.asarray(ylen))
                state, m = step_j(state, b, key)
                _ = np.asarray(m['loss'])
            else:
                stacked = dict(
                    x=jax.device_put(np.broadcast_to(x_host, (spd,) + x_host.shape).copy()),
                    xlen=jnp.asarray(np.broadcast_to(xlen, (spd, B)).copy()),
                    y=jnp.asarray(np.broadcast_to(y, (spd,) + y.shape).copy()),
                    ylen=jnp.asarray(np.broadcast_to(ylen, (spd, B, 1)).copy()))
                keys = jnp.asarray(np.stack([np.asarray(jax.random.fold_in(key, j))
                                             for j in range(spd)]))
                state, losses = multi_j(state, stacked, keys)
                _ = np.asarray(losses)

            n_dispatch = max(iters // spd, 2)
            tic = time.perf_counter()
            last = None
            for it in range(n_dispatch):
                if spd == 1:
                    b = dict(x=jax.device_put(x_host), xlen=jnp.asarray(xlen),
                             y=jnp.asarray(y), ylen=jnp.asarray(ylen))
                    state, m = step_j(state, b, jax.random.fold_in(key, it))
                    last = m['loss']
                else:
                    stacked = dict(
                        x=jax.device_put(np.broadcast_to(x_host, (spd,) + x_host.shape).copy()),
                        xlen=jnp.asarray(np.broadcast_to(xlen, (spd, B)).copy()),
                        y=jnp.asarray(np.broadcast_to(y, (spd,) + y.shape).copy()),
                        ylen=jnp.asarray(np.broadcast_to(ylen, (spd, B, 1)).copy()))
                    keys = jnp.asarray(np.stack(
                        [np.asarray(jax.random.fold_in(key, it * spd + j))
                         for j in range(spd)]))
                    state, losses = multi_j(state, stacked, keys)
                    last = losses
            _ = np.asarray(last)  # honest sync: fetch once after the loop
            wall = time.perf_counter() - tic
            per = wall / (n_dispatch * spd)
            results[(name, spd)] = per
            print(f'{name} spd={spd}:  {per * 1e3:7.1f} ms/step   '
                  f'{audio_sec / per:7.0f} audio-sec/s')
    print('\npure compiled step (chain, no feed): 123.6 ms = 3106 audio-sec/s '
          '(scripts/train_step_probe.py)')


if __name__ == '__main__':
    main()
