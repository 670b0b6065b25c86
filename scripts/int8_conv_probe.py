"""Can the hot JasperNet conv shape ride the int8 MXU (394 TOPS)?

int8_probe.py established XLA's int8 dot runs at 413 TOPS. This probe checks
the CONV: (B=256, T=304, 768->768, K=25), same full-dataflow slope harness.

Candidates:
  bf16 XLA conv     (185 TFLOPs/s round-2 baseline)
  int8 XLA conv     conv_general_dilated on int8 operands -> int32
  int8 pallas conv  per-tap int8 dots, int32 VMEM accumulator (adapted
                    from the since-retired ops/conv1d_pallas.py dataflow)
  int8 pallas conv wide  C_TILE=256 rows=512 (bigger MXU tiles)
Usage: python scripts/int8_conv_probe.py  (ALONE on the chip)
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convasr_tpu.infra.utils import enable_compilation_cache

enable_compilation_cache()

B, T, C, K = 256, 304, 768, 25


def timed(fn, *args):
    np.asarray(fn(*args)).reshape(-1)[:1]
    tic = time.perf_counter()
    np.asarray(fn(*args)).reshape(-1)[:1]
    return time.perf_counter() - tic


def slope(make_chain, args, short=6, long=18):
    return (timed(make_chain(long), *args) - timed(make_chain(short), *args)) / (long - short)


def requant(y_int32):
    return jnp.clip(y_int32 >> 10, -127, 127).astype(jnp.int8)


def conv_pallas_int8(x, w, b_tile=16, t_tile=16, c_tile=128):
    """x: (B, T+K-1, C) int8 pre-padded, w: (K, C, Cout) int8 -> (B,T,Cout) i32."""
    Cout = w.shape[2]

    def kernel(x_hbm, w_ref, out_ref, x_vmem, acc, sems):
        b = pl.program_id(1)
        t = pl.program_id(2)
        n_t = pl.num_programs(2)
        n_cells = pl.num_programs(1) * n_t
        i = b * n_t + t
        slot = jax.lax.rem(i, 2)

        def make_copy(slot_idx, bb, tt):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(bb * b_tile, b_tile),
                         pl.ds(tt * t_tile, t_tile + K - 1), :],
                x_vmem.at[slot_idx], sems.at[slot_idx])

        @pl.when(i == 0)
        def _():
            make_copy(slot, b, t).start()
        nxt = i + 1
        nb, nt = jax.lax.div(nxt, n_t), jax.lax.rem(nxt, n_t)

        @pl.when(nxt < n_cells)
        def _():
            make_copy(jax.lax.rem(nxt, 2), nb, nt).start()
        make_copy(slot, b, t).wait()

        rows = b_tile * t_tile
        acc[:] = jnp.zeros_like(acc)
        for k in range(K):
            xs = x_vmem[slot, :, k:k + t_tile, :].reshape(rows, C)
            acc[:] += jnp.dot(xs, w_ref[k], preferred_element_type=jnp.int32)
        out_ref[:] = acc[:].reshape(b_tile, t_tile, Cout // (Cout // c_tile) if False else c_tile)

    grid = (Cout // c_tile, B // b_tile, T // t_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((K, C, c_tile), lambda co, b, t: (0, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, t_tile, c_tile),
                               lambda co, b, t: (b, t, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Cout), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, b_tile, t_tile + K - 1, C), jnp.int8),
            pltpu.VMEM((b_tile * t_tile, c_tile), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * Cout * K,
            bytes_accessed=B * (T + K - 1) * C * (Cout // c_tile) + K * C * Cout + 4 * B * T * Cout,
            transcendentals=0),
    )(x, w)


def run(name, conv, int8=True, pad_input=False):
    def make(iters):
        @jax.jit
        def f(x, w):
            def body(x, _):
                xin = jnp.pad(x, ((0, 0), (K // 2, K // 2), (0, 0))) if pad_input else x
                y = conv(xin, w)
                if int8:
                    return requant(y), ()
                o = y.astype(jnp.float32)
                return (o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)).astype(jnp.bfloat16), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x[0, 0, :2]
        return f

    rng = np.random.RandomState(0)
    if int8:
        x = jnp.asarray(rng.randint(-127, 128, (B, T, C), dtype=np.int8))
        w = jnp.asarray(rng.randint(-4, 5, (K, C, C), dtype=np.int8))
    else:
        x = jnp.asarray((rng.randn(B, T, C) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(K, C, C) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
    try:
        per = slope(make, (x, w))
        fl = 2 * B * T * C * C * K
        unit = 'TOPS' if int8 else 'TFLOPs/s'
        print(f'{name}: {fl / per / 1e12:.1f} {unit} ({per*1e3:.2f} ms/iter)')
    except Exception as e:
        print(f'{name}: FAILED {type(e).__name__}: {str(e)[:300]}')


if __name__ == '__main__':
    run('bf16 XLA conv (baseline)',
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1,), 'SAME', dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16), int8=False)
    run('int8 XLA conv -> int32',
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1,), 'SAME', dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.int32))
    run('int8 pallas conv 16x16x128',
        lambda x, w: conv_pallas_int8(x, w), pad_input=True)
    run('int8 pallas conv 32x16x128',
        lambda x, w: conv_pallas_int8(x, w, b_tile=32), pad_input=True)
    run('int8 pallas conv 16x16x256',
        lambda x, w: conv_pallas_int8(x, w, c_tile=256), pad_input=True)
