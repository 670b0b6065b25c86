"""Is the v5e int8 MXU path (394 TOPS = 2x bf16) reachable from XLA or Pallas?

Round-2 measured a plain "pallas int8 GEMM" at 93 TOPS (worse than bf16) but
did not commit the harness.  This probe is the round-3 weight-stationary
attempt demanded by VERDICT #1: every candidate threads its FULL output into
the next chain iteration (no DCE possible) and per-iteration time is the
slope between two chain lengths (cancels the ~25-30 ms tunnel constant).

Candidates:
  bf16_xla    jnp.dot bf16xbf16->f32 (the 181 TFLOPs/s baseline)
  int8_xla    jnp.dot int8xint8->int32 straight through XLA
  int8_pallas weight-stationary Pallas GEMM: int8 tiles, int32 accum,
              (256,K)x(K,256) per-cell dots (lane/sublane aligned for int8)
  int8_pallas_k  same but K-tiled accumulation loop (512-wide K panels)
Usage: python scripts/int8_probe.py  (ALONE on the chip)
"""
import functools
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

N = 4096
M_TILE = 256
N_TILE = 256
K_TILE = 512


def timed(fn, *args):
    np.asarray(fn(*args)).reshape(-1)[:1]
    tic = time.perf_counter()
    np.asarray(fn(*args)).reshape(-1)[:1]
    return time.perf_counter() - tic


def slope(make_chain, args, short=10, long=40):
    return (timed(make_chain(long), *args) - timed(make_chain(short), *args)) / (long - short)


def requant(y_int32):
    # thread the FULL int32 product back to int8: shift + clip (VPU, cheap)
    return jnp.clip(y_int32 >> 12, -127, 127).astype(jnp.int8)


def gemm_pallas_int8_full(a, b):
    """Whole-K per cell: a (M_TILE, N) int8, b (N, N_TILE) int8 -> int32."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(N // M_TILE, N // N_TILE),
        in_specs=[
            pl.BlockSpec((M_TILE, N), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M_TILE, N_TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * N * N, bytes_accessed=3 * N * N, transcendentals=0),
    )(a, b)


def gemm_pallas_int8_ktiled(a, b):
    """K-tiled: grid (M, N, K) with K innermost, int32 accum in VMEM."""
    def kernel(a_ref, b_ref, o_ref, acc):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        acc[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:]

    return pl.pallas_call(
        kernel,
        grid=(N // M_TILE, N // N_TILE, N // K_TILE),
        in_specs=[
            pl.BlockSpec((M_TILE, K_TILE), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TILE, N_TILE), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M_TILE, N_TILE), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((M_TILE, N_TILE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * N * N, bytes_accessed=3 * N * N, transcendentals=0),
    )(a, b)


def run(name, gemm, int8=True):
    def make(iters):
        @jax.jit
        def f(x, w):
            def body(x, _):
                y = gemm(x, w)
                return (requant(y) if int8 else
                        (y.astype(jnp.float32) * jax.lax.rsqrt(
                            jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6)).astype(x.dtype)), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x[0, :2]
        return f

    rng = np.random.RandomState(0)
    if int8:
        a = jnp.asarray(rng.randint(-127, 128, (N, N), dtype=np.int8))
        b = jnp.asarray(rng.randint(-16, 17, (N, N), dtype=np.int8))
    else:
        a = jnp.asarray((rng.randn(N, N) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray((rng.randn(N, N) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    try:
        per = slope(make, (a, b))
        unit = 'TOPS' if int8 else 'TFLOPs/s'
        print(f'{name}: {2 * N**3 / per / 1e12:.1f} {unit} ({per*1e3:.3f} ms/iter)')
    except Exception as e:
        print(f'{name}: FAILED {type(e).__name__}: {str(e)[:300]}')


if __name__ == '__main__':
    run('bf16 XLA dot (baseline)',
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32), int8=False)
    run('int8 XLA dot -> int32',
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32))
    run('int8 pallas whole-K', gemm_pallas_int8_full)
    run('int8 pallas K-tiled', gemm_pallas_int8_ktiled)
