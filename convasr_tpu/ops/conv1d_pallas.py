"""Pallas 1-D convolution: K-shifted MXU matmuls with a VMEM-resident
accumulator.

Status — ROUND-2 CORRECTED MEASUREMENT (v5e, B=256, T=304, 768->768, K=25,
full-dataflow chain: every iteration's complete output feeds the next, so
XLA cannot dead-code-eliminate any part of the conv; per-iteration time from
the slope between 10- and 40-iteration chains, which cancels the ~25-30 ms
tunnel dispatch+fetch constant):

XLA's conv        185 TFLOPs/s  = 94% of the v5e bf16 peak (197 TFLOPs/s)
pure 4096^3 GEMM  181 TFLOPs/s  (the chip's own matmul speed-of-light)
this kernel       169 TFLOPs/s  (86% of peak)

Round 1 reported "146-149 TFLOPs/s = 37% of MXU peak": BOTH numbers were
wrong. The 37% divided by 394, which is v5e's INT8 TOPS — the bf16 peak is
197 TFLOPs/s. And the round-1 chain harness threaded only out[0,0,0] between
iterations, letting XLA DCE most of each conv, which distorted absolute
numbers. Conclusion: the conv is ALREADY at matmul speed-of-light for bf16 —
there is no bf16 kernel headroom; the only remaining 2x lives in the int8
MXU path (394 TOPS), which requires quantized inference.

This kernel is kept as the foundation for an int8 variant and is NOT wired
into the model by default (XLA's conv wins by ~9%). Design:

    grid = (cout_tiles, batch_tiles, time_tiles)   # cout SLOWEST so the
                                                   # weight tile stays resident
    per cell: DMA the x tile WITH ITS HALO (T_t + K - 1 frames) from HBM,
    then acc(f32, rows x C_t) += x[:, k:k+T_t, :] @ w[k] for k in 0..K-1,
    all 25 partial GEMMs accumulating in VMEM; one HBM write per output tile.

Supports stride=1, dilation=1, 128-divisible channel counts (all of
JasperNet's middle/epilogue blocks — the bulk of the FLOPs); callers fall
back to lax.conv otherwise. Forward-only by default; a custom VJP expresses
dx as the same kernel with flipped/transposed weights and leaves dw to XLA.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_TILE = 16
T_TILE = 16      # rows per matmul = B_TILE * T_TILE = 256
C_TILE = 128


def _kernel(x_hbm, w_ref, out_ref, x_vmem, acc, sems):
    """Double-buffered: each cell prefetches the NEXT cell's x halo while
    computing its own, so the DMA latency never serializes the grid."""
    K = w_ref.shape[0]
    b = pl.program_id(1)
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    n_cells = pl.num_programs(1) * n_t
    i = b * n_t + t
    slot = jax.lax.rem(i, 2)

    def make_copy(slot_idx, bb, tt):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(bb * B_TILE, B_TILE),
                     pl.ds(tt * T_TILE, T_TILE + K - 1), :],
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

    rows = B_TILE * T_TILE
    acc[:] = jnp.zeros_like(acc)
    for k in range(K):
        xs = x_vmem[slot, :, k:k + T_TILE, :].reshape(rows, x_vmem.shape[-1])
        acc[:] += jnp.dot(xs, w_ref[k], preferred_element_type=jnp.float32)
    out_ref[:] = acc[:].reshape(B_TILE, T_TILE, out_ref.shape[-1]).astype(out_ref.dtype)


def _conv1d_mxu_raw(x, w, out_dtype):
    """x: (B, T, Cin) already zero-padded by K//2 on both time ends in the
    caller — here T is the OUTPUT length and x has T + K - 1 frames."""
    K, Cin, Cout = w.shape
    B, T_in, _ = x.shape
    T = T_in - (K - 1)
    assert B % B_TILE == 0 and T % T_TILE == 0 and Cout % C_TILE == 0, (B, T, Cout)

    grid = (Cout // C_TILE, B // B_TILE, T // T_TILE)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),           # x stays in HBM
            pl.BlockSpec((K, Cin, C_TILE), lambda co, b, t: (0, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_TILE, T_TILE, C_TILE),
                               lambda co, b, t: (b, t, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, B_TILE, T_TILE + K - 1, Cin), x.dtype),
            pltpu.VMEM((B_TILE * T_TILE, C_TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * Cin * Cout * K,
            bytes_accessed=B * T_in * Cin * x.dtype.itemsize * (Cout // C_TILE)
            + K * Cin * Cout * 2 + B * T * Cout * 2,
            transcendentals=0),
    )(x, w)


def eligible(x_shape, w_shape, stride=1, dilation=1):
    B, T, Cin = x_shape
    K, _, Cout = w_shape
    return (stride == 1 and dilation == 1 and K % 2 == 1
            and Cin % C_TILE == 0 and Cout % C_TILE == 0
            and B % B_TILE == 0 and T % T_TILE == 0
            and (K * Cin * C_TILE * 2 + B_TILE * (T_TILE + K - 1) * Cin * 2) < 12 * 2 ** 20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1d_mxu(x, w, out_dtype=jnp.bfloat16):
    """Same-padded stride-1 conv, channels-last: (B,T,Cin) x (K,Cin,Cout)."""
    K = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (K // 2, K // 2), (0, 0)))
    return _conv1d_mxu_raw(xp, w, out_dtype)


def _fwd(x, w, out_dtype):
    return conv1d_mxu(x, w, out_dtype), (x, w)


def _bwd(out_dtype, residuals, dy):
    x, w = residuals
    K = w.shape[0]
    # dx = same conv of dy with time-flipped, in/out-transposed weights
    w_flip = jnp.flip(w, axis=0).transpose(0, 2, 1)
    dyp = jnp.pad(dy.astype(x.dtype), ((0, 0), (K // 2, K // 2), (0, 0)))
    dx = _conv1d_mxu_raw(dyp, w_flip.astype(w.dtype), x.dtype)
    # dw[k] = x_shift_k^T @ dy — one big GEMM per tap, XLA handles it well
    xp = jnp.pad(x, ((0, 0), (K // 2, K // 2), (0, 0)))
    T = dy.shape[1]
    dw = jnp.stack([
        jnp.einsum('btc,btd->cd', xp[:, k:k + T, :].astype(jnp.float32),
                   dy.astype(jnp.float32), preferred_element_type=jnp.float32)
        for k in range(K)]).astype(w.dtype)
    return dx, dw


conv1d_mxu.defvjp(_fwd, _bwd)
