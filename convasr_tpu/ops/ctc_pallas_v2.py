"""Pallas CTC kernel v2: time-chunked grid with VMEM carry.

v1 (convasr_tpu.ops.ctc_pallas) holds the whole (TILE_B, T, S) block in VMEM,
capping T and wasting VPU width on an 8-row batch tile. v2 streams emissions
through a (B_TILE, T_CHUNK, S) pipeline:

- grid = (B_tiles, T_chunks); TPU grids run sequentially on a core, so the
  alpha carry lives in VMEM scratch and persists across the T-chunk axis
  (re-initialized at chunk 0 of each batch tile);
- Pallas double-buffers the E blocks from HBM automatically via BlockSpec
  pipelining, overlapping DMA with the recursion;
- B_TILE=32 puts 32x256 elements per VPU step (8x the v1 tile).

The backward kernel walks the T-chunk axis in reverse via the index_map and
emits dL/dE directly.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG_INF
from .ctc_pallas import _prepare, _final_ll, _lse3, _shift_left, _shift_right

B_TILE = 32
T_CHUNK = 16
LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _alpha_kernel(E_ref, skip_ref, xlen_ref, alpha_ref, carry):
    chunk = pl.program_id(1)
    Tc = E_ref.shape[1]
    skip = skip_ref[:]
    xlen = xlen_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, skip.shape, dimension=1)

    @pl.when(chunk == 0)
    def _():
        carry[:] = jnp.full(skip.shape, NEG_INF, dtype=jnp.float32)

    def body(t, _):
        global_t = chunk * Tc + t
        alpha = carry[:]
        prev1 = _shift_right(alpha)
        prev2 = jnp.where(skip > 0, _shift_right(_shift_right(alpha)), NEG_INF)
        recur = jnp.maximum(_lse3(alpha, prev1, prev2) + E_ref[:, t, :], NEG_INF)
        init = jnp.where(lane <= 1, E_ref[:, t, :], NEG_INF)
        new = jnp.where(global_t == 0, init, recur)
        new = jnp.where(global_t < xlen, new, alpha)
        carry[:] = new
        alpha_ref[:, t, :] = new
        return 0

    jax.lax.fori_loop(0, Tc, body, 0)


def _beta_grad_kernel(E_ref, skip_ref, xlen_ref, final_ref, alpha_ref, ll_ref,
                      grad_ref, carry):
    chunk = pl.program_id(1)          # walks reversed via index_map
    Tc = E_ref.shape[1]
    skip = skip_ref[:]
    xlen = xlen_ref[:]
    final_mask = final_ref[:]
    ll = ll_ref[:]

    @pl.when(chunk == 0)
    def _():
        carry[:] = jnp.full(skip.shape, NEG_INF, dtype=jnp.float32)

    n_chunks = pl.num_programs(1)
    T = n_chunks * Tc

    def body(i, _):
        t = Tc - 1 - i
        global_t = (n_chunks - 1 - chunk) * Tc + t
        beta = carry[:]
        at_last = (global_t == xlen - 1)
        init = jnp.where(final_mask > 0, 0.0, NEG_INF)
        beta = jnp.where(at_last, init, beta)
        active = (global_t < xlen)
        grad = jnp.exp(jnp.clip(alpha_ref[:, t, :] + beta - ll, -80.0, 80.0))
        grad_ref[:, t, :] = jnp.where(active, grad, 0.0)
        bterm = beta + E_ref[:, t, :]
        nxt1 = _shift_left(bterm)
        skip_from = _shift_left(_shift_left(jnp.where(skip > 0, bterm, NEG_INF)))
        new_beta = jnp.maximum(_lse3(bterm, nxt1, skip_from), NEG_INF)
        carry[:] = jnp.where(active, new_beta, beta)
        return 0

    jax.lax.fori_loop(0, Tc, body, 0)


def _pad(x, Bp, Tp=None):
    pads = [(0, Bp - x.shape[0])]
    if Tp is not None:
        pads.append((0, Tp - x.shape[1]))
    pads += [(0, 0)] * (x.ndim - len(pads))
    return jnp.pad(x, pads) if any(p[1] for p in pads) else x


def _run_alpha(E, skip, xlen, interpret=False):
    B, T, S = E.shape
    Bp, Tp = _round_up(B, B_TILE), _round_up(T, T_CHUNK)
    E = _pad(E, Bp, Tp)
    skip = _pad(skip, Bp)
    xlen_col = _pad(xlen.astype(jnp.int32)[:, None], Bp)
    grid = (Bp // B_TILE, Tp // T_CHUNK)
    alpha = pl.pallas_call(
        _alpha_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, T_CHUNK, S), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, S), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_TILE, T_CHUNK, S), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_TILE, S), jnp.float32)],
        interpret=interpret,
    )(E, skip, xlen_col)
    return alpha[:B, :T]


def _run_beta_grad(E, skip, xlen, final_mask, alpha, ll, interpret=False):
    B, T, S = E.shape
    Bp, Tp = _round_up(B, B_TILE), _round_up(T, T_CHUNK)
    grid = (Bp // B_TILE, Tp // T_CHUNK)
    n_chunks = Tp // T_CHUNK
    rev = lambda b, t: (b, n_chunks - 1 - t, 0)
    rev2 = lambda b, t: (b, 0)
    grad = pl.pallas_call(
        _beta_grad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, T_CHUNK, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, S), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, S), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, T_CHUNK, S), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), rev2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_TILE, T_CHUNK, S), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_TILE, S), jnp.float32)],
        interpret=interpret,
    )(_pad(E, Bp, Tp), _pad(skip, Bp),
      _pad(xlen.astype(jnp.int32)[:, None], Bp), _pad(final_mask, Bp),
      _pad(alpha, Bp, Tp), _pad(ll[:, None].astype(jnp.float32), Bp))
    return grad[:B, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas_v2(log_probs, targets, input_lengths, target_lengths,
                       blank=None, interpret=False):
    out, _ = _fwd(log_probs, targets, input_lengths, target_lengths, blank, interpret)
    return out


def _fwd(log_probs, targets, input_lengths, target_lengths, blank, interpret):
    B, T, C = log_probs.shape
    blank_ = C - 1 if blank is None else blank
    E, skip, final_mask, ext, S = _prepare(log_probs, targets, input_lengths,
                                           target_lengths, blank_)
    alpha = _run_alpha(E, skip, input_lengths, interpret=interpret)
    ll = _final_ll(alpha, input_lengths, final_mask)
    # infeasible alignments -> inf loss (torch F.ctc_loss semantics), so the
    # train loop's nonfinite-skip guard fires instead of training on ~1e30
    feasible = ll > NEG_INF / 2
    loss = jnp.where(feasible, -ll, jnp.inf)
    return loss, (E, skip, final_mask, ext, alpha, ll, input_lengths, feasible, C)


def _bwd(blank, interpret, residuals, g):
    E, skip, final_mask, ext, alpha, ll, input_lengths, feasible, C = residuals
    grad_E = _run_beta_grad(E, skip, input_lengths, final_mask, alpha, ll,
                            interpret=interpret)
    grad_E = -grad_E * jnp.where(feasible, g, 0.0)[:, None, None]
    onehot = jax.nn.one_hot(ext, C, dtype=jnp.float32)
    grad_lp = jnp.einsum('bts,bsc->btc', grad_E, onehot,
                         preferred_element_type=jnp.float32)
    return grad_lp.astype(jnp.float32), None, None, None


ctc_loss_pallas_v2.defvjp(_fwd, _bwd)
