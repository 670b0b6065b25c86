"""Pallas TPU kernel for CTC loss (alpha/beta recursions, custom VJP).

The hot op of training (SURVEY.md §2.3: the reference leans on the cuDNN CTC
kernel, models.py:320-325). Design:

1. Emissions are pre-gathered OUTSIDE the kernel: E[b, t, s] =
   log_probs[b, t, ext_targets[b, s]] — one XLA gather, so the kernel works on
   dense (B, T, S) blocks with S (the 2L+1 lattice states) on the 128-lane
   axis.
2. The ALPHA kernel runs the whole time recursion in VMEM per batch tile:
   alpha_t = E_t + logsumexp(alpha_{t-1}, shift1(alpha_{t-1}),
   shift2(alpha_{t-1}) masked by can_skip). Lane shifts use pltpu.roll.
   Variable input lengths freeze rows past xlen with a per-row select.
3. The BETA kernel runs the reverse recursion and emits the gradient
   dL/dE = exp(alpha + beta - ll) directly (standard CTC cotangent), with the
   per-row final-state mask initializing beta at each row's last frame.
4. dE is scattered back to classes with a batched one-hot matmul (MXU).

Falls back to the lax.scan implementation (convasr_tpu.ops.ctc) when the
(TILE_B, T, S) working set would not fit VMEM.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG_INF, interleave_blanks, _diff_labels, ctc_loss as ctc_loss_scan

TILE_B = 8
LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _shift_right(x, fill=NEG_INF):
    """Shift lanes right by one: out[:, s] = x[:, s-1]; out[:, 0] = fill."""
    rolled = pltpu.roll(x, shift=1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane == 0, fill, rolled)


def _shift_left(x, fill=NEG_INF):
    # pltpu.roll requires non-negative shifts; circular left-by-1 == right-by-(S-1)
    rolled = pltpu.roll(x, shift=x.shape[1] - 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane == x.shape[1] - 1, fill, rolled)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _alpha_kernel(E_ref, skip_ref, xlen_ref, alpha_ref):
    T = E_ref.shape[1]
    skip = skip_ref[:]              # (TB, S) 0/1 float: may skip from s-2
    xlen = xlen_ref[:]              # (TB, 1) int32
    lane = jax.lax.broadcasted_iota(jnp.int32, skip.shape, dimension=1)

    # t = 0: states 0 and 1 start
    init = jnp.where(lane <= 1, E_ref[:, 0, :], NEG_INF)
    alpha_ref[:, 0, :] = init

    def body(t, alpha):
        prev1 = _shift_right(alpha)
        prev2 = _shift_right(_shift_right(alpha))
        prev2 = jnp.where(skip > 0, prev2, NEG_INF)
        new = jnp.maximum(_lse3(alpha, prev1, prev2) + E_ref[:, t, :], NEG_INF)
        keep = (t < xlen)           # (TB, 1) bool
        new = jnp.where(keep, new, alpha)
        alpha_ref[:, t, :] = new
        return new

    jax.lax.fori_loop(1, T, body, init)


def _beta_grad_kernel(E_ref, skip_ref, xlen_ref, final_ref, alpha_ref, ll_ref,
                      grad_ref):
    """Reverse recursion; writes grad[b,t,s] = exp(alpha+beta-ll) (0 for
    padded frames)."""
    T = E_ref.shape[1]
    skip = skip_ref[:]
    xlen = xlen_ref[:]              # (TB, 1)
    final_mask = final_ref[:]       # (TB, S) 1 where s is an end state
    ll = ll_ref[:]                  # (TB, 1) total log-likelihood

    shape = skip.shape
    beta0 = jnp.full(shape, NEG_INF, dtype=jnp.float32)

    def body(i, beta):
        t = T - 1 - i
        # rows whose last frame is t: (re)initialize beta at end states
        at_last = (t == xlen - 1)
        init = jnp.where(final_mask > 0, 0.0, NEG_INF)
        beta = jnp.where(at_last, init, beta)
        active = (t < xlen)
        alpha_t = alpha_ref[:, t, :]
        grad = jnp.exp(jnp.clip(alpha_t + beta - ll, -80.0, 80.0))
        grad = jnp.where(active, grad, 0.0)
        grad_ref[:, t, :] = grad
        # recurse to t-1: bterm = beta + E_t
        bterm = beta + E_ref[:, t, :]
        nxt1 = _shift_left(bterm)
        skip_from = _shift_left(_shift_left(jnp.where(skip > 0, bterm, NEG_INF)))
        new_beta = _lse3(bterm, nxt1, skip_from)
        beta = jnp.where(active, jnp.maximum(new_beta, NEG_INF), beta)
        return beta

    jax.lax.fori_loop(0, T, body, beta0)


def _prepare(log_probs, targets, input_lengths, target_lengths, blank):
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = _round_up(2 * L + 1, LANE)
    ext = interleave_blanks(targets.astype(jnp.int32), blank)        # (B, 2L+1)
    ext = jnp.pad(ext, ((0, 0), (0, S - ext.shape[1])), constant_values=blank)
    skip = _diff_labels(ext, blank).astype(jnp.float32)
    # padded states beyond 2L+1 must never be reached: kill their emissions
    state_idx = jnp.arange(S)[None, :]
    valid_state = state_idx < (2 * L + 1)
    E = jnp.take_along_axis(log_probs.astype(jnp.float32), ext[:, None, :], axis=2)
    E = jnp.where(valid_state[:, None, :], E, NEG_INF)
    # also forbid states beyond this row's own lattice (2*ylen+1)
    row_valid = state_idx < (2 * target_lengths[:, None] + 1)
    E = jnp.where(row_valid[:, None, :], E, NEG_INF)
    end1 = 2 * target_lengths - 1
    end2 = 2 * target_lengths
    final_mask = ((state_idx == end1[:, None]) | (state_idx == end2[:, None])
                  ).astype(jnp.float32)
    return E, skip, final_mask, ext, S


def _pad_batch(x, Bp):
    pad = Bp - x.shape[0]
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x


def _run_alpha(E, skip, xlen, interpret=False):
    B, T, S = E.shape
    Bp = _round_up(B, TILE_B)
    E = _pad_batch(E, Bp)
    skip = _pad_batch(skip, Bp)
    xlen_col = _pad_batch(xlen.astype(jnp.int32)[:, None], Bp)
    # padded rows: xlen 1 keeps the recursion trivially frozen

    grid = (Bp // TILE_B,)
    alpha = pl.pallas_call(
        _alpha_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, T, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, T, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, T, S), jnp.float32),
        interpret=interpret,
    )(E, skip, xlen_col)
    return alpha[:B]


def _run_beta_grad(E, skip, xlen, final_mask, alpha, ll, interpret=False):
    B, T, S = E.shape
    Bp = _round_up(B, TILE_B)
    grid = (Bp // TILE_B,)
    grad = pl.pallas_call(
        _beta_grad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, T, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, T, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, T, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, T, S), jnp.float32),
        interpret=interpret,
    )(_pad_batch(E, Bp), _pad_batch(skip, Bp),
      _pad_batch(xlen.astype(jnp.int32)[:, None], Bp),
      _pad_batch(final_mask, Bp), _pad_batch(alpha, Bp),
      _pad_batch(ll[:, None].astype(jnp.float32), Bp))
    return grad[:B]


def _final_ll(alpha, xlen, final_mask):
    """ll[b] = logsumexp of alpha at frame xlen-1 over the end states."""
    B, T, S = alpha.shape
    last = jnp.take_along_axis(
        alpha, (xlen.astype(jnp.int32) - 1)[:, None, None].clip(0), axis=1)[:, 0, :]
    masked = jnp.where(final_mask > 0, last, NEG_INF)
    m = jnp.max(masked, axis=1)
    return m + jnp.log(jnp.sum(jnp.exp(masked - m[:, None]), axis=1))


def vmem_fits(B, T, L, budget_bytes=100 * 1024 * 1024):
    S = _round_up(2 * L + 1, LANE)
    return 3 * TILE_B * T * S * 4 <= 12 * 1024 * 1024 and B * T * S * 4 <= budget_bytes


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(log_probs, targets, input_lengths, target_lengths,
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
    # infeasible alignments (2*ylen+1 unreachable within olen) -> inf loss,
    # matching torch F.ctc_loss so the train loop's nonfinite-skip fires
    feasible = ll > NEG_INF / 2
    loss = jnp.where(feasible, -ll, jnp.inf)
    residuals = (E, skip, final_mask, ext, alpha, ll, input_lengths, feasible, C)
    return loss, residuals


def _bwd(blank, interpret, residuals, g):
    E, skip, final_mask, ext, alpha, ll, input_lengths, feasible, C = residuals
    grad_E = _run_beta_grad(E, skip, input_lengths, final_mask, alpha, ll,
                            interpret=interpret)
    # d(loss)/dE = -grad_E ; chain with incoming cotangent g (per-utterance);
    # infeasible rows get zero gradient (their exp(alpha+beta-ll) is garbage)
    grad_E = -grad_E * jnp.where(feasible, g, 0.0)[:, None, None]
    # scatter back to classes: one-hot (B, S, C) batched matmul on the MXU
    onehot = jax.nn.one_hot(ext, C, dtype=jnp.float32)            # (B, S, C)
    grad_lp = jnp.einsum('bts,bsc->btc', grad_E, onehot,
                         preferred_element_type=jnp.float32)
    return grad_lp.astype(jnp.float32), None, None, None


ctc_loss_pallas.defvjp(_fwd, _bwd)


def ctc_loss_auto(log_probs, targets, input_lengths, target_lengths, blank=None,
                  interpret=False):
    """Pallas CTC on TPU (v2 time-chunked kernel — no T/VMEM cap), lax.scan
    on other backends (also the CPU-test path)."""
    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu or interpret:
        from .ctc_pallas_v2 import ctc_loss_pallas_v2
        return ctc_loss_pallas_v2(log_probs, targets, input_lengths, target_lengths,
                                  blank, interpret)
    return ctc_loss_scan(log_probs, targets, input_lengths, target_lengths, blank=blank)
