"""Pallas Viterbi forced-alignment kernel (time-chunked, like ctc_pallas_v2).

Spec: /root/reference/ctc.py:7-75 — max-product alpha recursion over the
blank-interleaved lattice with backpointers, then a backtrace. The forward
recursion (the O(T·B·S) part) runs as a Pallas kernel emitting int32
backpointers plus each row's final-frame alpha; the backtrace is a cheap
(B,)-wide reverse lax.scan over the stored pointers (the reference's 2-bit
backpointer packing, ctc.py:35-54, is a CUDA memory trick — HBM holds the
unpacked tensor here).
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG_INF
from .ctc import ctc_alignment as ctc_alignment_scan
from .ctc_pallas import _prepare, _shift_right

B_TILE = 32
T_CHUNK = 16


def _round_up(x, m):
    return (x + m - 1) // m * m


def _viterbi_kernel(E_ref, skip_ref, xlen_ref, bp_ref, final_ref, state_scratch):
    chunk = pl.program_id(1)
    Tc = E_ref.shape[1]
    skip = skip_ref[:]
    xlen = xlen_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, skip.shape, dimension=1)

    @pl.when(chunk == 0)
    def _():
        state_scratch[:] = jnp.full(skip.shape, NEG_INF, dtype=jnp.float32)
        final_ref[:] = jnp.full(skip.shape, NEG_INF, dtype=jnp.float32)

    def body(t, _):
        global_t = chunk * Tc + t
        alpha = state_scratch[:]
        prev1 = _shift_right(alpha)
        prev2 = jnp.where(skip > 0, _shift_right(_shift_right(alpha)), NEG_INF)
        # best predecessor: 0 = stay, 1 = from s-1, 2 = from s-2
        best01 = jnp.where(prev1 > alpha, 1, 0).astype(jnp.int32)
        val01 = jnp.maximum(alpha, prev1)
        best = jnp.where(prev2 > val01, 2, best01)
        val = jnp.maximum(val01, prev2)
        recur = jnp.maximum(val + E_ref[:, t, :], NEG_INF)
        init = jnp.where(lane <= 1, E_ref[:, t, :], NEG_INF)
        new = jnp.where(global_t == 0, init, recur)
        active = global_t < xlen
        state_scratch[:] = jnp.where(active, new, alpha)
        bp_ref[:, t, :] = jnp.where(active & (global_t > 0), best, 0)
        # capture each row's alpha at its last valid frame
        final_ref[:] = jnp.where(global_t == xlen - 1, new, final_ref[:])
        return 0

    jax.lax.fori_loop(0, Tc, body, 0)


def _run_viterbi(E, skip, xlen):
    B, T, S = E.shape
    Bp, Tp = _round_up(B, B_TILE), _round_up(T, T_CHUNK)
    pad_b = lambda a: jnp.pad(a, ((0, Bp - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))
    E = jnp.pad(E, ((0, Bp - B), (0, Tp - T), (0, 0)))
    grid = (Bp // B_TILE, Tp // T_CHUNK)
    bp, final = pl.pallas_call(
        _viterbi_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, T_CHUNK, S), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, S), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B_TILE, T_CHUNK, S), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, S), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Tp, S), jnp.int32),
            jax.ShapeDtypeStruct((Bp, S), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B_TILE, S), jnp.float32)],
    )(E, pad_b(skip), pad_b(xlen.astype(jnp.int32)[:, None]))
    return bp[:B, :T], final[:B]


def ctc_alignment_pallas(log_probs, targets, input_lengths, target_lengths,
                         blank=None, interpret=False):
    """Drop-in for ops.ctc.ctc_alignment with the hot recursion in Pallas."""
    del interpret
    B, T, C = log_probs.shape
    L = targets.shape[1]
    blank_ = C - 1 if blank is None else blank
    E, skip, final_mask, ext, S = _prepare(log_probs, targets, input_lengths,
                                           target_lengths, blank_)
    backptrs, alpha_final = _run_viterbi(E, skip, input_lengths)

    end1 = (2 * target_lengths - 1).astype(jnp.int32)
    end2 = (2 * target_lengths).astype(jnp.int32)
    a1 = jnp.take_along_axis(alpha_final, jnp.maximum(end1, 0)[:, None], axis=1)[:, 0]
    a2 = jnp.take_along_axis(alpha_final, end2[:, None], axis=1)[:, 0]
    final_state = jnp.where(a1 >= a2, end1, end2)
    final_state = jnp.where(target_lengths == 0, end2, final_state)

    def back_step(state, inputs):
        bp_t, t = inputs
        active = t < input_lengths
        move = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        prev_state = jnp.where(active, state - move, state)
        return prev_state, state

    first_state, states_rev = jax.lax.scan(
        back_step, final_state,
        (jnp.moveaxis(backptrs, 1, 0)[1:], jnp.arange(1, T)), reverse=True)
    states = jnp.concatenate([first_state[None], states_rev], axis=0)

    frames = jnp.arange(T)[:, None, None]
    char_states = (2 * jnp.arange(L) + 1)[None, None, :]
    hit = (states[:, :, None] == char_states) & (frames < input_lengths[None, :, None])
    return jnp.max(jnp.where(hit, frames, 0), axis=0).astype(jnp.int32)


def ctc_alignment_auto(log_probs, targets, input_lengths, target_lengths, blank=None):
    if jax.default_backend() == 'tpu':
        return ctc_alignment_pallas(log_probs, targets, input_lengths,
                                    target_lengths, blank)
    return ctc_alignment_scan(log_probs, targets, input_lengths, target_lengths,
                              blank=blank)
