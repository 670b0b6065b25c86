"""CTC loss, Viterbi forced alignment, and greedy decoding — JAX native.

Behavior spec:
- loss: matches `F.ctc_loss(log_probs, targets, input_lengths, target_lengths,
  blank, reduction='none')` as called by the reference (models.py:320-325,
  blank = last class, per-utterance normalization by ylen applied by the
  caller).
- alignment: /root/reference/ctc.py:7-75 — Viterbi over the blank-interleaved
  target lattice with backpointers, backtraced to per-target-char frame
  indices.

TPU-first design: both are `lax.scan`s over time whose per-step work is a
dense (B, S) vectorized update on the VPU — no data-dependent shapes. The
backward pass of the loss is JAX autodiff through the scan (the standard
alpha-recursion cotangent); a fused Pallas kernel for the forward/backward is
in convasr_tpu.ops.ctc_pallas.
"""
import typing

import jax
import jax.numpy as jnp

from ..infra import shaping
from ..infra.shaping import shapecheck

NEG_INF = -1e30


def interleave_blanks(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, L) targets -> (B, 2L+1) lattice [blank, t0, blank, t1, ..., blank]."""
    B, L = targets.shape
    ext = jnp.full((B, 2 * L + 1), blank, dtype=targets.dtype)
    return ext.at[:, 1::2].set(targets)


def _diff_labels(ext_targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, S) mask: state s may receive a skip transition from s-2
    (label differs from the label two states back, and is not blank)."""
    B, S = ext_targets.shape
    diff = jnp.zeros((B, S), dtype=bool)
    return diff.at[:, 2:].set(ext_targets[:, 2:] != ext_targets[:, :-2])


@shapecheck
def ctc_loss(log_probs: shaping.BTC, targets: shaping.BY,
             input_lengths: shaping.B, target_lengths: shaping.B,
             blank: typing.Optional[int] = None) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood.

    log_probs: (B, T, C) log-softmax outputs (time-major inside only);
    targets: (B, L) padded labels; input_lengths/target_lengths: (B,) int.
    blank defaults to C-1 (the reference convention, models.py:323).
    """
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1
    blank = C - 1 if blank is None else blank

    ext = interleave_blanks(targets.astype(jnp.int32), blank)       # (B, S)
    can_skip = _diff_labels(ext, blank)                              # (B, S)
    state_idx = jnp.arange(S)[None, :]

    # emission log-probs per state per step: gather along class dim
    lp = log_probs.astype(jnp.float32)

    alpha0 = jnp.full((B, S), NEG_INF, dtype=jnp.float32)
    alpha0 = alpha0.at[:, 0].set(lp[:, 0, blank])
    alpha0 = alpha0.at[:, 1].set(jnp.take_along_axis(lp[:, 0], ext[:, 1:2], axis=-1)[:, 0])

    def step(alpha, lp_t):
        stay = alpha
        prev1 = jnp.concatenate([jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        prev2 = jnp.concatenate([jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        stacked = jnp.stack([stay, prev1, prev2])
        m = jnp.max(stacked, axis=0)
        lse = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        lse = jnp.where(m <= NEG_INF / 2, NEG_INF, lse)
        emit = jnp.take_along_axis(lp_t, ext, axis=-1)               # (B, S)
        return jnp.maximum(lse + emit, NEG_INF), None

    def masked_step(carry, inputs):
        alpha, _ = carry
        lp_t, t = inputs
        new_alpha, _ = step(alpha, lp_t)
        keep = (t < input_lengths)[:, None]
        return (jnp.where(keep, new_alpha, alpha), None), None

    (alpha, _), _ = jax.lax.scan(
        masked_step, (alpha0, None),
        (jnp.moveaxis(lp, 1, 0)[1:], jnp.arange(1, T)))

    end1 = 2 * target_lengths - 1
    end2 = 2 * target_lengths
    a1 = jnp.take_along_axis(alpha, end1[:, None].astype(jnp.int32), axis=1)[:, 0]
    a2 = jnp.take_along_axis(alpha, end2[:, None].astype(jnp.int32), axis=1)[:, 0]
    # handle empty targets (end1 = -1): only the all-blank path a2 is valid
    m = jnp.maximum(a1, a2)
    ll = m + jnp.log(jnp.exp(a1 - m) + jnp.exp(a2 - m))
    ll = jnp.where(target_lengths == 0, a2, ll)
    # infeasible alignments (e.g. 2*ylen+1 states unreachable within olen)
    # must be inf, matching torch F.ctc_loss — so the train loop's
    # nonfinite-skip guard (reference train.py:769,797) actually fires
    # instead of training on a ~1e30 garbage loss.
    ll = jnp.where(ll <= NEG_INF / 2, -jnp.inf, ll)
    return -ll


@shapecheck
def ctc_alignment(log_probs: shaping.BTC, targets: shaping.BY,
                  input_lengths: shaping.B, target_lengths: shaping.B,
                  blank: typing.Optional[int] = None) -> jnp.ndarray:
    """Viterbi forced alignment -> frame index of each target char, (B, L).

    Spec: ctc.py:7-75 (alpha recursion with backpointers; the reference's
    2-bit backpointer packing is a CUDA memory trick — here backpointers are
    int8 in a scan-stacked array and XLA keeps them on device).
    """
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1
    blank = C - 1 if blank is None else blank

    ext = interleave_blanks(targets.astype(jnp.int32), blank)
    can_skip = _diff_labels(ext, blank)

    lp = log_probs.astype(jnp.float32)
    alpha0 = jnp.full((B, S), NEG_INF, dtype=jnp.float32)
    alpha0 = alpha0.at[:, 0].set(lp[:, 0, blank])
    alpha0 = alpha0.at[:, 1].set(jnp.take_along_axis(lp[:, 0], ext[:, 1:2], axis=-1)[:, 0])

    def step(carry, inputs):
        alpha = carry
        lp_t, t = inputs
        stay = alpha
        prev1 = jnp.concatenate([jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        prev2 = jnp.concatenate([jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        stacked = jnp.stack([stay, prev1, prev2])                     # (3, B, S)
        best = jnp.argmax(stacked, axis=0).astype(jnp.int8)           # (B, S)
        emit = jnp.take_along_axis(lp_t, ext, axis=-1)
        new_alpha = jnp.max(stacked, axis=0) + emit
        keep = (t < input_lengths)[:, None]
        return jnp.where(keep, jnp.maximum(new_alpha, NEG_INF), alpha), \
            jnp.where(keep, best, jnp.int8(0))

    alpha, backptrs = jax.lax.scan(step, alpha0,
                                   (jnp.moveaxis(lp, 1, 0)[1:], jnp.arange(1, T)))
    # backptrs: (T-1, B, S) for steps t=1..T-1

    end1 = (2 * target_lengths - 1).astype(jnp.int32)
    end2 = (2 * target_lengths).astype(jnp.int32)
    a1 = jnp.take_along_axis(alpha, end1[:, None], axis=1)[:, 0]
    a2 = jnp.take_along_axis(alpha, end2[:, None], axis=1)[:, 0]
    final_state = jnp.where(a1 >= a2, end1, end2)
    final_state = jnp.where(target_lengths == 0, end2, final_state)

    # backtrace: reverse scan from t = T-1 down to 1
    def back_step(state, inputs):
        bp_t, t = inputs
        active = t < input_lengths                                    # step t -> t-1
        move = jnp.take_along_axis(bp_t, state[:, None].astype(jnp.int32), axis=1)[:, 0]
        prev_state = jnp.where(active, state - move, state)
        return prev_state, state

    first_state, states_rev = jax.lax.scan(back_step, final_state,
                                           (backptrs, jnp.arange(1, T)), reverse=True)
    # states_rev[t-1] = state at frame t for t=1..T-1; prepend the t=0 state
    states = jnp.concatenate([first_state[None], states_rev], axis=0)
    # states: (T, B) lattice state occupied at each frame (clamped past xlen)

    # frame index of each target char: last frame whose state == 2*l+1
    frames = jnp.arange(T)[:, None, None]                             # (T, 1, 1)
    char_states = (2 * jnp.arange(L) + 1)[None, None, :]              # (1, 1, L)
    hit = (states[:, :, None] == char_states) & (frames < input_lengths[None, :, None])
    char_frames = jnp.max(jnp.where(hit, frames, 0), axis=0)          # (B, L)
    return char_frames.astype(jnp.int32)


def greedy_decode(log_probs: jnp.ndarray, output_lengths=None, K: int = 1):
    """Top-K class indices per frame (spec: decoders.py:6-16). Host-side list
    conversion is the caller's job."""
    if K == 1:
        idx = jnp.argmax(log_probs, axis=-1)
        return idx
    return jax.lax.top_k(log_probs, K)[1]
