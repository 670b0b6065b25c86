"""On-device CTC prefix beam search (pure JAX, jittable, vmapped over batch).

SURVEY.md §7.3 calls for both decoder variants: the host C++ beam with LM
fusion (convasr_tpu/decode/beam.py) and an on-device vectorized beam that
keeps hypotheses on the accelerator so batched transcription never leaves
HBM until the final top-K token ids.

Design (fixed shapes throughout — no data-dependent control flow):
- beam state per utterance: prefix token buffer (K, L), lengths (K,), rolling
  prefix hashes (K,), last-char ids (K,), log-probs split into p_blank / p_nonblank;
- each step expands K beams x (top-N chars + blank + repeat) into M = K*(N+2)
  candidates, identified by their prefix hash;
- candidates with the same prefix are MERGED exactly: sort by hash,
  segment-logsumexp of p_b / p_nb (segment ids from hash run boundaries);
- top-K segments survive; prefix buffers are rebuilt by gathering the parent
  and scattering the appended char at the parent's length.

LM fusion on device (round 2): an optional dense CHAR-bigram table
(decode/beam.char_lm_table) adds alpha*logP(c | last_char) + beta to every
prefix EXTENSION — shallow fusion entirely in HBM via one gather per
candidate row. Word-level ARPA fusion stays on the host C++ path.
"""
import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30
HASH_MULT = jnp.uint32(1000003)


def _logsumexp2(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _segment_logsumexp(values, segment_ids, num_segments):
    """Log-sum-exp of `values` per segment (stable: per-segment max shift)."""
    seg_max = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= NEG_INF / 2, NEG_INF, seg_max)
    shifted = jnp.exp(jnp.clip(values - seg_max[segment_ids], -80.0, 0.0))
    shifted = jnp.where(values <= NEG_INF / 2, 0.0, shifted)
    seg_sum = jax.ops.segment_sum(shifted, segment_ids, num_segments=num_segments)
    out = seg_max + jnp.log(jnp.maximum(seg_sum, 1e-30))
    return jnp.where(seg_sum <= 0.0, NEG_INF, out)


def _step(state, lp_t, active, blank_id, K, N, L, lm=None):
    prefixes, lengths, hashes, last, p_b, p_nb = state
    C = lp_t.shape[-1]

    # top-N candidate characters this frame (excluding blank handled apart)
    top_lp, top_c = jax.lax.top_k(lp_t, min(N + 1, C))
    # drop blank from the candidate list by masking it to NEG_INF
    cand_lp = jnp.where(top_c == blank_id, NEG_INF, top_lp)[:N + 1]
    cand_c = top_c[:N + 1]
    n_cand = cand_c.shape[0]

    p_tot = _logsumexp2(p_b, p_nb)                              # (K,)

    # ---- candidate tables: M = K * (n_cand + 2) rows ----
    # row kinds per beam k:
    #   0:        blank -> same prefix, contributes to p_b
    #   1:        repeat of last char -> same prefix, contributes to p_nb
    #   2..n+1:   extend with cand_c[j] -> new prefix, contributes to p_nb
    M = K * (n_cand + 2)
    parent = jnp.repeat(jnp.arange(K), n_cand + 2)              # (M,)
    kind = jnp.tile(jnp.arange(n_cand + 2), K)                  # (M,)

    blank_lp = lp_t[blank_id]
    last_lp = jnp.where(last >= 0, lp_t[jnp.maximum(last, 0)], NEG_INF)  # (K,)

    cand_char = jnp.where(kind >= 2, cand_c[jnp.maximum(kind - 2, 0)], -1)  # (M,)
    cand_char_lp = jnp.where(kind >= 2, cand_lp[jnp.maximum(kind - 2, 0)], NEG_INF)

    parent_hash = hashes[parent]
    parent_last = last[parent]
    ext_hash = parent_hash * HASH_MULT + (cand_char + 1).astype(jnp.uint32)
    new_hash = jnp.where(kind >= 2, ext_hash, parent_hash)

    # p_b contribution: blank rows only
    pb_contrib = jnp.where(kind == 0, p_tot[parent] + blank_lp, NEG_INF)
    # p_nb contributions
    repeat_contrib = jnp.where((kind == 1) & (parent_last >= 0),
                               p_nb[parent] + last_lp[parent], NEG_INF)
    is_repeat_ext = cand_char == parent_last
    ext_src = jnp.where(is_repeat_ext, p_b[parent], p_tot[parent])
    ext_contrib = jnp.where(kind >= 2, ext_src + cand_char_lp, NEG_INF)
    if lm is not None:
        # char-bigram shallow fusion: every extension pays
        # alpha * logP(c | last char of the parent) + beta
        lm_table, lm_alpha, lm_beta = lm
        V = lm_table.shape[1]
        ctx = jnp.where(parent_last >= 0, parent_last, V)
        lm_lp = lm_table[ctx, jnp.clip(cand_char, 0, V - 1)]
        ext_contrib = jnp.where(kind >= 2,
                                ext_contrib + lm_alpha * lm_lp + lm_beta,
                                ext_contrib)
    pnb_contrib = jnp.where(kind == 1, repeat_contrib, ext_contrib)
    pnb_contrib = jnp.where(kind == 0, NEG_INF, pnb_contrib)

    # dead candidates: parent beam itself dead
    parent_dead = p_tot[parent] <= NEG_INF / 2
    pb_contrib = jnp.where(parent_dead, NEG_INF, pb_contrib)
    pnb_contrib = jnp.where(parent_dead, NEG_INF, pnb_contrib)
    # also kill rows whose own mass is empty so their hashes can't merge in
    row_dead = (pb_contrib <= NEG_INF / 2) & (pnb_contrib <= NEG_INF / 2)
    new_hash = jnp.where(row_dead, jnp.uint32(0xFFFFFFFF) - parent.astype(jnp.uint32)
                         * jnp.uint32(2) - kind.astype(jnp.uint32), new_hash)

    # ---- merge rows with equal prefix hash ----
    order = jnp.argsort(new_hash)
    sorted_hash = new_hash[order]
    seg_start = jnp.concatenate([jnp.ones(1, bool),
                                 sorted_hash[1:] != sorted_hash[:-1]])
    seg_ids = jnp.cumsum(seg_start) - 1                          # (M,)
    num_segments = M
    seg_pb = _segment_logsumexp(pb_contrib[order], seg_ids, num_segments)
    seg_pnb = _segment_logsumexp(pnb_contrib[order], seg_ids, num_segments)
    seg_score = _logsumexp2(seg_pb, seg_pnb)

    # representative row (first in sorted order) for each segment
    first_idx = jnp.where(seg_start, jnp.arange(M), M - 1)
    seg_repr = jax.ops.segment_min(first_idx, seg_ids, num_segments=num_segments)
    seg_repr = jnp.minimum(seg_repr, M - 1)

    # top-K segments
    top_score, top_seg = jax.lax.top_k(seg_score, K)
    repr_rows = order[seg_repr[top_seg]]                         # (K,) into M
    new_parent = parent[repr_rows]
    new_char = cand_char[repr_rows] * (kind[repr_rows] >= 2) \
        + (-1) * (kind[repr_rows] < 2)

    # rebuild prefix buffers
    base_prefix = prefixes[new_parent]                           # (K, L)
    base_len = lengths[new_parent]
    write_pos = jnp.minimum(base_len, L - 1)
    appended = jnp.where(
        (jnp.arange(L)[None, :] == write_pos[:, None]) & (new_char >= 0)[:, None],
        jnp.maximum(new_char, 0)[:, None], base_prefix)
    new_prefixes = appended
    new_lengths = jnp.minimum(base_len + (new_char >= 0), L - 1)
    new_last = jnp.where(new_char >= 0, new_char, last[new_parent])
    new_hashes = new_hash[repr_rows]
    new_pb = seg_pb[top_seg]
    new_pnb = seg_pnb[top_seg]

    out = (new_prefixes, new_lengths, new_hashes, new_last, new_pb, new_pnb)
    # freeze the state past the utterance's valid length (active is scalar)
    return tuple(jnp.where(active, a, b) for a, b in zip(out, state))


@functools.partial(jax.jit, static_argnames=('beam_width', 'cutoff_top_n',
                                             'max_len', 'blank_id'))
def beam_search_device(log_probs, input_lengths, blank_id: int,
                       beam_width: int = 16, cutoff_top_n: int = 8,
                       max_len: int = 256, lm_table=None,
                       lm_alpha=0.3, lm_beta=0.0):
    """Batched on-device prefix beam search.

    log_probs: (B, T, C) log-softmax; input_lengths: (B,) int frames.
    Optional lm_table (V+1, V): dense char-bigram log-probs
    (decode/beam.char_lm_table) for on-device shallow fusion.
    Returns (tokens (B, K, max_len) int32 -1-padded-by-length convention via
    `lengths`, lengths (B, K) int32, scores (B, K) f32), best beam first.
    """
    B, T, C = log_probs.shape
    K, N, L = beam_width, min(cutoff_top_n, C - 1), max_len

    def one(lp, xlen):
        prefixes = jnp.zeros((K, L), jnp.int32)
        lengths = jnp.zeros((K,), jnp.int32)
        last = jnp.full((K,), -1, jnp.int32)
        # only beam 0 is alive initially (the empty prefix); dead beams get
        # distinct sentinel hashes so they can never merge with beam 0
        p_b = jnp.full((K,), NEG_INF, jnp.float32).at[0].set(0.0)
        p_nb = jnp.full((K,), NEG_INF, jnp.float32)
        hashes = (jnp.uint32(0x7FFFFFF0) + jnp.arange(K, dtype=jnp.uint32)
                  ).at[0].set(jnp.uint32(1))

        lm = None if lm_table is None \
            else (jnp.asarray(lm_table, jnp.float32), lm_alpha, lm_beta)

        def body(state, inputs):
            lp_t, t = inputs
            return _step(state, lp_t, t < xlen, blank_id, K, N, L, lm=lm), None

        state, _ = jax.lax.scan(body, (prefixes, lengths, hashes, last, p_b, p_nb),
                                (lp, jnp.arange(T)))
        prefixes, lengths, hashes, last, p_b, p_nb = state
        score = _logsumexp2(p_b, p_nb)
        order = jnp.argsort(-score)
        return prefixes[order], lengths[order], score[order]

    return jax.vmap(one)(log_probs.astype(jnp.float32), input_lengths)
