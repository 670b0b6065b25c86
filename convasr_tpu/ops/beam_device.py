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
- candidates with the same prefix are MERGED exactly via a dense (M, M)
  hash-equality matrix + masked logsumexp (GATHER-FREE — see _step: on TPU a
  data-dependent gather inside a scan costs ~0.3-0.5 ms vs ~15-60 us for the
  dense reduction at this M);
- top-K canonical rows survive; prefix buffers are rebuilt with one-hot
  masked sums over the K parents and the appended char written at the
  parent's length.

LM fusion on device (round 2): an optional dense CHAR-bigram table
(decode/beam.char_lm_table) adds alpha*logP(c | last_char) + beta to every
prefix EXTENSION — shallow fusion entirely in HBM via one gather per
candidate row. Word-level ARPA fusion stays on the host C++ path.
"""
import functools

import jax
import jax.numpy as jnp

from ..infra import shaping

NEG_INF = -1e30
HASH_MULT = jnp.uint32(1000003)


def _logsumexp2(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _step(state, lp_t, active, blank_id, K, N, L, lm=None):
    """One beam step, GATHER-FREE (r4 rewrite).

    On TPU, data-dependent gathers/scatters over (B, M)-shaped operands cost
    ~0.3-0.5 ms EACH inside a scan (measured, scripts/beam_op_probe.py),
    while dense (B, M, M) masked reductions, sorts, and top_k cost ~15-60 us
    per step. The original step did ~14 gathers/scatters (argsort-gather
    merge, segment_* scatters, representative-row gathers) = ~4.7 ms/step;
    this version does the hash-merge as a dense pairwise-equality logsumexp
    and every selection as a one-hot masked sum, leaving lax.top_k as the
    only non-elementwise op. Semantics are IDENTICAL (same merge math, same
    representative choice: smallest original row index in each hash group).
    """
    prefixes, lengths, hashes, last, p_b, p_nb = state
    C = lp_t.shape[-1]

    # top-N candidate characters this frame (excluding blank handled apart)
    top_lp, top_c = jax.lax.top_k(lp_t, min(N + 1, C))
    # drop blank from the candidate list by masking it to NEG_INF
    cand_lp = jnp.where(top_c == blank_id, NEG_INF, top_lp)[:N + 1]
    cand_c = top_c[:N + 1]
    n_cand = cand_c.shape[0]

    p_tot = _logsumexp2(p_b, p_nb)                              # (K,)

    # ---- candidate tables in (K, J) layout: J = n_cand + 2 row kinds ----
    # kind j per beam k:
    #   0:        blank -> same prefix, contributes to p_b
    #   1:        repeat of last char -> same prefix, contributes to p_nb
    #   2..J-1:   extend with cand_c[j-2] -> new prefix, contributes to p_nb
    # parent indexing is a BROADCAST over axis 0, kind over axis 1 — the
    # (M,) parent/kind gather tables of the old layout become free.
    J = n_cand + 2
    M = K * J
    kind = jnp.arange(J)[None, :]                               # (1, J)

    blank_lp = lp_t[blank_id]                                   # static index
    # last char's log-prob via one-hot reduce (C is tiny), not a gather
    last_onehot = last[:, None] == jnp.arange(C)[None, :]       # (K, C)
    last_lp = jnp.where(
        last >= 0,
        jnp.sum(jnp.where(last_onehot, lp_t[None, :], 0.0), -1), NEG_INF)

    cand_char = jnp.concatenate(
        [jnp.full((2,), -1, cand_c.dtype), cand_c])[None, :]    # (1, J)
    cand_char_lp = jnp.concatenate(
        [jnp.full((2,), NEG_INF, cand_lp.dtype), cand_lp])[None, :]

    ext_hash = hashes[:, None] * HASH_MULT + (cand_char + 1).astype(jnp.uint32)
    new_hash = jnp.where(kind >= 2, ext_hash, hashes[:, None])  # (K, J)

    # p_b contribution: blank rows only
    pb_contrib = jnp.where(kind == 0, p_tot[:, None] + blank_lp, NEG_INF)
    # p_nb contributions
    repeat_contrib = jnp.where((kind == 1) & (last[:, None] >= 0),
                               p_nb[:, None] + last_lp[:, None], NEG_INF)
    is_repeat_ext = cand_char == last[:, None]                  # (K, J)
    ext_src = jnp.where(is_repeat_ext, p_b[:, None], p_tot[:, None])
    ext_contrib = jnp.where(kind >= 2, ext_src + cand_char_lp, NEG_INF)
    if lm is not None:
        # char-bigram shallow fusion: every extension pays
        # alpha * logP(c | last char of the parent) + beta; both table
        # lookups are one-hot reduces over the (V+1, V) table (V is tiny)
        lm_table, lm_alpha, lm_beta = lm
        V = lm_table.shape[1]
        ctx = jnp.where(last >= 0, last, V)                     # (K,)
        ctx_onehot = ctx[:, None] == jnp.arange(V + 1)[None, :]  # (K, V+1)
        ctx_rows = jnp.sum(
            jnp.where(ctx_onehot[:, :, None], lm_table[None, :, :], 0.0), 1)
        char_onehot = cand_char[:, :, None] == jnp.arange(V)[None, None, :]
        lm_lp = jnp.sum(
            jnp.where(char_onehot, ctx_rows[:, None, :], 0.0), -1)  # (K, J)
        ext_contrib = jnp.where(kind >= 2,
                                ext_contrib + lm_alpha * lm_lp + lm_beta,
                                ext_contrib)
    pnb_contrib = jnp.where(kind == 1, repeat_contrib, ext_contrib)
    pnb_contrib = jnp.where(kind == 0, NEG_INF, pnb_contrib)

    # dead candidates: parent beam itself dead
    parent_dead = (p_tot <= NEG_INF / 2)[:, None]
    pb_contrib = jnp.where(parent_dead, NEG_INF, pb_contrib)
    pnb_contrib = jnp.where(parent_dead, NEG_INF, pnb_contrib)
    # also kill rows whose own mass is empty so their hashes can't merge in;
    # sentinels are unique per ROW (the old parent*2+kind formula could
    # collide two dead rows — harmless, but unique ids are strictly safer)
    row_dead = (pb_contrib <= NEG_INF / 2) & (pnb_contrib <= NEG_INF / 2)
    row_id = jnp.arange(M, dtype=jnp.uint32).reshape(K, J)
    new_hash = jnp.where(row_dead, jnp.uint32(0xFFFFFFFF) - row_id, new_hash)

    # ---- merge rows with equal prefix hash: dense pairwise, no sort ----
    h = new_hash.reshape(M)
    pb = pb_contrib.reshape(M)
    pnb = pnb_contrib.reshape(M)
    same = h[:, None] == h[None, :]                             # (M, M)

    def masked_lse(v):
        mv = jnp.where(same, v[None, :], NEG_INF)               # (M, M)
        m = jnp.max(mv, -1)
        m = jnp.where(m <= NEG_INF / 2, NEG_INF, m)
        shifted = jnp.exp(jnp.clip(mv - m[:, None], -80.0, 0.0))
        shifted = jnp.where(mv <= NEG_INF / 2, 0.0, shifted)
        s = jnp.sum(shifted, -1)
        out = m + jnp.log(jnp.maximum(s, 1e-30))
        return jnp.where(s <= 0.0, NEG_INF, out)

    merged_pb = masked_lse(pb)                                  # (M,)
    merged_pnb = masked_lse(pnb)
    # one representative per hash group: the smallest original row index.
    # NON-canonical rows must die COMPLETELY (mass AND hash): top_k fills
    # spare beam slots from the NEG_INF-score ties, and a non-canonical row
    # still carrying the group's merged mass/hash would duplicate a live
    # prefix across beams — double-counting its probability every later step
    first_idx = jnp.min(jnp.where(same, jnp.arange(M)[None, :], M), -1)
    canonical = first_idx == jnp.arange(M)
    merged_pb = jnp.where(canonical, merged_pb, NEG_INF)
    merged_pnb = jnp.where(canonical, merged_pnb, NEG_INF)
    h = jnp.where(canonical, h,
                  jnp.uint32(0xFFFFFFFF) - jnp.arange(M, dtype=jnp.uint32))
    score = jnp.where(canonical, _logsumexp2(merged_pb, merged_pnb), NEG_INF)

    # top-K groups, indexed directly in original row space
    _, top_rows = jax.lax.top_k(score, K)                       # (K,) into M
    sel = top_rows[:, None] == jnp.arange(M)[None, :]           # (K, M)

    def pick(v, fill=0):
        # exact one-hot select (exactly one True per sel row; NEG_INF is a
        # finite constant so the masked sum is exact for f32 and ints alike)
        return jnp.sum(jnp.where(sel, v[None, :], fill), -1)

    new_parent = top_rows // J                                  # (K,) arith
    new_char = pick(jnp.broadcast_to(cand_char, (K, J)).reshape(M))
    new_hashes = pick(h)
    new_pb = pick(merged_pb)
    new_pnb = pick(merged_pnb)

    # rebuild prefix buffers; parent state via one-hot reduce over K
    par_onehot = new_parent[:, None] == jnp.arange(K)[None, :]  # (K, K)
    base_prefix = jnp.sum(
        jnp.where(par_onehot[:, :, None], prefixes[None, :, :], 0), 1)
    base_len = jnp.sum(jnp.where(par_onehot, lengths[None, :], 0), -1)
    parent_last = jnp.sum(jnp.where(par_onehot, last[None, :], 0), -1)
    write_pos = jnp.minimum(base_len, L - 1)
    new_prefixes = jnp.where(
        (jnp.arange(L)[None, :] == write_pos[:, None]) & (new_char >= 0)[:, None],
        jnp.maximum(new_char, 0)[:, None], base_prefix)
    new_lengths = jnp.minimum(base_len + (new_char >= 0), L - 1)
    new_last = jnp.where(new_char >= 0, new_char, parent_last)

    out = (new_prefixes, new_lengths, new_hashes, new_last, new_pb, new_pnb)
    # freeze the state past the utterance's valid length (active is scalar)
    return tuple(jnp.where(active, a, b) for a, b in zip(out, state))


@functools.partial(jax.jit, static_argnames=('beam_width', 'cutoff_top_n',
                                             'max_len', 'blank_id', 'unroll',
                                             'compact_tokens'))
@shaping.shapecheck
def beam_search_device(log_probs: shaping.BTC, input_lengths: shaping.B, blank_id: int,
                       beam_width: int = 16, cutoff_top_n: int = 8,
                       max_len: int = 256, lm_table=None,
                       lm_alpha=0.3, lm_beta=0.0, unroll: int = 1,
                       compact_tokens: bool = False):
    """Batched on-device prefix beam search.

    log_probs: (B, T, C) log-softmax; input_lengths: (B,) int frames.
    Optional lm_table (V+1, V): dense char-bigram log-probs
    (decode/beam.char_lm_table) for on-device shallow fusion.
    Returns (tokens (B, K, max_len) int32 -1-padded-by-length convention via
    `lengths`, lengths (B, K) int32, scores (B, K) f32), best beam first.
    compact_tokens=True casts tokens to uint8 (C <= 256) or int16 on device
    so a host caller fetches 1/4 the bytes (the (B, K, L) token buffer
    dominates the transfer; ids are < C so the cast is lossless).
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
                                (lp, jnp.arange(T)), unroll=unroll)
        prefixes, lengths, hashes, last, p_b, p_nb = state
        score = _logsumexp2(p_b, p_nb)
        order = jnp.argsort(-score)
        return prefixes[order], lengths[order], score[order]

    tokens, lengths, scores = jax.vmap(one)(log_probs.astype(jnp.float32),
                                            input_lengths)
    if compact_tokens:
        # prefixes are initialized to 0 and never negative — ids are < C
        tokens = tokens.astype(jnp.uint8 if C <= 256 else jnp.int16)
    return tokens, lengths, scores


def beam_carry_init(B: int, K: int, L: int):
    """Per-slot carried beam state for STREAMING decode (VERDICT r4 #9):
    the same state tuple beam_search_device scans over, batched (B, K, ...)
    so it can persist in a streaming engine's device state across ticks.
    Row 0 is the live empty prefix; dead rows get distinct sentinel hashes
    (identical init to beam_search_device's `one`)."""
    row_hash = (jnp.uint32(0x7FFFFFF0) + jnp.arange(K, dtype=jnp.uint32)
                ).at[0].set(jnp.uint32(1))
    return (jnp.zeros((B, K, L), jnp.int32),              # prefixes
            jnp.zeros((B, K), jnp.int32),                 # lengths
            jnp.tile(row_hash[None], (B, 1)),             # hashes
            jnp.full((B, K), -1, jnp.int32),              # last char
            jnp.full((B, K), NEG_INF, jnp.float32).at[:, 0].set(0.0),  # p_b
            jnp.full((B, K), NEG_INF, jnp.float32))       # p_nb


def beam_carry_steps(state, lp_seg, active, blank_id: int,
                     cutoff_top_n: int, lm=None):
    """Advance carried beam state by S frames per slot (traceable, meant to
    inline into a streaming engine's fused tick).

    state: beam_carry_init pytree ((B, K, ...) leaves); lp_seg: (B, S, C)
    log-softmax of the newly MATURED frames (each audio frame consumed
    exactly once across ticks); active: (B,) bool — frozen slots pass
    through unchanged. Feeding the full utterance through this in chunks
    yields the identical hypothesis set to one beam_search_device call
    (tests/test_streaming_beam_interim.py)."""
    K, L = state[0].shape[1], state[0].shape[2]
    N = min(cutoff_top_n, lp_seg.shape[-1] - 1)

    def one(state_i, seg_i, act):
        def body(st, lp_t):
            return _step(st, lp_t.astype(jnp.float32), act, blank_id,
                         K, N, L, lm=lm), None
        st, _ = jax.lax.scan(body, state_i, seg_i)
        return st

    return jax.vmap(one)(state, lp_seg, active)


def beam_carry_best(state, compact_tokens: bool = True, num_classes: int = 256):
    """Best-hypothesis view of carried state: (tokens (B, L), lengths (B,),
    scores (B,)) — the streaming INTERIM fetch (one row per slot, selected
    by total log-prob via one-hot, gather-free like the rest of the beam)."""
    prefixes, lengths, hashes, last, p_b, p_nb = state
    K = lengths.shape[1]
    score = _logsumexp2(p_b, p_nb)                       # (B, K)
    sel = jnp.argmax(score, -1)[:, None] == jnp.arange(K)[None, :]
    toks = jnp.sum(jnp.where(sel[:, :, None], prefixes, 0), 1)
    lens = jnp.sum(jnp.where(sel, lengths, 0), 1)
    sc = jnp.sum(jnp.where(sel, score, 0.0), 1)
    if compact_tokens:
        toks = toks.astype(jnp.uint8 if num_classes <= 256 else jnp.int16)
    return toks, lens, sc


def beam_search_device_sharded(log_probs, input_lengths, blank_id: int,
                               mesh, **kw):
    """Data-parallel device beam (VERDICT r4 #5): the batch dim shards over
    the mesh 'data' axis. The beam is vmapped per row with no cross-row
    communication, so GSPMD parallelizes it with zero collectives and the
    result is bit-identical to the single-device call (asserted by
    tests/test_beam_device.py::test_sharded_beam_equals_single_device and
    dryrun leg 5). B pads up to a multiple of the axis size; pad rows run
    with length 0 (every scan step masked) and are sliced off.
    Spec: /root/reference/transcribe.py:63-300 at pod scale."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = mesh.shape['data']
    log_probs = jnp.asarray(log_probs)
    input_lengths = jnp.asarray(input_lengths, jnp.int32)
    B = log_probs.shape[0]
    Bp = -(-B // n) * n
    if Bp != B:
        log_probs = jnp.concatenate(
            [log_probs, jnp.zeros((Bp - B,) + log_probs.shape[1:],
                                  log_probs.dtype)])
        input_lengths = jnp.concatenate(
            [input_lengths, jnp.zeros((Bp - B,), input_lengths.dtype)])
    bs = NamedSharding(mesh, P('data'))
    tokens, lengths, scores = beam_search_device(
        jax.device_put(log_probs, bs), jax.device_put(input_lengths, bs),
        blank_id, **kw)
    return tokens[:B], lengths[:B], scores[:B]
