"""CTC loss / alignment tests against torch.nn.functional.ctc_loss and
brute-force dynamic programming."""
import itertools

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from convasr_tpu.ops.ctc import ctc_loss, ctc_alignment, greedy_decode, interleave_blanks


def make_batch(rng, B=3, T=20, C=7, L=5, blank_last=True):
    logits = rng.randn(B, T, C).astype(np.float32)
    log_probs = torch.log_softmax(torch.as_tensor(logits), dim=-1).numpy()
    blank = C - 1 if blank_last else 0
    low, high = (0, C - 1) if blank_last else (1, C)
    targets = rng.randint(low, high, size=(B, L)).astype(np.int32)
    input_lengths = rng.randint(T // 2, T + 1, size=B).astype(np.int32)
    target_lengths = rng.randint(1, L + 1, size=B).astype(np.int32)
    return log_probs, targets, input_lengths, target_lengths, blank


class TestCTCLoss:
    def test_matches_torch(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            lp, y, xlen, ylen, blank = make_batch(rng)
            ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(y),
                                       jnp.asarray(xlen), jnp.asarray(ylen), blank=blank))
            ref = F.ctc_loss(torch.as_tensor(lp).permute(1, 0, 2), torch.as_tensor(y),
                             torch.as_tensor(xlen), torch.as_tensor(ylen),
                             blank=blank, reduction='none').numpy()
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_blank_zero(self):
        rng = np.random.RandomState(1)
        lp, y, xlen, ylen, blank = make_batch(rng, blank_last=False)
        ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(y),
                                   jnp.asarray(xlen), jnp.asarray(ylen), blank=0))
        ref = F.ctc_loss(torch.as_tensor(lp).permute(1, 0, 2), torch.as_tensor(y),
                         torch.as_tensor(xlen), torch.as_tensor(ylen),
                         blank=0, reduction='none').numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_empty_target(self):
        rng = np.random.RandomState(2)
        lp, y, xlen, ylen, blank = make_batch(rng, B=2)
        ylen = np.array([0, 3], dtype=np.int32)
        ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(y),
                                   jnp.asarray(xlen), jnp.asarray(ylen), blank=blank))
        ref = F.ctc_loss(torch.as_tensor(lp).permute(1, 0, 2), torch.as_tensor(y),
                         torch.as_tensor(xlen), torch.as_tensor(ylen),
                         blank=blank, reduction='none').numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_repeated_labels(self):
        lp = np.log(np.full((1, 8, 3), 1 / 3, dtype=np.float32))
        y = np.array([[0, 0, 1]], dtype=np.int32)
        xlen, ylen = np.array([8], np.int32), np.array([3], np.int32)
        ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(y),
                                   jnp.asarray(xlen), jnp.asarray(ylen), blank=2))
        ref = F.ctc_loss(torch.as_tensor(lp).permute(1, 0, 2), torch.as_tensor(y),
                         torch.as_tensor(xlen), torch.as_tensor(ylen),
                         blank=2, reduction='none').numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_gradients_match_torch(self):
        rng = np.random.RandomState(3)
        B, T, C, L = 2, 12, 5, 3
        logits = rng.randn(B, T, C).astype(np.float32)
        y = rng.randint(0, C - 1, size=(B, L)).astype(np.int32)
        xlen = np.array([12, 9], np.int32)
        ylen = np.array([3, 2], np.int32)

        def loss_fn(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return ctc_loss(lp, jnp.asarray(y), jnp.asarray(xlen), jnp.asarray(ylen),
                            blank=C - 1).sum()

        ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

        lg_t = torch.as_tensor(logits, dtype=torch.float64).requires_grad_(True)
        lp_t = torch.log_softmax(lg_t, dim=-1)
        F.ctc_loss(lp_t.permute(1, 0, 2), torch.as_tensor(y), torch.as_tensor(xlen),
                   torch.as_tensor(ylen), blank=C - 1, reduction='none').sum().backward()
        np.testing.assert_allclose(ours, lg_t.grad.numpy(), rtol=1e-3, atol=1e-4)

    def test_infeasible_is_inf(self):
        # 2*ylen-1 states cannot fit into olen frames -> torch returns inf;
        # we must too, so train/loop.py's nonfinite-skip fires (ADVICE r1)
        rng = np.random.RandomState(7)
        B, T, C, L = 3, 6, 5, 5
        lp = np.log(np.full((B, T, C), 1 / C, dtype=np.float32))
        y = np.tile(np.array([0, 1, 0, 1, 0], np.int32), (B, 1))
        xlen = np.array([6, 4, 6], np.int32)        # row 1: 4 frames < 5 labels
        ylen = np.array([5, 5, 2], np.int32)
        ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(y),
                                   jnp.asarray(xlen), jnp.asarray(ylen), blank=C - 1))
        ref = F.ctc_loss(torch.as_tensor(lp).permute(1, 0, 2), torch.as_tensor(y),
                         torch.as_tensor(xlen), torch.as_tensor(ylen),
                         blank=C - 1, reduction='none').numpy()
        assert np.isinf(ours[1]) and np.isinf(ref[1])
        np.testing.assert_allclose(ours[[0, 2]], ref[[0, 2]], rtol=1e-4, atol=1e-4)

        # gradients of feasible rows unaffected; infeasible rows contribute 0
        def loss_fn(lg):
            l = ctc_loss(jax.nn.log_softmax(lg, -1), jnp.asarray(y),
                         jnp.asarray(xlen), jnp.asarray(ylen), blank=C - 1)
            return jnp.where(jnp.isfinite(l), l, 0.0).sum()
        g = np.asarray(jax.grad(loss_fn)(jnp.asarray(
            rng.randn(B, T, C).astype(np.float32))))
        assert np.isfinite(g).all()
        assert np.abs(g[1]).max() == 0.0

    def test_jit(self):
        rng = np.random.RandomState(4)
        lp, y, xlen, ylen, blank = make_batch(rng)
        f = jax.jit(lambda *a: ctc_loss(*a, blank=blank))
        out = np.asarray(f(jnp.asarray(lp), jnp.asarray(y), jnp.asarray(xlen), jnp.asarray(ylen)))
        ref = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(y),
                                  jnp.asarray(xlen), jnp.asarray(ylen), blank=blank))
        np.testing.assert_allclose(out, ref, rtol=1e-6)


def brute_force_best_path(log_probs, target, T, blank):
    """Enumerate all monotonic alignments of `target` to T frames; return the
    best path's per-char last-frame indices."""
    L = len(target)
    S = 2 * L + 1
    ext = [blank if s % 2 == 0 else target[s // 2] for s in range(S)]
    best_score, best_states = -np.inf, None
    # enumerate state sequences via DP is equivalent; do exhaustive DFS for tiny T
    import functools
    import sys
    sys.setrecursionlimit(10000)

    def allowed_next(s):
        nxt = [s, s + 1]
        if s + 2 < S and ext[s + 2] != blank and ext[s + 2] != ext[s]:
            nxt.append(s + 2)
        return [n for n in nxt if n < S]

    stack = [(0, [0]), (1, [1])] if L > 0 else [(0, [0])]
    while stack:
        s, path = stack.pop()
        if len(path) == T:
            if s >= S - 2:
                score = sum(log_probs[t, ext[path[t]]] for t in range(T))
                if score > best_score:
                    best_score, best_states = score, path
            continue
        for n in allowed_next(s):
            stack.append((n, path + [n]))
    frames = [0] * L
    for t, s in enumerate(best_states):
        if s % 2 == 1:
            frames[s // 2] = t
    return frames, best_score


class TestAlignment:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(5)
        for trial in range(4):
            T, C, L = 7, 4, 2
            lp = np.log(np.random.RandomState(trial).dirichlet(np.ones(C), size=(1, T))
                        ).astype(np.float32)
            y = rng.randint(0, C - 1, size=(1, L)).astype(np.int32)
            frames = np.asarray(ctc_alignment(jnp.asarray(lp), jnp.asarray(y),
                                              jnp.asarray([T], np.int32),
                                              jnp.asarray([L], np.int32), blank=C - 1))
            ref_frames, _ = brute_force_best_path(lp[0], y[0].tolist(), T, C - 1)
            assert frames[0].tolist() == ref_frames, (trial, frames[0].tolist(), ref_frames)

    def test_monotonic_and_in_range(self):
        rng = np.random.RandomState(6)
        lp, y, xlen, ylen, blank = make_batch(rng, B=4, T=30, C=6, L=6)
        frames = np.asarray(ctc_alignment(jnp.asarray(lp), jnp.asarray(y),
                                          jnp.asarray(xlen), jnp.asarray(ylen), blank=blank))
        for b in range(4):
            valid = frames[b, :ylen[b]]
            assert (np.diff(valid) > 0).all(), valid
            assert valid.min() >= 0 and valid.max() < xlen[b]

    def test_obvious_alignment(self):
        # class sequence clearly laid out in time: 0 0 1 1 blank blank
        C, blank = 3, 2
        probs = np.full((1, 6, C), 0.01, dtype=np.float32)
        for t, c in enumerate([0, 0, 1, 1, 2, 2]):
            probs[0, t, c] = 0.98
        lp = np.log(probs / probs.sum(-1, keepdims=True))
        frames = np.asarray(ctc_alignment(jnp.asarray(lp), jnp.asarray([[0, 1]], np.int32),
                                          jnp.asarray([6], np.int32),
                                          jnp.asarray([2], np.int32), blank=blank))
        assert frames[0, 0] == 1  # last frame of char 0
        assert frames[0, 1] == 3  # last frame of char 1


class TestGreedy:
    def test_argmax(self):
        lp = np.zeros((2, 4, 3), np.float32)
        lp[0, :, 1] = 1.0
        lp[1, :, 2] = 1.0
        idx = np.asarray(greedy_decode(jnp.asarray(lp)))
        assert (idx[0] == 1).all() and (idx[1] == 2).all()

    def test_topk(self):
        rng = np.random.RandomState(7)
        lp = rng.randn(1, 5, 4).astype(np.float32)
        top2 = np.asarray(greedy_decode(jnp.asarray(lp), K=2))
        assert top2.shape == (1, 5, 2)
        np.testing.assert_array_equal(top2[..., 0], lp.argmax(-1))


class TestInterleave:
    def test_layout(self):
        ext = np.asarray(interleave_blanks(jnp.asarray([[1, 2, 3]]), blank=0))
        assert ext.tolist() == [[0, 1, 0, 2, 0, 3, 0]]
