"""Carried-state device-beam INTERIMS (VERDICT r4 #9, beyond-reference).

The batched engine's beam_interim_width keeps per-slot device beam state in
HBM across ticks (ops/beam_device.beam_carry_*, inlined into the fused tick);
each tick consumes the chunk's newly-matured frames exactly once. Feeding an
utterance incrementally must therefore produce the SAME top-1 hypothesis as
one offline beam_search_device call over the utterance's posteriors — the
leading/trailing silence the ring adds shifts every beam's score by the same
per-frame constant and cannot reorder hypotheses.

Fake model: window-position-independent amplitude-coded posteriors (same
construction as test_streaming_beam.TestBatchedEngineBeamEqualsOffline), so
streamed matured frames see exactly the offline posterior rows.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.ops.beam_device import beam_search_device
from convasr_tpu.serve.streaming_batch import BatchedStreamingEngine

SR = 8000
FRAME = 0.02
HOP = int(SR * FRAME)
V = 5                 # 4 letters + blank(last)
CHUNK_SEC = 0.32      # 16 frames
WINDOW_SEC = 2.0      # 100 frames


class FakeTokenizer:
    LETTERS = 'abcd'
    eps_id = 4
    vocab = ['a', 'b', 'c', 'd', '|']

    def decode(self, token_lists):
        return [''.join(self.LETTERS[t] for t in ts if t < 4)
                for ts in token_lists]


def synth(tokens):
    sig = np.zeros(len(tokens) * HOP, np.float32)
    for i, t in enumerate(tokens):
        sig[i * HOP:(i + 1) * HOP] = t / 10.0
    return sig


def frame_logprobs_np(sig):
    frames = len(sig) // HOP
    v = sig[np.arange(frames) * HOP + HOP // 2]
    tok = np.where(np.abs(v) < 0.05, 4,
                   np.round(v * 10).clip(0, 4)).astype(np.int64)
    probs = np.full((frames, V), 0.0025, np.float32)
    probs[np.arange(frames), tok] += 0.9875
    return np.log(probs)


def apply_lp(w, x, xlen):
    N, W = x.shape
    frames = W // HOP
    v = x[:, :frames * HOP].reshape(N, frames, HOP)[:, :, HOP // 2]
    tok = jnp.where(jnp.abs(v) < 0.05, 4,
                    jnp.round(v * 10).clip(0, 4)).astype(jnp.int32)
    probs = jax.nn.one_hot(tok, V) * 0.9875 + 0.0025
    return jnp.log(probs)


def make_engine(n_slots=3, ki=8, lookahead=0.4):
    return BatchedStreamingEngine(
        None, SR, n_slots=n_slots, window_sec=WINDOW_SEC,
        chunk_sec=CHUNK_SEC, logprobs_provider=lambda: (apply_lp, lambda: {}),
        max_lookahead_sec=lookahead, beam_interim_width=ki,
        beam_interim_cutoff=8, beam_interim_max_len=64)


class TestCarriedBeamInterim:
    def run_stream(self, engine, sessions, sigs, silence_ticks=4):
        chunk = engine.chunk
        interims = [''] * len(sigs)
        n_chunks = max(len(s) for s in sigs) // chunk + silence_ticks
        for c in range(n_chunks):
            for s, sig in enumerate(sigs):
                part = sig[c * chunk:(c + 1) * chunk]
                if len(part) < chunk:
                    part = np.concatenate(
                        [part, np.zeros(chunk - len(part), np.float32)])
                sessions[s].accept(part)
            engine.tick()
            for s, sess in enumerate(sessions):
                for e in sess.drain():
                    if not e.is_final and e.text:
                        interims[s] = e.text
        return interims

    def test_streamed_interim_equals_offline_device_beam(self):
        rng = np.random.RandomState(7)
        tok_streams = [rng.randint(0, 5, size=64).tolist() for _ in range(3)]
        engine = make_engine(n_slots=3)
        sessions = [engine.open(FakeTokenizer(), lookahead_sec=0.32)
                    for _ in tok_streams]
        sigs = [synth(t) for t in tok_streams]
        interims = self.run_stream(engine, sessions, sigs)

        for s, toks in enumerate(tok_streams):
            lp = frame_logprobs_np(sigs[s])
            bt, bl, _ = beam_search_device(
                jnp.asarray(lp[None]), jnp.asarray([len(lp)], np.int32),
                FakeTokenizer.eps_id, beam_width=8, cutoff_top_n=8,
                max_len=64, compact_tokens=True)
            bt, bl = np.asarray(bt), np.asarray(bl)
            offline = FakeTokenizer().decode([bt[0, 0, :bl[0, 0]].tolist()])[0]
            assert interims[s] == offline, (s, interims[s], offline)

    def test_single_dispatch_per_tick(self):
        engine = make_engine(n_slots=2)
        sess = engine.open(FakeTokenizer(), lookahead_sec=0.32)
        sess.accept(np.zeros(engine.chunk, np.float32))
        engine.tick()
        assert engine.ticks == 1   # beam advance rides the ONE fused dispatch

    def test_reset_restarts_hypothesis(self):
        rng = np.random.RandomState(9)
        toks = rng.randint(0, 4, size=48).tolist()   # no blanks: long text
        engine = make_engine(n_slots=1)
        sess = engine.open(FakeTokenizer(), lookahead_sec=0.32)
        sig = synth(toks)
        interims = self.run_stream(engine, [sess], [sig])
        assert interims[0]                            # grew a hypothesis
        with engine.lock:
            engine._beam_reset_slots.add(sess.slot)
        # silence after the reset: the carried state restarts empty
        for _ in range(3):
            sess.accept(np.zeros(engine.chunk, np.float32))
            engine.tick()
            sess.drain()
        btoks, blen = engine._beam_interim_latest[sess.slot]
        assert blen == 0, (blen, btoks[:blen])

    def test_greedy_path_untouched(self):
        # beam_interim_width=0 keeps the original tick signature/behavior
        engine = make_engine(n_slots=1, ki=0)
        sess = engine.open(FakeTokenizer(), lookahead_sec=0.32)
        toks = [1, 1, 4, 2, 4, 3] * 8
        sig = synth(toks)
        chunk = engine.chunk
        texts = []
        for c in range(len(sig) // chunk + 3):
            part = sig[c * chunk:(c + 1) * chunk]
            if len(part) < chunk:
                part = np.concatenate(
                    [part, np.zeros(chunk - len(part), np.float32)])
            sess.accept(part)
            engine.tick()
            for e in sess.drain():
                if e.is_final:
                    texts.append(e.text)
        assert ''.join(texts)  # committed text flows as before
