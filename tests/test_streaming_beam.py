"""Streaming beam+LM finals (VERDICT r3 #1): streaming finals must EQUAL the
offline beam decode of the same audio, on both the per-stream transcriber and
the batched engine. The WER-improves proof (beam+LM < greedy through the
REAL model on the streaming path) lives in test_lm_wer.py, which reuses the
trained-corpus fixture.

Spec: /root/reference/decoders.py:19-55 beam semantics; repo
serve/streaming.py::_beam_final, serve/streaming_batch.py beam_topk tick.
"""
import numpy as np
import pytest

from convasr_tpu.decode.beam import BeamSearchDecoder
from convasr_tpu.serve.streaming import StreamingTranscriber
from convasr_tpu.serve.streaming_batch import BatchedStreamingEngine

SR = 8000
FRAME = 0.02          # 50 fps
HOP = int(SR * FRAME)
V = 5                 # 4 letters + blank(last)


class FakeTokenizer:
    LETTERS = 'abcd'
    eps_id = 4
    vocab = ['a', 'b', 'c', 'd', '|']

    def decode(self, token_lists):
        return [''.join(self.LETTERS[t] for t in ts if t < 4)
                for ts in token_lists]


def frame_logprobs(sig):
    """Window-position-INDEPENDENT fake posteriors: each frame's class is
    amplitude-coded at the frame center (v/10), p(class)=0.99 (sharp, so
    the beam's summed insertion alignments can't beat confident blanks) —
    so streaming top-k accumulation sees exactly the offline matrix.
    Near-zero amplitude (acoustic silence, incl. window zero-padding)
    decodes as BLANK, like a real model."""
    frames = len(sig) // HOP
    v = sig[np.arange(frames) * HOP + HOP // 2]
    tok = np.where(np.abs(v) < 0.05, 4,
                   np.round(v * 10).clip(0, 4)).astype(np.int64)
    probs = np.full((frames, V), 0.0025, np.float32)
    probs[np.arange(frames), tok] += 0.9875
    return np.log(probs)


def make_forwards():
    def fused(x, xlen):
        lp = frame_logprobs(np.asarray(x)[0])
        out = np.zeros((1, len(lp), 2), np.float32)
        out[0, :, 0] = lp.argmax(-1)
        return out

    def fused_topk(x, xlen, k):
        lp = frame_logprobs(np.asarray(x)[0])
        ids = np.argsort(-lp, axis=-1)[:, :k]
        vals = np.take_along_axis(lp, ids, axis=1)
        return np.stack([vals, ids.astype(np.float32)],
                        -1)[None]  # (1, frames, k, 2)

    return fused, fused_topk


def synth(tokens):
    sig = np.zeros(len(tokens) * HOP, np.float32)
    for i, t in enumerate(tokens):
        sig[i * HOP:(i + 1) * HOP] = t / 10.0
    return sig


def offline_beam_text(dec, sig):
    tokens = dec.decode_one(frame_logprobs(sig))[0][0]
    return FakeTokenizer().decode([tokens])[0]


class TestPerStreamBeamEqualsOffline:
    def run_stream(self, tokens, dec, chunk_frames=25, k=5, **kw):
        fused, fused_topk = make_forwards()
        st = StreamingTranscriber(
            fused, FakeTokenizer(), SR, window_sec=2.0, lookahead_sec=0.2,
            beam_decoder=dec, forward_topk=fused_topk, beam_topk=k, **kw)
        sig = synth(tokens)
        events = []
        for start in range(0, len(tokens), chunk_frames):
            events.extend(st.accept(
                sig[start * HOP:(start + chunk_frames) * HOP]))
        events.extend(st.flush())
        return st, events, sig

    @pytest.mark.parametrize('k', [5, 3])
    def test_finals_equal_offline_beam(self, k):
        """k=5 covers the full vocab (bit-identical posteriors); k=3 < V
        still matches because the beam only extends cutoff_top_n<=k
        candidates and the floor never wins."""
        rng = np.random.RandomState(1)
        tokens = rng.randint(0, 5, size=120).tolist()
        dec = BeamSearchDecoder(FakeTokenizer(), beam_width=8,
                                cutoff_top_n=min(k, 3))
        st, events, sig = self.run_stream(tokens, dec, k=k)
        offline = offline_beam_text(dec, sig)
        finals = [e.text for e in events if e.is_final]
        assert ''.join(finals) == offline
        assert st.full_text() == offline

    def test_long_stream_slides_window(self):
        """Utterance far longer than the window: top-k accumulation is
        host-side, so the beam still sees every frame."""
        rng = np.random.RandomState(2)
        tokens = rng.randint(0, 5, size=400).tolist()  # 8 s > 2 s window
        dec = BeamSearchDecoder(FakeTokenizer(), beam_width=8, cutoff_top_n=3)
        st, events, sig = self.run_stream(tokens, dec, chunk_frames=50)
        assert ''.join(e.text for e in events if e.is_final) \
            == offline_beam_text(dec, sig)

    def test_greedy_demoted_to_interim(self):
        rng = np.random.RandomState(3)
        tokens = rng.randint(0, 5, size=120).tolist()
        dec = BeamSearchDecoder(FakeTokenizer(), beam_width=8, cutoff_top_n=3)
        st, events, _ = self.run_stream(tokens, dec)
        finals = [e for e in events if e.is_final]
        interims = [e for e in events if not e.is_final]
        assert len(finals) == 1          # only the flush finalizes (no VAD)
        assert interims                  # greedy text streams as interim

    def test_forced_final_bounds_utterance(self):
        rng = np.random.RandomState(4)
        # blank-isolated letters: a forced split can never straddle a
        # repeated character, so split beam decodes == the offline decode
        letters = rng.randint(0, 4, size=150)
        tokens = np.stack([letters, np.full(150, 4)], 1).reshape(-1).tolist()
        dec = BeamSearchDecoder(FakeTokenizer(), beam_width=8, cutoff_top_n=3)
        st, events, sig = self.run_stream(tokens, dec, chunk_frames=50,
                                          beam_force_final_sec=2.0)
        finals = [e for e in events if e.is_final]
        assert len(finals) >= 2          # forced mid-stream finals
        assert ''.join(e.text for e in finals) == offline_beam_text(dec, sig)


class TestBatchedEngineBeamEqualsOffline:
    CHUNK_SEC = 0.32     # 16 frames

    def make_engine(self, n_slots=2, k=5):
        import jax
        import jax.numpy as jnp

        def apply_lp(w, x, xlen):
            N, W = x.shape
            frames = W // HOP
            v = x[:, :frames * HOP].reshape(N, frames, HOP)[:, :, HOP // 2]
            tok = jnp.where(jnp.abs(v) < 0.05, 4,
                            jnp.round(v * 10).clip(0, 4)).astype(jnp.int32)
            probs = jax.nn.one_hot(tok, V) * 0.9875 + 0.0025
            return jnp.log(probs)

        provider = lambda: (apply_lp, lambda: {})
        return BatchedStreamingEngine(
            None, SR, n_slots=n_slots, window_sec=2.0,
            chunk_sec=self.CHUNK_SEC, logprobs_provider=provider,
            beam_topk=k)

    def test_batched_finals_equal_offline_and_per_stream(self):
        rng = np.random.RandomState(5)
        engine = self.make_engine()
        dec = BeamSearchDecoder(FakeTokenizer(), beam_width=8, cutoff_top_n=3)
        chunk = int(SR * self.CHUNK_SEC)
        sigs = [synth(rng.randint(0, 5, size=160).tolist()) for _ in range(2)]
        sessions = [engine.open(FakeTokenizer(), lookahead_sec=0.2,
                                beam_decoder=dec) for _ in sigs]
        finals = [[] for _ in sigs]
        for start in range(0, len(sigs[0]), chunk):
            for s, sig in zip(sessions, sigs):
                s.accept(sig[start:start + chunk])
            engine.tick()
            for i, s in enumerate(sessions):
                finals[i].extend(e.text for e in s.drain() if e.is_final)
        for i, s in enumerate(sessions):
            finals[i].extend(e.text for e in s.flush() if e.is_final)
        for i, sig in enumerate(sigs):
            assert ''.join(finals[i]) == offline_beam_text(dec, sig), i

    def test_beam_tail_fetch_is_packed_uint8(self):
        """Char vocabs ride the beam tail fetch as (N, F, K, 3) uint8 —
        [f16 log-prob bytes, u8 id] — 3/4 the bytes of the f16 stack, and
        the delivered inbox entry round-trips the log-probs exactly as f16."""
        engine = self.make_engine(n_slots=1, k=3)
        dec = BeamSearchDecoder(FakeTokenizer(), beam_width=4)
        s = engine.open(FakeTokenizer(), lookahead_sec=0.2, beam_decoder=dec)
        chunk = int(SR * self.CHUNK_SEC)
        s.accept(synth([1] * 32)[:chunk])
        engine.tick()
        assert engine._beam_pack_u8
        # _tick donates the ring buffer (donate_argnums) — capture BOTH
        # outputs so engine._buf stays live (ADVICE r4)
        buf_before = np.asarray(engine._buf)
        engine._buf, tail = engine._tick_fused(engine._buf, None,
                                               np.zeros((1, chunk), np.int16),
                                               np.zeros(1, bool),
                                               np.zeros(1, bool))
        tail = np.asarray(tail)
        assert tail.dtype == np.uint8 and tail.shape[-1] == 3  # (N, F, K, 3)
        # unpack [f16 val bytes, u8 id] and check against top-k of the SAME
        # log-probs (ADVICE r4: the f16 round-trip assertion was tautological
        # for byte-order/offset bugs) — advance=False left the buffer as-is,
        # so the host frame_logprobs of buf_before IS the tick's lp matrix
        vals = tail[..., :2].copy().view(np.float16)[..., 0].astype(np.float32)
        ids = tail[..., 2].astype(np.int64)
        lp = frame_logprobs(buf_before[0])
        F = tail.shape[1]
        exp_ids = np.argsort(-lp, axis=-1, kind='stable')[:, :3][-F:]
        exp_vals = np.take_along_axis(lp[-F:], exp_ids, axis=1)
        assert np.array_equal(ids[0], exp_ids)
        # f16-rounded host recompute; atol covers XLA-vs-numpy log ulps
        # (a byte-order/offset bug produces garbage far outside this)
        assert np.allclose(
            vals[0], exp_vals.astype(np.float16).astype(np.float32),
            atol=1e-2)
        idx, vals_in, ids_in = s.inbox[0]
        assert ids_in.dtype == np.int64 and ids_in.max() < V
        # top-1 id stream doubles as the greedy/interim path
        assert np.array_equal(idx, ids_in[:, 0])

    def test_endpoint_emits_beam_final(self):
        """VAD endpoint: the beam final covers exactly the endpointed
        utterance, and a following utterance gets its own final."""
        engine = self.make_engine(n_slots=1)
        dec = BeamSearchDecoder(FakeTokenizer(), beam_width=8, cutoff_top_n=3)
        s = engine.open(FakeTokenizer(), lookahead_sec=0.2, beam_decoder=dec,
                        endpoint_silence_sec=0.4)
        chunk = int(SR * self.CHUNK_SEC)
        # 'bc' then 1 s silence (-> endpoint final), then 'd'
        sig = np.concatenate([
            synth([1] * 8 + [2] * 8), np.zeros(SR, np.float32),
            synth([3] * 8)])
        pad = (-len(sig)) % chunk
        sig = np.concatenate([sig, np.zeros(pad, np.float32)])
        finals = []
        for start in range(0, len(sig), chunk):
            s.accept(sig[start:start + chunk])
            engine.tick()
            finals.extend(e.text for e in s.drain() if e.is_final)
        assert finals and finals[0] == 'bc'   # endpoint fired mid-stream
        finals.extend(e.text for e in s.flush() if e.is_final)
        assert ''.join(finals) == 'bcd'


class TestRescoreFinals:
    """Streaming finals through a rescore-mode decoder (acoustic beam +
    word-LM rescoring — the host-only hybrid recipe) must still equal the
    offline decode of the same audio with the same decoder."""

    def test_finals_equal_offline_rescore(self, tmp_path):
        arpa = tmp_path / 'words.arpa'
        arpa.write_text('\\data\\\n'
                        'ngram 1=3\n\n'
                        '\\1-grams:\n'
                        '-0.3\tab\n-0.7\tba\n-1.0\tdc\n\n'
                        '\\end\\\n')
        rng = np.random.RandomState(5)
        tokens = rng.randint(0, 5, size=100).tolist()
        dec = BeamSearchDecoder(FakeTokenizer(), lm_path=str(arpa),
                                beam_width=8, cutoff_top_n=3,
                                beam_alpha=1.5, beam_beta=0.5,
                                rescore=True, rescore_topk=8)
        assert dec.rescore
        helper = TestPerStreamBeamEqualsOffline()
        st, events, sig = helper.run_stream(tokens, dec, k=5)
        offline = offline_beam_text(dec, sig)
        finals = [e.text for e in events if e.is_final]
        assert ''.join(finals) == offline
        assert st.full_text() == offline
