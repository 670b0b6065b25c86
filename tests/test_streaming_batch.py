"""Batched streaming engine: N sessions share one (N, W) device ring buffer
and one fused forward per tick (serve/streaming_batch.py). Committed text
must equal the per-stream StreamingTranscriber (and thus offline decode)."""
import numpy as np
import pytest

from convasr_tpu.serve.streaming import StreamingTranscriber
from convasr_tpu.serve.streaming_batch import BatchedStreamingEngine

from test_streaming import FakeTokenizer, offline_collapse

SR = 8000
FRAME = 0.02


def make_fake_forward_batch(sample_rate=SR, frame_dur=FRAME):
    """Batch version of test_streaming.make_fake_forward: every row's frame
    token is amplitude-coded at the frame center (v in [0..4] stored v/10)."""
    def fused(x, xlen):
        x = np.asarray(x)                       # (B, W)
        B, W = x.shape
        frames = int(round(W / sample_rate / frame_dur))
        hop = W // frames
        centers = x[:, np.arange(frames) * hop + hop // 2]
        out = np.zeros((B, frames, 2), np.float32)
        out[..., 0] = np.round(centers * 10).clip(0, 4)
        return out
    return fused


def synth(tokens):
    hop = int(SR * FRAME)
    sig = np.zeros(len(tokens) * hop, np.float32)
    for i, t in enumerate(tokens):
        sig[i * hop:(i + 1) * hop] = t / 10.0
    return sig


def letters(tokens):
    return ''.join(FakeTokenizer.LETTERS[t]
                   for t in offline_collapse(tokens, 4))


class TestBatchedEquality:
    CHUNK_FRAMES = 25          # 0.5 s per chunk

    def run_batched(self, token_streams, window_sec=2.0, lookahead_sec=0.2):
        chunk_sec = self.CHUNK_FRAMES * FRAME
        eng = BatchedStreamingEngine(make_fake_forward_batch(), SR,
                                     n_slots=len(token_streams),
                                     window_sec=window_sec,
                                     chunk_sec=chunk_sec)
        sessions = [eng.open(FakeTokenizer(), lookahead_sec=lookahead_sec)
                    for _ in token_streams]
        sigs = [synth(t) for t in token_streams]
        hop = int(SR * FRAME)
        n_chunks = max(len(t) for t in token_streams) // self.CHUNK_FRAMES
        events = [[] for _ in token_streams]
        for c in range(n_chunks):
            for s, sig in enumerate(sigs):
                lo = c * self.CHUNK_FRAMES * hop
                if lo < len(sig):
                    sessions[s].accept(sig[lo:lo + self.CHUNK_FRAMES * hop])
            eng.tick()
            for s, sess in enumerate(sessions):
                events[s].extend(sess.drain())
        for s, sess in enumerate(sessions):
            events[s].extend(sess.flush())
        return eng, sessions, events

    def test_matches_per_stream_and_offline(self):
        rng = np.random.RandomState(3)
        token_streams = [rng.randint(0, 5, size=150).tolist()
                         for _ in range(4)]
        eng, sessions, events = self.run_batched(token_streams)
        for s, tokens in enumerate(token_streams):
            assert sessions[s].full_text() == letters(tokens), s
            finals = ''.join(e.text for e in events[s] if e.is_final)
            assert finals == letters(tokens), s

    def test_one_dispatch_per_tick(self):
        rng = np.random.RandomState(4)
        token_streams = [rng.randint(0, 5, size=100).tolist()
                         for _ in range(8)]
        eng, _, _ = self.run_batched(token_streams)
        # 100 frames / 25 per chunk = 4 shared ticks (all 8 streams ride
        # each) + at most one flush tick per session — FAR below the
        # 8 x 4 = 32 dispatches of the per-stream engine
        assert eng.ticks <= 4 + len(token_streams), eng.ticks

    def test_unaligned_deposits(self):
        """Deposits that are not chunk multiples still decode exactly: the
        engine consumes C at a time and flush pads the remainder."""
        rng = np.random.RandomState(5)
        tokens = rng.randint(0, 5, size=137).tolist()
        sig = synth(tokens)
        eng = BatchedStreamingEngine(make_fake_forward_batch(), SR, n_slots=2,
                                     window_sec=2.0,
                                     chunk_sec=self.CHUNK_FRAMES * FRAME)
        sess = eng.open(FakeTokenizer(), lookahead_sec=0.2)
        pos, step = 0, 777          # odd-size deposits
        while pos < len(sig):
            sess.accept(sig[pos:pos + step])
            eng.tick()
            sess.drain()
            pos += step
        sess.flush()
        assert sess.full_text() == letters(tokens)


class TestSlots:
    def make_engine(self, n=2):
        return BatchedStreamingEngine(make_fake_forward_batch(), SR,
                                      n_slots=n, window_sec=2.0,
                                      chunk_sec=0.5)

    def test_capacity_and_release(self):
        eng = self.make_engine(2)
        a = eng.open(FakeTokenizer())
        b = eng.open(FakeTokenizer())
        with pytest.raises(AssertionError):
            eng.open(FakeTokenizer())
        a.flush()                       # releases the slot
        c = eng.open(FakeTokenizer())   # reusable now
        assert c.slot == a.slot
        b.flush(), c.flush()

    def test_released_slot_starts_silent(self):
        """A new tenant of a reused slot must not see the old ring content."""
        eng = self.make_engine(1)
        a = eng.open(FakeTokenizer(), lookahead_sec=0.0)
        a.accept(synth([1] * 25))
        eng.tick()
        a.drain()
        a.flush()
        b = eng.open(FakeTokenizer(), lookahead_sec=0.0)
        b.accept(synth([4] * 25))       # pure blank
        eng.tick()
        b.drain()
        finals = b.flush()
        assert b.full_text() == ''      # no ghost of stream a
        assert not finals

    def test_tick_with_nothing_ready_is_free(self):
        eng = self.make_engine(1)
        eng.open(FakeTokenizer())
        assert eng.tick() == 0
        assert eng.ticks == 0


def make_fake_logprobs_provider(sample_rate=SR, frame_dur=FRAME,
                                silence_blank=False):
    """jax-traceable analogue of make_fake_forward_batch for the fused
    single-dispatch tick: amplitude-coded tokens as (B, frames, 5) log-probs
    (argmax == the coded token), weights = empty pytree."""
    import jax.numpy as jnp

    def apply_lp(weights, x, xlen):
        B, W = x.shape
        frames = int(round(W / sample_rate / frame_dur))
        hop = W // frames
        centers = x[:, np.arange(frames) * hop + hop // 2]
        v = jnp.clip(jnp.round(centers * 10), 0, 4)
        if silence_blank:
            v = jnp.where(jnp.abs(centers) < 0.05, 4, v)
        return -jnp.abs(jnp.arange(5)[None, None, :].astype(jnp.float32)
                        - v[:, :, None])

    return lambda: (apply_lp, (lambda: {}))


class TestFusedTick:
    """Single-dispatch fused tick (+ uint8 tail fetch + wire transports):
    committed text must equal the legacy 2-dispatch full-window engine."""
    CHUNK_FRAMES = 25

    def run_fused(self, token_streams, transport='int16',
                  window_sec=4.0, max_lookahead_sec=0.3, lookahead_sec=0.2):
        chunk_sec = self.CHUNK_FRAMES * FRAME
        eng = BatchedStreamingEngine(
            None, SR, n_slots=len(token_streams), window_sec=window_sec,
            chunk_sec=chunk_sec,
            logprobs_provider=make_fake_logprobs_provider(),
            transport=transport, max_lookahead_sec=max_lookahead_sec)
        sessions = [eng.open(FakeTokenizer(), lookahead_sec=lookahead_sec)
                    for _ in token_streams]
        sigs = [synth(t) for t in token_streams]
        hop = int(SR * FRAME)
        n_chunks = max(len(t) for t in token_streams) // self.CHUNK_FRAMES
        events = [[] for _ in token_streams]
        for c in range(n_chunks):
            for s, sig in enumerate(sigs):
                lo = c * self.CHUNK_FRAMES * hop
                if lo < len(sig):
                    sessions[s].accept(sig[lo:lo + self.CHUNK_FRAMES * hop])
            eng.tick()
            for s, sess in enumerate(sessions):
                events[s].extend(sess.drain())
        for s, sess in enumerate(sessions):
            events[s].extend(sess.flush())
        return eng, sessions, events

    def test_tail_slice_is_active_and_exact(self):
        """window 4 s, max lookahead 0.3 s -> the tail fetch covers a strict
        subset of the window; decode must still equal offline."""
        rng = np.random.RandomState(7)
        token_streams = [rng.randint(0, 5, size=150).tolist()
                         for _ in range(3)]
        eng, sessions, events = self.run_fused(token_streams)
        assert eng.tail_frames is not None and eng.tail_frames < 200, \
            eng.tail_frames  # the slice really is a tail, not the window
        for s, tokens in enumerate(token_streams):
            assert sessions[s].full_text() == letters(tokens), s
            finals = ''.join(e.text for e in events[s] if e.is_final)
            assert finals == letters(tokens), s

    def test_mulaw_transport(self):
        """mu-law uint8 chunks (quarter the bytes): the ~38 dB companding
        noise must not change the amplitude-coded decode."""
        rng = np.random.RandomState(8)
        token_streams = [rng.randint(0, 5, size=100).tolist()
                         for _ in range(2)]
        _, sessions, _ = self.run_fused(token_streams, transport='mulaw')
        for s, tokens in enumerate(token_streams):
            assert sessions[s].full_text() == letters(tokens), s

    def test_mulaw_lut_matches_float_formula(self):
        """The 64K-LUT encoder (r4: removes the per-tick float companding
        that erased the mu-law wire win) must be bit-exact to the formula."""
        from convasr_tpu.serve.streaming_batch import MULAW_MU
        eng = BatchedStreamingEngine(
            None, SR, n_slots=1, window_sec=2.0, chunk_sec=0.5,
            logprobs_provider=make_fake_logprobs_provider(),
            transport='mulaw')
        rng = np.random.RandomState(9)
        x = np.concatenate([
            rng.randint(-32768, 32768, size=5000),
            [-32768, -1, 0, 1, 32767]]).astype(np.int16).reshape(1, -1)
        got = eng._encode_chunk(x)
        xc = x.astype(np.float32) / 32767.0
        y = np.sign(xc) * np.log1p(MULAW_MU * np.abs(xc)) / np.log1p(MULAW_MU)
        want = (y * 127.0 + 128.0).round().astype(np.uint8)
        np.testing.assert_array_equal(got, want)

    def test_lookahead_over_max_rejected(self):
        eng = BatchedStreamingEngine(
            None, SR, n_slots=1, window_sec=2.0, chunk_sec=0.5,
            logprobs_provider=make_fake_logprobs_provider(),
            max_lookahead_sec=0.3)
        with pytest.raises(AssertionError):
            eng.open(FakeTokenizer(), lookahead_sec=1.5)

    def test_endpoint_commits_early_fused(self):
        """VAD endpointing through the fused tick (lookahead > window: the
        tail becomes the full window via min())."""
        eng = BatchedStreamingEngine(
            None, SR, n_slots=1, window_sec=2.0, chunk_sec=0.5,
            logprobs_provider=make_fake_logprobs_provider(silence_blank=True),
            max_lookahead_sec=10.0)
        sess = eng.open(FakeTokenizer(), lookahead_sec=10.0,
                        endpoint_silence_sec=0.4)
        hop = int(SR * FRAME)
        speech = np.repeat(np.asarray([0.1, 0.1, 0.2, 0.2], np.float32), hop)
        silence = np.zeros(SR, np.float32)
        events = []
        for sig in (speech, silence[:4000], silence[4000:]):
            sess.accept(sig)
            eng.tick()
            events.extend(sess.drain())
        assert sess.endpointed
        assert ''.join(e.text for e in events if e.is_final) == 'bc'

    def test_real_model_fused_matches_legacy(self):
        """Tiny real JasperNet: fused single-dispatch engine == legacy
        2-dispatch engine == per-stream transcriber on the same audio."""
        import jax
        import jax.numpy as jnp
        from convasr_tpu.frontend.logmel import LogFilterBankFrontend
        from convasr_tpu.models.zoo import create_model

        sr = 8000
        frontend = LogFilterBankFrontend(out_channels=16, sample_rate=sr,
                                         window_size=0.02, window_stride=0.01,
                                         dither=0.0)
        model = create_model('JasperNetSmall', num_input_features=16,
                             num_classes=(6,), frontend=frontend, base_width=8)
        x0 = jnp.zeros((1, sr), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0,
                               xlen=jnp.ones((1,), jnp.float32))

        def apply_lp(v, x, xlen):
            return model.apply(v, x, xlen=xlen)['log_probs'][0]

        @jax.jit
        def _fused(v, x, xlen):
            lp = apply_lp(v, x, xlen)
            return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                              jnp.max(lp, -1).astype(jnp.float32)], -1)

        class _Tok:
            eps_id = 5

            def decode(self, tls):
                return [''.join('abcde.'[t] for t in ts) for ts in tls]

        audio = np.asarray(np.random.RandomState(11).randn(sr * 3) * 0.1,
                           np.float32)
        # pre-quantize to the int16 grid so the engines' int16 wire and the
        # per-stream float path see bit-identical signals
        audio = (audio * 32767.0).round().astype(np.int16) \
            .astype(np.float32) / 32767.0
        chunk = sr // 4

        def drive(engine):
            sess = engine.open(_Tok(), lookahead_sec=0.5)
            for lo in range(0, len(audio), chunk):
                sess.accept(audio[lo:lo + chunk])
                engine.tick()
                sess.drain()
            sess.flush()
            return sess.full_text()

        legacy = BatchedStreamingEngine(
            lambda x, xlen: _fused(variables, x, xlen), sr, n_slots=1,
            window_sec=2.0, chunk_sec=chunk / sr)
        fused_eng = BatchedStreamingEngine(
            None, sr, n_slots=1, window_sec=2.0, chunk_sec=chunk / sr,
            logprobs_provider=lambda: (apply_lp, (lambda: variables)),
            transport='int16', max_lookahead_sec=0.6)
        text_legacy, text_fused = drive(legacy), drive(fused_eng)
        # (per-stream output can differ by a flush-padding token or two on a
        # random-weights model — the batched flush pads to a full chunk, which
        # shifts the window; fused vs legacy see IDENTICAL padding, so their
        # equality is exact)
        assert text_fused == text_legacy


def make_silence_aware_forward_batch(sample_rate=SR, frame_dur=FRAME):
    """Near-zero frames decode as BLANK (a real acoustic model emits blank
    over silence); louder frames amplitude-code the token."""
    def fused(x, xlen):
        x = np.asarray(x)
        B, W = x.shape
        frames = int(round(W / sample_rate / frame_dur))
        hop = W // frames
        centers = x[:, np.arange(frames) * hop + hop // 2]
        out = np.zeros((B, frames, 2), np.float32)
        out[..., 0] = np.where(np.abs(centers) < 0.05, 4,
                               np.round(centers * 10).clip(0, 4))
        return out
    return fused


class TestBatchedEndpointing:
    def test_endpoint_commits_early(self):
        """Silence after speech commits the tail despite a huge lookahead."""
        eng = BatchedStreamingEngine(make_silence_aware_forward_batch(), SR,
                                     n_slots=1, window_sec=2.0, chunk_sec=0.5)
        sess = eng.open(FakeTokenizer(), lookahead_sec=10.0,
                        endpoint_silence_sec=0.4)
        hop = int(SR * FRAME)
        speech = np.repeat(np.asarray([0.1, 0.1, 0.2, 0.2], np.float32), hop)
        silence = np.zeros(SR, np.float32)       # 1 s
        events = []
        for sig in (speech, silence[:4000], silence[4000:]):
            sess.accept(sig)
            eng.tick()
            events.extend(sess.drain())
        finals = [e for e in events if e.is_final]
        assert sess.endpointed
        assert ''.join(e.text for e in finals) == 'bc'


@pytest.mark.slow
class TestGrpcBatchedStreaming:
    def test_live_roundtrip_via_engine(self):
        """StreamingRecognize over a real socket with the shared batched
        engine (stream_engine + EngineTicker): two concurrent streams share
        one device program; finals still arrive and slots are released."""
        import pathlib
        import threading

        import grpc
        import jax
        import jax.numpy as jnp
        from convasr_tpu.decode.generators import GreedyCTCGenerator
        from convasr_tpu.frontend.logmel import LogFilterBankFrontend
        from convasr_tpu.models.zoo import create_model
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import (
            SpeechServicer, make_server, make_streaming_stub)
        from convasr_tpu.serve.streaming_batch import (
            BatchedStreamingEngine, EngineTicker)
        from convasr_tpu.text import ProcessingPipeline

        root = pathlib.Path(__file__).resolve().parent.parent
        config = ProcessingPipeline.load_config(
            str(root / 'configs' / 'ru_text_config.json'))
        pipeline = ProcessingPipeline.make(config, 'char_legacy')
        sr = 8000
        frontend = LogFilterBankFrontend(out_channels=16, sample_rate=sr,
                                         window_size=0.02, window_stride=0.01,
                                         dither=0.0)
        model = create_model('JasperNetSmall', num_input_features=16,
                             num_classes=(pipeline.tokenizer.vocab_size,),
                             frontend=frontend, base_width=8)
        x0 = jnp.zeros((1, sr), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0,
                               xlen=jnp.ones((1,), jnp.float32))

        def forward(x, xlen):
            out = model.apply(variables, x, xlen=xlen)
            return out['log_probs'][0], out['logits'][0], out['olen'][0]

        @jax.jit
        def _fused(v, x, xlen):
            lp = model.apply(v, x, xlen=xlen)['log_probs'][0]
            return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                              jnp.max(lp, -1).astype(jnp.float32)], -1)

        forward.fused = lambda x, xlen: _fused(variables, x, xlen)

        engine = BatchedStreamingEngine(forward.fused, sr, n_slots=2,
                                        window_sec=3.0, chunk_sec=0.25)
        ticker = EngineTicker(engine)
        ticker.start()
        servicer = SpeechServicer(pipeline, frontend, forward,
                                  GreedyCTCGenerator(), stream_engine=engine)
        server = make_server(servicer, '127.0.0.1:50552', num_workers=4)
        server.start()
        try:
            channel = grpc.insecure_channel('127.0.0.1:50552')
            stub = make_streaming_stub(channel)

            def requests(seed):
                audio = (np.random.RandomState(seed).randn(sr * 2) * 2000) \
                    .astype(np.int16)
                yield pb2.StreamingRecognizeRequest(
                    streaming_config=pb2.StreamingRecognitionConfig(
                        config=pb2.RecognitionConfig(
                            encoding=pb2.RecognitionConfig.LINEAR16,
                            sample_rate_hertz=sr, audio_channel_count=1),
                        interim_results=True))
                for start in range(0, len(audio), sr // 2):
                    yield pb2.StreamingRecognizeRequest(
                        audio_content=audio[start:start + sr // 2].tobytes())

            outs = {}

            def drive(seed):
                outs[seed] = list(stub(requests(seed)))

            threads = [threading.Thread(target=drive, args=(s,))
                       for s in (0, 1)]
            [t.start() for t in threads]
            [t.join(timeout=120) for t in threads]
            for seed, responses in outs.items():
                results = [r for resp in responses for r in resp.results]
                assert any(r.is_final for r in results), seed
            assert engine.ticks >= 1            # the shared engine ran
            assert len(engine.sessions) == 0    # slots released after streams
            assert sorted(engine._free) == [0, 1]
        finally:
            ticker.stop()
            server.stop(0)
