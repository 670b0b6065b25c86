"""Streaming recognition tests: incremental CTC collapse equivalence,
windowed commit logic (fake forward), and a live gRPC StreamingRecognize
roundtrip. The reference has no streaming path — this is a round-2 addition
on top of the Google Speech v1 streaming contract."""
import json

import numpy as np
import pytest

from convasr_tpu.serve.streaming import StreamingCTCCollapse, StreamingTranscriber
from convasr_tpu.text import CharTokenizer


def offline_collapse(ids, blank):
    out, prev = [], blank
    for t in ids:
        if t != prev and t != blank:
            out.append(int(t))
        prev = t
    return out


class TestCollapse:
    def test_split_invariance(self):
        rng = np.random.RandomState(0)
        for trial in range(20):
            ids = rng.randint(0, 5, size=rng.randint(1, 60)).tolist()
            blank = 4
            ref = offline_collapse(ids, blank)
            c = StreamingCTCCollapse(blank)
            got = []
            i = 0
            while i < len(ids):
                step = int(rng.randint(1, 7))
                got.extend(c.feed(ids[i:i + step]))
                i += step
            assert got == ref, trial
            assert c.tokens == ref

    def test_clone_isolated(self):
        c = StreamingCTCCollapse(3)
        c.feed([0, 1])
        d = c.clone()
        d.feed([2])
        assert c.tokens == [0, 1] and d.tokens == [0, 1, 2]


class FakeTokenizer:
    """4-token vocab + blank last; decode to letters."""
    LETTERS = 'abcd'
    eps_id = 4
    def decode(self, token_lists):
        return [''.join(self.LETTERS[t] for t in ts) for ts in token_lists]


def make_fake_forward(sample_rate, frame_dur):
    """Pretend acoustic model: each output frame's token is encoded in the
    signal amplitude at the frame center (value v in [0..4] stored as v/10)."""
    def fused(x, xlen):
        x = np.asarray(x)  # (1, W)
        W = x.shape[1]
        frames = int(round(W / sample_rate / frame_dur))
        idx = np.zeros((1, frames, 2), np.float32)
        hop = W // frames
        for f in range(frames):
            v = x[0, f * hop + hop // 2]
            idx[0, f, 0] = np.round(v * 10).clip(0, 4)
        return idx
    return fused


class TestStreamingTranscriber:
    SR = 8000
    FRAME = 0.02  # 50 fps like JasperNet stride-2 @ 10 ms hop

    def synth(self, tokens):
        """One frame per token, amplitude-coded."""
        hop = int(self.SR * self.FRAME)
        sig = np.zeros(len(tokens) * hop, np.float32)
        for i, t in enumerate(tokens):
            sig[i * hop:(i + 1) * hop] = t / 10.0
        return sig

    def run_stream(self, tokens, chunk_frames, window_sec=2.0, lookahead_sec=0.2):
        tok = FakeTokenizer()
        st = StreamingTranscriber(make_fake_forward(self.SR, self.FRAME), tok,
                                  self.SR, window_sec=window_sec,
                                  lookahead_sec=lookahead_sec)
        sig = self.synth(tokens)
        hop = int(self.SR * self.FRAME)
        events = []
        for start in range(0, len(tokens), chunk_frames):
            chunk = sig[start * hop:(start + chunk_frames) * hop]
            events.extend(st.accept(chunk))
        events.extend(st.flush())
        return st, events

    def test_matches_offline_decode(self):
        rng = np.random.RandomState(1)
        tokens = rng.randint(0, 5, size=120).tolist()  # 2.4 s of frames
        st, events = self.run_stream(tokens, chunk_frames=25)
        offline = ''.join(FakeTokenizer.LETTERS[t]
                          for t in offline_collapse(tokens, 4))
        assert st.full_text() == offline
        # finals concatenate to the full text
        final_text = ''.join(e.text for e in events if e.is_final)
        assert final_text == offline

    def test_interim_then_final(self):
        tokens = [0] * 10 + [4] * 10 + [1] * 10 + [4] * 30
        st, events = self.run_stream(tokens, chunk_frames=10, lookahead_sec=0.4)
        kinds = [(e.is_final, e.text) for e in events]
        assert any(not f for f, _ in kinds)   # interim emitted
        assert any(f for f, _ in kinds)       # finals emitted
        assert st.full_text() == 'ab'

    def test_long_stream_slides_window(self):
        rng = np.random.RandomState(2)
        tokens = rng.randint(0, 5, size=400).tolist()  # 8 s > 2 s window
        st, _ = self.run_stream(tokens, chunk_frames=50, window_sec=2.0)
        offline = ''.join(FakeTokenizer.LETTERS[t]
                          for t in offline_collapse(tokens, 4))
        assert st.full_text() == offline


class TestEndpointing:
    """VAD endpointing (single_utterance): trailing silence must auto-commit
    the pending tail without waiting out the lookahead."""
    SR = 8000
    FRAME = 0.02

    @staticmethod
    def silence_aware_forward(sample_rate, frame_dur):
        """Near-zero frames decode as BLANK (a real acoustic model emits
        blank over silence); louder frames amplitude-code the token."""
        def fused(x, xlen):
            x = np.asarray(x)
            W = x.shape[1]
            frames = int(round(W / sample_rate / frame_dur))
            idx = np.zeros((1, frames, 2), np.float32)
            hop = W // frames
            for f in range(frames):
                v = x[0, f * hop + hop // 2]
                idx[0, f, 0] = 4 if abs(v) < 0.05 else np.round(v * 10).clip(0, 4)
            return idx
        return fused

    def make(self, endpoint):
        return StreamingTranscriber(
            self.silence_aware_forward(self.SR, self.FRAME), FakeTokenizer(),
            self.SR, window_sec=4.0,
            lookahead_sec=10.0,  # absurdly long: nothing commits WITHOUT vad
            endpoint_silence_sec=endpoint)

    def speech_then_silence(self, st, silence_sec=1.0):
        hop = int(self.SR * self.FRAME)
        sig = np.concatenate([
            np.repeat(np.asarray([0.1, 0.1, 0.2, 0.2], np.float32), hop),
            np.zeros(int(self.SR * silence_sec), np.float32)])
        events = []
        for start in range(0, len(sig), hop * 5):
            events.extend(st.accept(sig[start:start + hop * 5]))
        return events

    def test_silence_triggers_final(self):
        st = self.make(endpoint=0.5)
        events = self.speech_then_silence(st)
        finals = [e for e in events if e.is_final]
        assert st.endpointed
        assert ''.join(e.text for e in finals) == 'bc'

    def test_no_endpoint_without_vad(self):
        st = self.make(endpoint=None)
        events = self.speech_then_silence(st)
        assert not [e for e in events if e.is_final]
        assert not st.endpointed
        # flush still commits everything at end of stream
        assert ''.join(e.text for e in st.flush() if e.is_final) == 'bc'

    def test_endpoint_respects_silence_duration(self):
        st = self.make(endpoint=2.0)  # longer than the 1 s pause
        events = self.speech_then_silence(st, silence_sec=1.0)
        assert not [e for e in events if e.is_final]
        assert not st.endpointed


@pytest.mark.slow
class TestGrpcStreaming:
    def test_live_roundtrip(self):
        """Full StreamingRecognize over a real socket with a tiny real model."""
        import pathlib
        import grpc
        import jax
        import jax.numpy as jnp
        from convasr_tpu.decode.generators import GreedyCTCGenerator
        from convasr_tpu.frontend.logmel import LogFilterBankFrontend
        from convasr_tpu.models.zoo import create_model
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import (
            SpeechServicer, make_server, make_streaming_stub)
        from convasr_tpu.text import ProcessingPipeline

        root = pathlib.Path(__file__).resolve().parent.parent
        config = ProcessingPipeline.load_config(str(root / 'configs' / 'ru_text_config.json'))
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

        servicer = SpeechServicer(pipeline, frontend, forward, GreedyCTCGenerator())
        server = make_server(servicer, '127.0.0.1:50551', num_workers=2)
        server.start()
        try:
            channel = grpc.insecure_channel('127.0.0.1:50551')
            stub = make_streaming_stub(channel)
            audio = (np.random.RandomState(0).randn(sr * 3) * 2000).astype(np.int16)

            def requests():
                yield pb2.StreamingRecognizeRequest(
                    streaming_config=pb2.StreamingRecognitionConfig(
                        config=pb2.RecognitionConfig(
                            encoding=pb2.RecognitionConfig.LINEAR16,
                            sample_rate_hertz=sr, audio_channel_count=1),
                        interim_results=True))
                for start in range(0, len(audio), sr):
                    yield pb2.StreamingRecognizeRequest(
                        audio_content=audio[start:start + sr].tobytes())

            responses = list(stub(requests()))
            assert responses, 'no streaming responses'
            results = [r for resp in responses for r in resp.results]
            assert any(r.is_final for r in results)
            assert all(len(r.alternatives) == 1 for r in results)
            assert results[-1].result_end_time.seconds <= 3
        finally:
            server.stop(0)
