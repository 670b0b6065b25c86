"""gRPC serving mock (real client/server over localhost) + VAD tests."""
import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ROOT = pathlib.Path(__file__).resolve().parent.parent


class TestVAD:
    def _speech_signal(self, sr=8000):
        rng = np.random.RandomState(0)
        quiet = 0.001 * rng.randn(sr)
        loud = 0.5 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr) + 0.01 * rng.randn(sr)
        return np.concatenate([quiet, loud, quiet]).astype(np.float32)[None, :]

    def test_detect_speech(self):
        from convasr_tpu.audio.vad import detect_speech
        sig = self._speech_signal()
        mask = detect_speech(sig, 8000, window_size=0.02, aggressiveness=1)
        assert mask.shape == sig.shape
        # middle second mostly speech, edges mostly not
        assert mask[0, 8000:16000].mean() > 0.8
        assert mask[0, :8000].mean() < 0.2

    def test_mask_to_segments_and_postprocess(self):
        from convasr_tpu.audio.vad import detect_speech, mask_to_segments, postprocess_cut
        sig = self._speech_signal()
        mask = detect_speech(sig, 8000, window_size=0.02)
        segments = postprocess_cut(mask_to_segments(mask[0], 8000))
        assert len(segments) == 1
        b, e = segments[0]
        assert 0.7 < b < 1.3 and 1.7 < e < 2.4

    def test_postprocess_batching_splits(self):
        from convasr_tpu.audio.vad import postprocess_batching
        out = postprocess_batching([(0.0, 45.0)], max_duration=20.0, expand=0.0)
        assert len(out) == 3
        assert all(e - b <= 20.0 + 1e-6 for b, e in out)

    def test_upsample(self):
        from convasr_tpu.audio.vad import upsample
        mask = np.array([[True] * 10 + [False] * 10])
        up = upsample(mask, 4)
        assert up.tolist() == [[True, True, False, False]]


@pytest.fixture(scope='module')
def server_setup(tmp_path_factory):
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend
    from convasr_tpu.models.zoo import create_model
    from convasr_tpu.decode.generators import GreedyCTCGenerator
    from convasr_tpu.serve.grpc_google_api import SpeechServicer, make_server
    from convasr_tpu.text import ProcessingPipeline

    config = ProcessingPipeline.load_config(str(ROOT / 'configs' / 'ru_text_config.json'))
    pipeline = ProcessingPipeline.make(config, 'char_legacy')
    sr = 8000
    frontend = LogFilterBankFrontend(out_channels=16, sample_rate=sr,
                                     window_size=0.02, window_stride=0.01, dither=0.0)
    model = create_model('JasperNetSmall', num_input_features=16,
                         num_classes=(pipeline.tokenizer.vocab_size,),
                         frontend=frontend, base_width=8)
    x0 = jnp.zeros((1, sr), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, xlen=jnp.ones((1,), jnp.float32))

    def forward(x, xlen):
        out = model.apply(variables, x, xlen=xlen)
        return out['log_probs'][0], out['logits'][0], out['olen'][0]

    servicer = SpeechServicer(pipeline, frontend, forward, GreedyCTCGenerator())
    server = make_server(servicer, '127.0.0.1:50151', num_workers=2)
    server.start()
    yield '127.0.0.1:50151'
    server.stop(0)


class TestGrpcServe:
    def test_recognize_roundtrip(self, server_setup):
        import grpc
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import make_client_stub

        rng = np.random.RandomState(0)
        pcm = (0.1 * rng.randn(8000) * 32767).astype('<i2').tobytes()
        request = pb2.RecognizeRequest()
        request.config.encoding = pb2.RecognitionConfig.LINEAR16
        request.config.sample_rate_hertz = 8000
        request.config.audio_channel_count = 1
        request.audio.content = pcm

        with grpc.insecure_channel(server_setup) as channel:
            stub = make_client_stub(channel)
            response = stub(request, timeout=120)
        assert len(response.results) == 1
        alt = response.results[0].alternatives[0]
        assert isinstance(alt.transcript, str)
        for w in alt.words:
            assert w.end_time.seconds >= 0


class TestServeBucketing:
    def test_different_lengths_share_compiled_shape(self, server_setup):
        """Requests of different durations must hit the SAME padded jit shape
        (bucket padding) and still return sane word timestamps."""
        import grpc
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import make_client_stub
        sr = 8000
        with grpc.insecure_channel(server_setup) as channel:
            stub = make_client_stub(channel)
            for dur in (0.31, 0.87):  # both pad to the 1.0 s bucket
                audio = (np.random.RandomState(1).randn(int(sr * dur)) * 2000
                         ).astype(np.int16)
                resp = stub(pb2.RecognizeRequest(
                    config=pb2.RecognitionConfig(
                        encoding=pb2.RecognitionConfig.LINEAR16,
                        sample_rate_hertz=sr, audio_channel_count=1),
                    audio=pb2.RecognitionAudio(content=audio.tobytes())),
                    timeout=120)
                assert len(resp.results) == 1
                for alt in resp.results[0].alternatives:
                    for w in alt.words:
                        end = w.end_time.seconds + w.end_time.nanos / 1e9
                        assert end <= dur + 0.15, (dur, end)


class TestServeBeamDecoder:
    def test_recognize_with_device_beam(self, server_setup_beam):
        """--decoder BeamSearchDecoderDevice serves beam hypotheses (the
        reference's serve CLI decodes greedily only, serve_google_api.py:32)."""
        import grpc
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import make_client_stub

        rng = np.random.RandomState(2)
        pcm = (0.1 * rng.randn(8000) * 32767).astype('<i2').tobytes()
        request = pb2.RecognizeRequest()
        request.config.encoding = pb2.RecognitionConfig.LINEAR16
        request.config.sample_rate_hertz = 8000
        request.config.audio_channel_count = 1
        request.audio.content = pcm
        with grpc.insecure_channel(server_setup_beam) as channel:
            stub = make_client_stub(channel)
            response = stub(request, timeout=300)
        assert len(response.results) == 1
        assert isinstance(response.results[0].alternatives[0].transcript, str)


@pytest.fixture(scope='module')
def server_setup_beam(tmp_path_factory):
    import argparse
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend
    from convasr_tpu.models.zoo import create_model
    from convasr_tpu.decode.generators import GreedyCTCGenerator
    from convasr_tpu.decode.factory import build_decoder
    from convasr_tpu.serve.grpc_google_api import SpeechServicer, make_server
    from convasr_tpu.text import ProcessingPipeline

    config = ProcessingPipeline.load_config(str(ROOT / 'configs' / 'ru_text_config.json'))
    pipeline = ProcessingPipeline.make(config, 'char_legacy')
    sr = 8000
    frontend = LogFilterBankFrontend(out_channels=16, sample_rate=sr,
                                     window_size=0.02, window_stride=0.01, dither=0.0)
    model = create_model('JasperNetSmall', num_input_features=16,
                         num_classes=(pipeline.tokenizer.vocab_size,),
                         frontend=frontend, base_width=8)
    x0 = jnp.zeros((1, sr), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, xlen=jnp.ones((1,), jnp.float32))

    def forward(x, xlen):
        out = model.apply(variables, x, xlen=xlen)
        return out['log_probs'][0], out['logits'][0], out['olen'][0]

    beam_args = argparse.Namespace(decoder='BeamSearchDecoderDevice', lm=None,
                                   beam_width=4, beam_cutoff_top_n=8,
                                   beam_alpha=0.0, beam_beta=0.0, decoder_topk=1)
    decoder = build_decoder(beam_args, pipeline.tokenizer)
    servicer = SpeechServicer(pipeline, frontend, forward, GreedyCTCGenerator(),
                              decoder=decoder)
    server = make_server(servicer, '127.0.0.1:50153', num_workers=2)
    server.start()
    yield '127.0.0.1:50153'
    server.stop(0)


class TestDynamicBatching:
    def test_concurrent_requests_share_dispatches(self, server_batching):
        """N concurrent Recognize calls coalesce into fewer padded device
        dispatches (serve/batching.py), with per-request results identical to
        the unbatched fused path."""
        import concurrent.futures
        import grpc
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import make_client_stub
        endpoint, batcher, expected = server_batching

        def call(seed):
            rng = np.random.RandomState(seed)
            pcm = (0.1 * rng.randn(8000) * 32767).astype('<i2').tobytes()
            request = pb2.RecognizeRequest()
            request.config.encoding = pb2.RecognitionConfig.LINEAR16
            request.config.sample_rate_hertz = 8000
            request.config.audio_channel_count = 1
            request.audio.content = pcm
            with grpc.insecure_channel(endpoint) as channel:
                return make_client_stub(channel)(request, timeout=300)

        call(0)  # warm the compiled (max_batch, T) program
        warm_dispatches = batcher.dispatches
        with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
            responses = list(ex.map(call, range(6)))
        for seed, resp in enumerate(responses):
            assert resp.results[0].alternatives[0].transcript == expected(seed)
        burst = batcher.dispatches - warm_dispatches
        assert batcher.served >= 7
        assert burst < 6, f'6 concurrent requests took {burst} dispatches'


@pytest.fixture(scope='module')
def server_batching(tmp_path_factory):
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend
    from convasr_tpu.models.zoo import create_model
    from convasr_tpu.decode.generators import GreedyCTCGenerator
    from convasr_tpu.serve.batching import DynamicBatcher
    from convasr_tpu.serve.grpc_google_api import SpeechServicer, make_server
    from convasr_tpu.text import ProcessingPipeline
    from convasr_tpu.data import transcripts as T

    config = ProcessingPipeline.load_config(str(ROOT / 'configs' / 'ru_text_config.json'))
    pipeline = ProcessingPipeline.make(config, 'char_legacy')
    sr = 8000
    frontend = LogFilterBankFrontend(out_channels=16, sample_rate=sr,
                                     window_size=0.02, window_stride=0.01, dither=0.0)
    model = create_model('JasperNetSmall', num_input_features=16,
                         num_classes=(pipeline.tokenizer.vocab_size,),
                         frontend=frontend, base_width=8)
    x0 = jnp.zeros((1, sr), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, xlen=jnp.ones((1,), jnp.float32))

    def forward(x, xlen):
        out = model.apply(variables, x, xlen=xlen)
        return out['log_probs'][0], out['logits'][0], out['olen'][0]

    @jax.jit
    def fused(x, xlen):
        out = model.apply(variables, x, xlen=xlen)
        lp = out['log_probs'][0]
        return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                          jnp.max(lp, -1).astype(jnp.float32)], -1)

    forward.fused = fused
    batcher = DynamicBatcher(fused, max_batch=8, max_wait_ms=300.0)
    generator = GreedyCTCGenerator()
    servicer = SpeechServicer(pipeline, frontend, forward, generator,
                              decoder=None, batcher=batcher)
    server = make_server(servicer, '127.0.0.1:50155', num_workers=8)
    server.start()

    def expected(seed):
        # ground truth via the unbatched fused path
        rng = np.random.RandomState(seed)
        sig = (0.1 * rng.randn(8000) * 32767).astype('<i2').astype(np.float32) / 32768.0
        packed = np.asarray(fused(jnp.asarray(sig[None, :]),
                                  jnp.ones((1,), jnp.float32)))
        idx = packed[..., 0].astype(np.int64)
        n = packed.shape[1]
        ts = 1.0 * np.linspace(0, 1, n)[None, :]
        [alts] = generator.generate(tokenizer=pipeline.tokenizer, log_probs=None,
                                    begin=np.zeros(1), end=np.asarray([1.0]),
                                    output_lengths=np.asarray([n]), time_stamps=ts,
                                    segment_text_key='hyp', most_probable_idx=idx)
        return T.join(hyp=T.map_text(pipeline.postprocess, hyp=alts[0]))

    yield '127.0.0.1:50155', batcher, expected
    server.stop(0)



class TestInt16Ingest:
    def test_i16_fast_path_matches_f32(self, tmp_path):
        """The int16 on-device-scale ingest (fused_i16; /32767 == audio/io.py
        SMAX) must transcribe identically to the host-converted f32 path."""
        from convasr_tpu.frontend.logmel import LogFilterBankFrontend
        from convasr_tpu.models.zoo import create_model
        from convasr_tpu.decode.generators import GreedyCTCGenerator
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import SpeechServicer
        from convasr_tpu.text import ProcessingPipeline

        config = ProcessingPipeline.load_config(str(ROOT / 'configs' / 'ru_text_config.json'))
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

        def packed_of(out):
            lp = out['log_probs'][0]
            return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                              jnp.max(lp, -1).astype(jnp.float32)], -1)

        def forward(x, xlen):
            out = model.apply(variables, x, xlen=xlen)
            return out['log_probs'][0], out['logits'][0], out['olen'][0]

        # variables as jit ARGUMENTS, not closure constants (CLAUDE.md rule)
        _fused = jax.jit(lambda v, x, xlen: packed_of(model.apply(v, x, xlen=xlen)))
        _fused_i16 = jax.jit(lambda v, xi, xlen: packed_of(model.apply(
            v, xi.astype(jnp.float32) / jnp.float32(32767.0), xlen=xlen)))
        forward.fused = lambda x, xlen: _fused(variables, x, xlen)
        fused_i16 = lambda xi, xlen: _fused_i16(variables, xi, xlen)

        rng = np.random.RandomState(5)
        pcm = (0.3 * rng.randn(sr) * 32767).astype('<i2').tobytes()
        request = pb2.RecognizeRequest()
        request.config.encoding = pb2.RecognitionConfig.LINEAR16
        request.config.sample_rate_hertz = sr
        request.config.audio_channel_count = 1
        request.audio.content = pcm

        gen = GreedyCTCGenerator()
        f32_servicer = SpeechServicer(pipeline, frontend, forward, gen)
        resp_f32 = f32_servicer.Recognize(request)
        forward.fused_i16 = fused_i16
        i16_servicer = SpeechServicer(pipeline, frontend, forward, gen)
        resp_i16 = i16_servicer.Recognize(request)
        assert resp_i16.results[0].alternatives[0].transcript == \
            resp_f32.results[0].alternatives[0].transcript

    def test_resampled_request_rides_the_int16_batcher(self, tmp_path):
        """A request needing resample (16 kHz -> 8 kHz model) must be
        re-quantized to int16 after read_audio and coalesce through the SAME
        int16 DynamicBatcher as direct requests (regression: such requests
        silently bypassed batching; and an int16 row through a float32
        batcher would reach the model unscaled)."""
        from convasr_tpu.frontend.logmel import LogFilterBankFrontend
        from convasr_tpu.models.zoo import create_model
        from convasr_tpu.decode.generators import GreedyCTCGenerator
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.batching import DynamicBatcher
        from convasr_tpu.serve.grpc_google_api import SpeechServicer
        from convasr_tpu.text import ProcessingPipeline

        config = ProcessingPipeline.load_config(str(ROOT / 'configs' / 'ru_text_config.json'))
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

        def packed_of(out):
            lp = out['log_probs'][0]
            return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                              jnp.max(lp, -1).astype(jnp.float32)], -1)

        _fused_i16 = jax.jit(lambda v, xi, xlen: packed_of(model.apply(
            v, xi.astype(jnp.float32) / jnp.float32(32767.0), xlen=xlen)))

        def forward(x, xlen):
            out = model.apply(variables, x, xlen=xlen)
            return out['log_probs'][0], out['logits'][0], out['olen'][0]
        forward.fused_i16 = lambda xi, xlen: _fused_i16(variables, xi, xlen)

        batcher = DynamicBatcher(forward.fused_i16, max_batch=2,
                                 max_wait_ms=2, dtype=np.int16)
        servicer = SpeechServicer(pipeline, frontend, forward,
                                  GreedyCTCGenerator(), batcher=batcher)

        rng = np.random.RandomState(7)
        request = pb2.RecognizeRequest()
        request.config.encoding = pb2.RecognitionConfig.LINEAR16
        request.config.sample_rate_hertz = 16000       # needs resample
        request.config.audio_channel_count = 1
        request.audio.content = (0.3 * rng.randn(16000) * 32767) \
            .astype('<i2').tobytes()
        resp = servicer.Recognize(request)
        assert resp.results
        assert batcher.dispatches >= 1, \
            'resampled request did not go through the batcher'

        # float32 batcher + int16-capable forward: dtype-mismatch guard must
        # keep int16 rows OUT of the float batcher (they would be unscaled)
        f32_batcher = DynamicBatcher(lambda x, xl: np.zeros((1, 4, 2)),
                                     max_batch=2, max_wait_ms=2)
        servicer2 = SpeechServicer(pipeline, frontend, forward,
                                   GreedyCTCGenerator(), batcher=f32_batcher)
        resp2 = servicer2.Recognize(request)
        assert resp2.results
        assert f32_batcher.dispatches == 0, \
            'int16 row went through the float32 batcher (unscaled audio)'


def _itu_ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """Independent ITU-T G.711 mu-law COMPRESSOR (test oracle for the
    in-repo 256-entry expand LUT): classic bias-0x84 segment search."""
    out = np.empty(len(samples), np.uint8)
    for i, s in enumerate(np.asarray(samples, np.int32)):
        sign = 0x80 if s < 0 else 0
        s = min(abs(s), 32635) + 0x84
        exponent = 7
        mask = 0x4000
        while exponent > 0 and not (s & mask):
            exponent -= 1
            mask >>= 1
        mantissa = (s >> (exponent + 3)) & 0x0F
        out[i] = ~(sign | (exponent << 4) | mantissa) & 0xFF
    return out


class TestMulawIngest:
    """G.711 MULAW request encoding (cloud_speech.proto AudioEncoding.MULAW;
    telephony audio arrives mu-law-compressed — the reference family targets
    8 kHz phone-call corpora)."""

    def test_ulaw_lut_roundtrips_all_bytes(self):
        from convasr_tpu.audio.io import ulaw_to_int16
        all_bytes = np.arange(256, dtype=np.uint8)
        decoded = ulaw_to_int16(all_bytes.tobytes())
        assert decoded.dtype == np.int16
        # ITU spot values: 0x00/0x80 are the +-full-scale codes (32124),
        # 0xFF/0x7F both decode to 0 (+0 and -0)
        assert decoded[0x00] == -32124 and decoded[0x80] == 32124
        assert decoded[0xFF] == 0 and decoded[0x7F] == 0
        # compress(expand(byte)) == byte for every code except 0x7F, whose
        # -0 re-encodes as +0 = 0xFF
        reenc = _itu_ulaw_encode(decoded)
        ok = reenc == all_bytes
        assert ok.sum() == 255 and not ok[0x7F] and reenc[0x7F] == 0xFF
        # expansion is monotonic in signal value over the byte ordering
        # 0x00..0x7F (descending negatives), 0xFF..0x80 (ascending positives)
        assert (np.diff(decoded[:0x80]) > 0).all()
        assert (np.diff(decoded[0xFF:0x7F:-1]) > 0).all()

    def test_unary_mulaw_matches_linear16(self, server_setup):
        """A MULAW request must transcribe EXACTLY like a LINEAR16 request
        carrying the LUT-expanded samples (the server decodes to the same
        int16 before the model)."""
        import grpc
        from convasr_tpu.audio.io import ulaw_to_int16
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import make_client_stub
        rng = np.random.RandomState(11)
        ulaw = _itu_ulaw_encode(
            (0.3 * rng.randn(8000) * 32767).astype(np.int16))
        pcm = ulaw_to_int16(ulaw.tobytes()).astype('<i2').tobytes()

        def req(encoding, content):
            return pb2.RecognizeRequest(
                config=pb2.RecognitionConfig(
                    encoding=encoding, sample_rate_hertz=8000,
                    audio_channel_count=1),
                audio=pb2.RecognitionAudio(content=content))

        with grpc.insecure_channel(server_setup) as channel:
            stub = make_client_stub(channel)
            r_mulaw = stub(req(pb2.RecognitionConfig.MULAW, ulaw.tobytes()),
                           timeout=120)
            r_pcm = stub(req(pb2.RecognitionConfig.LINEAR16, pcm),
                         timeout=120)
        assert r_mulaw.results[0].alternatives[0].transcript == \
            r_pcm.results[0].alternatives[0].transcript

    def test_streaming_mulaw_matches_linear16(self):
        """StreamingRecognize with MULAW chunks == LINEAR16 chunks carrying
        the expanded samples (servicer called directly; fake fused forward)."""
        import types
        from convasr_tpu.audio.io import ulaw_to_int16
        from convasr_tpu.decode.generators import GreedyCTCGenerator
        from convasr_tpu.serve import cloud_speech_pb2 as pb2
        from convasr_tpu.serve.grpc_google_api import SpeechServicer
        from convasr_tpu.text import ProcessingPipeline
        config = ProcessingPipeline.load_config(
            str(ROOT / 'configs' / 'ru_text_config.json'))
        pipeline = ProcessingPipeline.make(config, 'char_legacy')
        vocab = pipeline.tokenizer.vocab_size
        sr = 8000

        def fused(x, xlen):
            # emit a token whose id depends on the audio content, so a wrong
            # decode (e.g. mu-law bytes read as PCM) changes the transcript
            x = np.asarray(x)
            frames = max(x.shape[-1] // 80, 1)
            packed = np.zeros((x.shape[0], frames, 2), np.float32)
            packed[..., 0] = vocab - 1
            tok = 1 + int(np.abs(x).sum() * 1e3) % 8
            packed[:, : frames // 2, 0] = tok
            return packed

        def forward(x, xlen):
            raise AssertionError('streaming path must use forward.fused')
        forward.fused = fused
        servicer = SpeechServicer(
            pipeline, types.SimpleNamespace(sample_rate=sr), forward,
            GreedyCTCGenerator())

        rng = np.random.RandomState(12)
        ulaw = _itu_ulaw_encode(
            (0.3 * rng.randn(sr) * 32767).astype(np.int16))
        pcm = ulaw_to_int16(ulaw.tobytes()).astype('<i2').tobytes()

        def run(encoding, payload):
            reqs = [pb2.StreamingRecognizeRequest(
                streaming_config=pb2.StreamingRecognitionConfig(
                    config=pb2.RecognitionConfig(
                        encoding=encoding, sample_rate_hertz=sr,
                        audio_channel_count=1),
                    interim_results=True))]
            step = len(ulaw) // 4
            for k in range(0, len(ulaw), step):
                lo, hi = k, min(k + step, len(ulaw))
                chunk = (payload[lo:hi] if encoding ==
                         pb2.RecognitionConfig.MULAW else payload[2 * lo:2 * hi])
                reqs.append(pb2.StreamingRecognizeRequest(audio_content=chunk))
            texts = []
            for resp in servicer.StreamingRecognize(iter(reqs)):
                texts += [r.alternatives[0].transcript for r in resp.results
                          if r.is_final]
            return texts

        assert run(pb2.RecognitionConfig.MULAW, ulaw.tobytes()) == \
            run(pb2.RecognitionConfig.LINEAR16, pcm)


class TestServeWarmup:
    """--warmup-sec: every bucket program compiles BEFORE the first request
    (cold per-shape compile/install through the tunnel measured 30 s-20 min;
    warmup moves it to startup)."""

    def _pipeline(self):
        from convasr_tpu.text import ProcessingPipeline
        config = ProcessingPipeline.load_config(
            str(ROOT / 'configs' / 'ru_text_config.json'))
        return ProcessingPipeline.make(config, 'char_legacy')

    def _fake_forward(self, vocab, calls):
        """Stand-in forward: all-blank log-probs, records dispatch shapes."""
        def forward(x, xlen):
            calls.append(tuple(np.asarray(x).shape))
            frames = max(int(np.asarray(x).shape[-1]) // 80, 1)
            lp = np.full((1, frames, vocab), -20.0, np.float32)
            lp[..., vocab - 1] = 0.0  # blank is the LAST class
            return lp, lp, np.asarray([frames])
        return forward

    def test_warmup_compiles_each_bucket(self):
        import types
        from convasr_tpu.decode.generators import GreedyCTCGenerator
        from convasr_tpu.serve.grpc_google_api import SpeechServicer
        pipeline = self._pipeline()
        vocab = pipeline.tokenizer.vocab_size
        calls = []
        frontend = types.SimpleNamespace(sample_rate=8000)
        servicer = SpeechServicer(pipeline, frontend,
                                  self._fake_forward(vocab, calls),
                                  GreedyCTCGenerator(), bucket_sec=1.0)
        servicer.warmup(3.0, log=lambda *a, **k: None)
        # one dispatch per bucket shape, ascending
        assert [c[-1] for c in calls] == [8000, 16000, 24000]

    def test_warmup_streaming_engine_frees_slots(self):
        import types
        from convasr_tpu.decode.generators import GreedyCTCGenerator
        from convasr_tpu.serve.grpc_google_api import SpeechServicer
        from convasr_tpu.serve.streaming_batch import BatchedStreamingEngine
        pipeline = self._pipeline()
        vocab = pipeline.tokenizer.vocab_size
        calls = []
        forward = self._fake_forward(vocab, calls)

        def fused_batch(x, xlen):
            x = np.asarray(x)
            frames = max(x.shape[-1] // 80, 1)
            packed = np.zeros((x.shape[0], frames, 2), np.float32)
            packed[..., 0] = vocab - 1  # all-blank
            return packed
        forward.fused = fused_batch
        sr = 8000
        engine = BatchedStreamingEngine(fused_batch, sr, n_slots=2,
                                        window_sec=1.0, chunk_sec=0.25)
        frontend = types.SimpleNamespace(sample_rate=sr)
        servicer = SpeechServicer(pipeline, frontend, forward,
                                  GreedyCTCGenerator(), bucket_sec=1.0,
                                  stream_engine=engine)
        servicer.warmup(1.0, streaming=True, streaming_chunk_sec=0.25,
                        log=lambda *a, **k: None)
        # the engine ticked (fused tick program exercised) and the warmup
        # session gave its ring slot back
        assert engine.ticks > 0
        assert sorted(engine._free) == [0, 1]
        assert not engine.sessions
