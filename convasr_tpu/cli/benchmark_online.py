"""Online (latency) benchmark: random request schedule -> latency percentiles.

Behavior spec: /root/reference/benchmark_online.py:59-161 — warmup, uniform
random arrival schedule over the benchmark duration, sleep-until-request loop,
mean/p50/p90/p95/p99/max latency + idle-time fraction. Reference published
numbers for JasperNetBig B=1 T=6s @ 8kHz: fp16 mean 33.6 ms / ONNX 22.7 ms
(benchmark_online.py:13-42) — the numbers to beat on TPU.
"""
import argparse
import time

import numpy as np


def main(args):
    from ..infra.utils import enable_compilation_cache, select_device
    select_device(getattr(args, 'device', None))
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from ..frontend.logmel import LogFilterBankFrontend
    from ..models.zoo import create_model

    payload, ckpt_args = (None, {})
    if args.checkpoint:
        # real weights + hyper-params from the checkpoint args
        # (reference --checkpoint, benchmark_online.py:46,64)
        from .transcribe import load_any_checkpoint
        payload, ckpt_args = load_any_checkpoint(args.checkpoint)
        args.model = ckpt_args.get('model', args.model)
        for key in ['sample_rate', 'window_size', 'window_stride',
                    'num_input_features']:
            if ckpt_args.get(key) is not None:
                setattr(args, key, ckpt_args[key])

    frontend = LogFilterBankFrontend(
        out_channels=args.num_input_features, sample_rate=args.sample_rate,
        window_size=args.window_size, window_stride=args.window_stride, dither=0.0)
    from ..models.jasper import JasperNet
    model_fields = {f.name for f in JasperNet.__dataclass_fields__.values()} \
        - {'num_input_features', 'num_classes', 'frontend', 'dtype',
           'bn_axis_name', 'decoder_type', 'spec_augment'}
    overrides = {k: v for k, v in ckpt_args.items()
                 if k in model_fields and v is not None}
    if args.base_width:
        overrides['base_width'] = args.base_width
    model = create_model(args.model, num_input_features=args.num_input_features,
                         num_classes=(args.num_classes,), frontend=frontend,
                         dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                         **overrides)

    T = int(round(args.T * args.sample_rate / 128) * 128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.B, T).astype(np.float32) * 0.1)
    xlen = jnp.ones((args.B,), jnp.float32)
    if payload and payload.get('params'):
        variables = {'params': payload['params'],
                     'batch_stats': payload.get('batch_stats', {})}
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, xlen)

    if args.input_dtype == 'int16':
        # serving-realistic ingest: LINEAR16 stays int16 across the host->
        # device link, /32767 on device (see serve fused_i16; measured B=1
        # T=6s dispatch 51 -> 38 ms through the tunnel)
        x = jnp.asarray((np.clip(np.asarray(x), -1.0, 1.0) * 32767.0)
                        .round().astype(np.int16))

    if args.quantize == 'int8':
        # serve the int8 PTQ graph (models/quantized.py, MXU 394-TOPS path);
        # latency-wise this halves the compute share of the request so the
        # mean approaches the bare tunnel dispatch+fetch floor. Calibration
        # runs on the synthetic request distribution — scales do not affect
        # timing, and the unary benchmark decodes nothing.
        assert not args.onnx, '--quantize is for the live model path'
        from ..models.quantized import quantize_cached, quantized_apply
        calib = dict(x=np.asarray(rng.randn(args.B, T), np.float32) * 0.1,
                     xlen=np.ones((args.B,), np.float32))
        variables = jax.device_put(quantize_cached(
            model, variables, [calib],
            percentile=args.calibration_percentile,
            cache_path=args.calibration_cache))
        apply_fn = lambda v, x, xlen: \
            quantized_apply(model, v, x, xlen=xlen)['log_probs'][0]
    else:
        apply_fn = lambda v, x, xlen: model.apply(v, x, xlen=xlen)['log_probs'][0]

    if args.onnx:
        assert args.input_dtype == 'float32', \
            'StableHLO artifacts have a float32 input signature'
        # serve a serialized StableHLO artifact (reference: ONNX Runtime
        # io_binding path, benchmark_online.py:64-86); the artifact has a
        # fixed input signature — build the request batch to match it
        from jax import export as jax_export
        with open(args.onnx, 'rb') as f:
            exported = jax_export.deserialize(bytearray(f.read()))
        import os
        if os.path.exists(args.onnx + '.qtree.npz'):
            # int8 PTQ artifact (cli/export.py --quantize int8): its first
            # argument is the quantized-weights tree from the sidecar
            from ..models.quantized import load_qtree
            print('loading int8 qtree sidecar', args.onnx + '.qtree.npz')
            variables = jax.device_put(load_qtree(args.onnx + '.qtree.npz'))
        B_exp, T_exp = exported.in_avals[-2].shape
        if (args.B, x.shape[1]) != (B_exp, T_exp):
            print(f'artifact expects batch [{B_exp}, {T_exp}]; padding requests')
            x = jnp.asarray(rng.randn(B_exp, T_exp).astype(np.float32) * 0.1)
            xlen = jnp.ones((B_exp,), jnp.float32)
        fwd = lambda v, x, xlen: exported.call(v, x, xlen)[0]
    elif args.fused_decode:
        # greedy decode ON DEVICE, packed into ONE small output buffer
        # (argmax idx + per-frame max log-prob): a (T', 2) fetch instead of
        # the (T', C) posterior matrix. On the tunneled axon platform each
        # fetched buffer is a roundtrip, so one packed buffer is strictly
        # better than separate idx/confidence outputs (measured: 31 vs 55 ms).
        def fused(v, x, xlen):
            if x.dtype == jnp.int16:
                x = x.astype(jnp.float32) / jnp.float32(32767.0)
            lp = apply_fn(v, x, xlen)
            return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                              jnp.max(lp, -1).astype(jnp.float32)], -1)  # (B, T', 2)
        fwd = jax.jit(fused)
    else:
        def plain(v, x, xlen):
            if x.dtype == jnp.int16:
                x = x.astype(jnp.float32) / jnp.float32(32767.0)
            return apply_fn(v, x, xlen)
        fwd = jax.jit(plain)

    if args.streaming:
        return benchmark_streaming(args, model, variables, apply_fn)

    dec_choice = getattr(args, 'decoder', 'GreedyDecoder') or 'GreedyDecoder'
    if dec_choice != 'GreedyDecoder':
        # VERDICT r4 #6: online latency for the ACCURATE decoders — what a
        # serving operator pays per request with beam/hybrid decoding instead
        # of the fused greedy fetch. Every rung includes the full end-to-end
        # cost: dispatch, fetch, host decode/rescore.
        assert not args.onnx, '--decoder needs the live model path'
        from ..text import ProcessingPipeline
        text_config = ProcessingPipeline.load_config(args.text_config)
        tokenizer = ProcessingPipeline.make(
            text_config, args.text_pipelines[0]).tokenizer
        assert tokenizer.vocab_size == args.num_classes, \
            (tokenizer.vocab_size, args.num_classes)
        blank_id = tokenizer.eps_id

        if dec_choice in ('BeamSearchDecoderDevice', 'BeamSearchDecoderDeviceLM'):
            # forward + device beam FUSED into ONE program (jit-of-jit
            # inlines beam_search_device): a request pays a single tunnel
            # dispatch and fetches only the compact (B, K, L) uint8 token
            # buffer + lengths + scores, never the (B, T', C) posteriors
            from ..ops.beam_device import beam_search_device
            device_lm = None
            if args.lm and dec_choice == 'BeamSearchDecoderDevice':
                from ..decode.beam import char_lm_table, load_lm
                device_lm = jnp.asarray(char_lm_table(
                    load_lm(args.lm), [str(l) for l in tokenizer.vocab]))

            def fused_beam(v, x, xlen):
                if x.dtype == jnp.int16:
                    x = x.astype(jnp.float32) / jnp.float32(32767.0)
                lp = apply_fn(v, x, xlen)
                B_, Tp = lp.shape[0], lp.shape[1]
                lens = jnp.full((B_,), Tp, jnp.int32)
                return beam_search_device(
                    lp, lens, blank_id, beam_width=args.beam_width,
                    cutoff_top_n=args.beam_cutoff_top_n,
                    max_len=args.beam_max_len or (Tp + 1),
                    lm_table=device_lm, lm_alpha=args.beam_alpha,
                    lm_beta=args.beam_beta, compact_tokens=True)

            beam_fwd = jax.jit(fused_beam)
            wlm, labels = None, None
            if dec_choice == 'BeamSearchDecoderDeviceLM':
                # hybrid: device beam top-K + host word-LM rescoring of
                # complete hypotheses (decode/beam.decode_device_with_lm
                # semantics, native C++ rescore over the mmap'd LM)
                assert args.lm, 'BeamSearchDecoderDeviceLM needs --lm'
                from ..decode.beam import load_lm, rescore_with_lm
                wlm = load_lm(args.lm)
                labels = [str(l).lower() for l in tokenizer.vocab]
                _rescore = rescore_with_lm

            def serve_once():
                tokens, lens, scores = beam_fwd(variables, x, xlen)
                tokens, lens, scores = map(np.asarray, (tokens, lens, scores))
                if wlm is None:
                    return [tokens[b, 0, :lens[b, 0]].tolist()
                            for b in range(len(tokens))]
                return [_rescore([(tokens[b, k, :lens[b, k]].tolist(),
                                   float(scores[b, k]))
                                  for k in range(tokens.shape[1])],
                                 labels, wlm, args.beam_alpha,
                                 args.beam_beta)[0][0]
                        for b in range(len(tokens))]
        else:
            assert dec_choice == 'BeamSearchDecoder', dec_choice
            # host C++ trie beam (+ word-LM fusion/rescore): fetch the full
            # (B, T', C) posteriors, decode on host — the latency price of
            # keeping the search off the accelerator
            from ..decode.beam import BeamSearchDecoder
            host_dec = BeamSearchDecoder(
                tokenizer, lm_path=args.lm, beam_width=args.beam_width,
                beam_alpha=args.beam_alpha, beam_beta=args.beam_beta,
                cutoff_top_n=args.beam_cutoff_top_n,
                rescore=args.beam_rescore)

            def plain_lp(v, x, xlen):
                if x.dtype == jnp.int16:
                    x = x.astype(jnp.float32) / jnp.float32(32767.0)
                return apply_fn(v, x, xlen)

            lp_fwd = jax.jit(plain_lp)

            def serve_once():
                lp = np.asarray(lp_fwd(variables, x, xlen))
                return host_dec.decode(lp)
    else:
        def serve_once():
            # host fetch = the end-to-end cost a serving process pays
            return np.asarray(fwd(variables, x, xlen))

    print(f'warming up {args.warmup_iterations} iterations...')
    for _ in range(args.warmup_iterations):
        serve_once()

    n_requests = int(round(args.benchmark_duration * args.rps))
    schedule = np.sort(rng.rand(n_requests)) * args.benchmark_duration + time.perf_counter()
    print(f'{args.benchmark_duration}s benchmark, {n_requests} requests, '
          f'rps {args.rps:.1f}')

    latencies, idle = [], 0.0
    slow_warned = False
    if args.concurrency > 1:
        # concurrent-load mode (beyond the reference's sequential loop):
        # requests issued from a thread pool at their scheduled times, the
        # DynamicBatcher coalescing whatever is in flight into one padded
        # dispatch — the serving configuration of serve --batch-window-ms
        import concurrent.futures
        from ..serve.batching import DynamicBatcher
        assert not args.onnx, '--concurrency needs the live model path'
        if dec_choice in ('BeamSearchDecoderDevice', 'BeamSearchDecoderDeviceLM'):
            # the device beam is vmapped over the batch — B concurrent
            # requests cost ONE fused forward+beam dispatch, so batching
            # multiplies the accurate decoder's sustainable rps by ~B just
            # like the greedy path (host rescore stays per-request, ~0.2 ms)
            batch_fn = lambda xb, xlb: beam_fwd(variables, xb, xlb)  # noqa: E731
        else:
            assert args.fused_decode and dec_choice == 'GreedyDecoder', \
                '--concurrency supports greedy (fused) and device-beam decoders'
            batch_fn = lambda xb, xlb: fwd(variables, xb, xlb)  # noqa: E731
        batcher = DynamicBatcher(batch_fn,
                                 max_batch=args.concurrency,
                                 max_wait_ms=args.batch_window_ms,
                                 dtype=np.int16 if args.input_dtype == 'int16'
                                 else np.float32)
        x_row = np.asarray(x)[0]

        def serve_request(t_request):
            now = time.perf_counter()
            if now < t_request:
                time.sleep(t_request - now)
            out = batcher(x_row, 1.0)
            if dec_choice == 'BeamSearchDecoderDeviceLM':
                tokens, lens, scores = out
                _rescore([(tokens[0, k, :lens[0, k]].tolist(),
                           float(scores[0, k]))
                          for k in range(tokens.shape[1])],
                         labels, wlm, args.beam_alpha, args.beam_beta)
            return time.perf_counter() - t_request

        # warm the (concurrency, T) program once (first compile can take
        # 30-90 s over the tunnel), THEN restart the arrival clock — the
        # schedule must not date from before the compile
        batcher(x_row, 1.0)
        schedule = np.sort(rng.rand(n_requests)) * args.benchmark_duration \
            + time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(
                max_workers=args.concurrency * 2) as ex:
            latencies = list(ex.map(serve_request, schedule))
        print(f'dispatches: {batcher.dispatches} for {batcher.served} requests '
              f'({batcher.served / max(batcher.dispatches, 1):.2f} req/dispatch)')
    else:
        for t_request in schedule:
            now = time.perf_counter()
            if now < t_request:
                idle += t_request - now
                time.sleep(t_request - now)
            serve_once()
            toc = time.perf_counter()
            if toc > t_request + args.max_latency and not slow_warned:
                print(f"model too slow for {args.rps} rps!")
                slow_warned = True
            latencies.append(toc - t_request)

    lat = np.asarray(latencies) * 1e3
    print(f'Latency mean: {lat.mean():.1f} ms, '
          f'median: {np.percentile(lat, 50):.1f} ms, '
          f'90th: {np.percentile(lat, 90):.1f} ms, '
          f'95th: {np.percentile(lat, 95):.1f} ms, '
          f'99th: {np.percentile(lat, 99):.1f} ms, '
          f'max: {lat.max():.1f} ms | '
          f'idle fraction: {idle / args.benchmark_duration:.1%}')
    return lat


def benchmark_streaming(args, model, variables, apply_fn=None):
    """StreamingRecognize latency (VERDICT r2 #5): N concurrent real-time
    streams drive StreamingTranscriber over the fused fixed-window forward.

    Per real-time tick (one --chunk-sec audio chunk per stream) every stream
    runs one windowed forward. Reported:
      - accept latency: wall time of one chunk's forward+decode — the
        INTERIM-result latency a client observes;
      - commit latency: wall delay between the moment the audio of a FINAL
        token was spoken (its stream-clock timestamp) and the final event —
        by construction ~= lookahead + chunk + accept latency;
      - capacity: the real-time-budget share one stream consumes, i.e. how
        many such streams one chip sustains with this per-stream dispatch.
    Distinct random audio per stream/chunk — repeated-content uploads
    measure a fiction through the tunnel (CLAUDE.md)."""
    import time as _time

    import jax
    import jax.numpy as jnp
    from ..serve.streaming import StreamingTranscriber

    class _Tok:
        eps_id = args.num_classes - 1

        def decode(self, tls):
            return ['.' * len(ts) for ts in tls]

    if apply_fn is None:
        apply_fn = lambda v, x, xlen: model.apply(v, x, xlen=xlen)['log_probs'][0]

    @jax.jit
    def _fused(v, x, xlen):
        lp = apply_fn(v, x, xlen)
        return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                          jnp.max(lp, -1).astype(jnp.float32)], -1)

    def fused(x, xlen):
        return _fused(variables, x, xlen)

    # streaming beam+LM finals (VERDICT r3 #1 capacity-delta measurement):
    # beam_topk > 0 switches the tick fetch from argmax ids to top-k
    # (log-prob, id) pairs and decodes finals through the host C++ beam;
    # forced finals every --streaming-beam-force-final-sec put the host beam
    # cost inside the measured tick budget (no VAD endpoints in random audio)
    beam_dec = None
    if args.streaming_beam_topk > 0:
        from ..decode.beam import BeamSearchDecoder

        class _Vocab(_Tok):
            vocab = ['.'] * (args.num_classes - 1) + ['|']

        beam_dec = BeamSearchDecoder(
            _Vocab(), beam_width=args.streaming_beam_width,
            cutoff_top_n=min(args.streaming_beam_topk, 8),
            lm_path=args.streaming_lm,
            beam_alpha=0.5 if args.streaming_lm else 0.0)

        import functools

        @functools.partial(jax.jit, static_argnums=(3,))
        def _fused_topk(v, x, xlen, k):
            lp = apply_fn(v, x, xlen)
            vals, ids = jax.lax.top_k(lp, k)
            return jnp.stack([vals.astype(jnp.float32),
                              ids.astype(jnp.float32)], -1)

        fused_topk = lambda x, xlen, k: _fused_topk(variables, x, xlen, k)

    rng = np.random.RandomState(0)
    sr = args.sample_rate
    chunk = int(args.chunk_sec * sr)
    n_ticks = int(args.benchmark_duration / args.chunk_sec)
    audio = [np.asarray(rng.randn(n_ticks * chunk) * 0.1, np.float32)
             for _ in range(args.streams)]

    batched = args.streaming_engine == 'batched'
    if batched:
        # shared (N, W) device ring buffer, 2 dispatches/tick TOTAL
        # (serve/streaming_batch.py) vs one fused dispatch per stream
        from ..serve.streaming_batch import BatchedStreamingEngine

        # fused single-dispatch tick: ring + forward + argmax + uint8 tail
        # fetch in ONE program (1 dispatch/tick instead of 2, ~10x smaller
        # fetch); 'legacy' keeps the 2-dispatch full-window path for A/B
        provider = None
        if args.streaming_dispatch == 'fused':
            provider = lambda: (apply_fn, (lambda: variables))

        def make_engine():
            eng = BatchedStreamingEngine(
                fused, sr, n_slots=args.streams,
                window_sec=args.window_sec, chunk_sec=args.chunk_sec,
                logprobs_provider=provider,
                transport=args.streaming_transport,
                max_lookahead_sec=max(2.0, args.lookahead_sec),
                beam_topk=args.streaming_beam_topk,
                beam_interim_width=args.streaming_beam_interim)
            kw = {} if beam_dec is None else dict(
                beam_decoder=beam_dec,
                beam_force_final_sec=args.streaming_beam_force_final_sec)
            return eng, [eng.open(_Tok(), lookahead_sec=args.lookahead_sec,
                                  **kw)
                         for _ in range(args.streams)]

        engine, streams = make_engine()
        streams[0].accept(audio[0][:chunk])
        engine.tick()                       # warmup compiles the (N, W) step
        engine, streams = make_engine()     # fresh state, cached compile
    else:
        ps_kw = {} if beam_dec is None else dict(
            beam_decoder=beam_dec, forward_topk=fused_topk,
            beam_topk=args.streaming_beam_topk,
            beam_force_final_sec=args.streaming_beam_force_final_sec)

        def make_stream():
            return StreamingTranscriber(fused, _Tok(), sr,
                                        window_sec=args.window_sec,
                                        lookahead_sec=args.lookahead_sec,
                                        **ps_kw)

        streams = [make_stream() for _ in range(args.streams)]
        # warmup compiles the (1, W) program
        streams[0].accept(audio[0][:chunk])
        streams[0] = make_stream()

    accept_lat, commit_lat, tick_busy = [], [], []
    t0 = _time.perf_counter()
    for tick in range(n_ticks):
        t_tick = t0 + tick * args.chunk_sec
        now = _time.perf_counter()
        if now < t_tick:
            _time.sleep(t_tick - now)
        busy0 = _time.perf_counter()
        tick_events = []
        if batched:
            for s, st in enumerate(streams):
                st.accept(audio[s][tick * chunk:(tick + 1) * chunk])
            a0 = _time.perf_counter()
            engine.tick()
            for st in streams:
                tick_events.extend(st.drain())
            a1 = _time.perf_counter()
            accept_lat.append(a1 - a0)   # ONE shared dispatch for all streams
        else:
            for s, st in enumerate(streams):
                a0 = _time.perf_counter()
                tick_events = st.accept(audio[s][tick * chunk:(tick + 1) * chunk])
                a1 = _time.perf_counter()
                accept_lat.append(a1 - a0)
                # the tick's audio finished "being spoken" at wall time
                # t_tick + chunk_sec <= a1; final events commit tokens up to
                # e.end_time
                for e in tick_events:
                    if e.is_final:
                        commit_lat.append((a1 - t0) - e.end_time)
        if batched:
            a1 = _time.perf_counter()
            for e in tick_events:
                if e.is_final:
                    commit_lat.append((a1 - t0) - e.end_time)
        tick_busy.append(_time.perf_counter() - busy0)
        if tick_busy[-1] > args.chunk_sec and tick < 3:
            print(f'warning: tick {tick} overran the real-time budget '
                  f'({tick_busy[-1] * 1e3:.0f} > {args.chunk_sec * 1e3:.0f} ms)')

    al = np.asarray(accept_lat) * 1e3
    busy = np.asarray(tick_busy)
    share = busy.mean() / args.chunk_sec
    print(f'engine {args.streaming_engine} | streams {args.streams} | chunk '
          f'{args.chunk_sec:.2f}s | window {args.window_sec:.0f}s | '
          f'lookahead {args.lookahead_sec:.1f}s')
    kind = 'tick (all streams, interim)' if batched else 'accept (interim)'
    print(f'{kind} latency: mean {al.mean():.1f} ms, p50 '
          f'{np.percentile(al, 50):.1f}, p90 {np.percentile(al, 90):.1f}, '
          f'p99 {np.percentile(al, 99):.1f}, max {al.max():.1f}')
    if commit_lat:
        cl = np.asarray(commit_lat)
        print(f'commit (final) latency: mean {cl.mean() * 1e3:.0f} ms, p50 '
              f'{np.percentile(cl, 50) * 1e3:.0f}, p99 '
              f'{np.percentile(cl, 99) * 1e3:.0f} '
              f'(bound: lookahead {args.lookahead_sec * 1e3:.0f} '
              f'+ chunk {args.chunk_sec * 1e3:.0f} + accept)')
    print(f'real-time budget share: {share:.1%} of each {args.chunk_sec:.2f}s '
          f'tick -> ~{int(args.streams / max(share, 1e-9))} sustainable '
          f'streams/chip at this chunking')
    return al


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--device', default=None, choices=['cpu', 'tpu', 'axon'])
    parser.add_argument('--checkpoint', default=None,
                        help='benchmark real weights (orbax dir or reference .pt)')
    parser.add_argument('--fp16', nargs='?', const='O2', default=None,
                        help='compat no-op: bf16 is native (see --bf16)')
    parser.add_argument('--input-dtype', choices=['float32', 'int16'],
                        default='float32',
                        help='int16 = serving-realistic LINEAR16 upload with '
                             'on-device /32767 scale (half the bytes)')
    parser.add_argument('--concurrency', type=int, default=1,
                        help='>1: issue requests from a thread pool and '
                             'coalesce in-flight ones via DynamicBatcher '
                             '(the serve --batch-window-ms configuration)')
    parser.add_argument('--batch-window-ms', type=float, default=5.0,
                        help='batching window for --concurrency mode')
    parser.add_argument('--stft-mode', choices=['conv', ''], default='conv',
                        help='compat: the STFT is always a DFT-basis conv')
    parser.add_argument('--text-config', default='configs/ru_text_config.json',
                        help='compat: unused (synthetic inputs, no decoding)')
    parser.add_argument('--text-pipelines', nargs='+', default=['char_legacy'],
                        help='compat: unused (synthetic inputs, no decoding)')
    parser.add_argument('--onnx', default=None,
                        help='benchmark a StableHLO export artifact instead '
                             'of the live model (reference benchmarks ONNX '
                             'Runtime here, benchmark_online.py:64-86)')
    parser.add_argument('--model', default='JasperNetBig')
    parser.add_argument('--base-width', type=int, default=None,
                        help='channel-width override (tiny widths for CPU '
                             'smoke runs; checkpoints carry their own)')
    parser.add_argument('--num-input-features', type=int, default=64)
    parser.add_argument('--num-classes', type=int, default=38)
    parser.add_argument('--sample-rate', type=int, default=8000)
    parser.add_argument('--window-size', type=float, default=0.02)
    parser.add_argument('--window-stride', type=float, default=0.01)
    parser.add_argument('-B', type=int, default=1)
    parser.add_argument('-T', type=float, default=6.0)
    parser.add_argument('--rps', type=float, default=5.0)
    parser.add_argument('--benchmark-duration', type=float, default=60.0)
    parser.add_argument('--max-latency', type=float, default=0.5)
    parser.add_argument('--warmup-iterations', type=int, default=10)
    parser.add_argument('--streaming', action='store_true',
                        help='benchmark StreamingRecognize latency: N '
                             'real-time streams through the fixed-window '
                             'streaming engine (serve/streaming.py)')
    parser.add_argument('--streams', type=int, default=1,
                        help='concurrent simulated streams (--streaming)')
    parser.add_argument('--streaming-engine', default='per-stream',
                        choices=['per-stream', 'batched'],
                        help='per-stream: one fused dispatch per stream per '
                             'chunk; batched: shared (N, W) device ring '
                             'buffer, 2 dispatches/tick total '
                             '(serve/streaming_batch.py)')
    parser.add_argument('--streaming-dispatch', default='fused',
                        choices=['fused', 'legacy'],
                        help='batched engine tick: fused = ONE dispatch '
                             '(ring+forward+argmax+uint8 tail fetch); '
                             'legacy = 2 dispatches + full-window fetch')
    parser.add_argument('--streaming-beam-topk', type=int, default=0,
                        help='streaming beam finals: fetch top-k (log-prob, '
                             'id) pairs per tick and decode finals through '
                             'the host C++ beam (0 = greedy finals); '
                             'measures the beam capacity delta')
    parser.add_argument('--streaming-beam-width', type=int, default=16)
    parser.add_argument('--streaming-beam-interim', type=int, default=0,
                        help='carried device-beam interim width K (batched '
                             'fused tick only; 0 = greedy interims) — '
                             'measures the capacity cost of beam-quality '
                             'interim hypotheses')
    parser.add_argument('--streaming-lm', default=None,
                        help='ARPA/CNLM for the beam-final decode (the '
                             'production config: word-LM evidence lands in '
                             'the measured final cost)')
    parser.add_argument('--streaming-beam-force-final-sec', type=float,
                        default=5.0,
                        help='force a beam final this often per stream so '
                             'the host beam cost lands inside the measured '
                             'tick budget')
    parser.add_argument('--streaming-transport', default='int16',
                        choices=['int16', 'mulaw'],
                        help='chunk bytes on the wire (fused tick): int16 '
                             'PCM or mu-law uint8 (quarter the f32 bytes)')
    parser.add_argument('--chunk-sec', type=float, default=0.32,
                        help='audio chunk per stream per tick (--streaming)')
    parser.add_argument('--window-sec', type=float, default=10.0,
                        help='fixed jit window of the streaming engine')
    parser.add_argument('--lookahead-sec', type=float, default=1.5,
                        help='interim hold-back; commit latency ~= this + '
                             'chunk + compute')
    parser.add_argument('--decoder', default='GreedyDecoder',
                        choices=['GreedyDecoder', 'BeamSearchDecoder',
                                 'BeamSearchDecoderDevice',
                                 'BeamSearchDecoderDeviceLM'],
                        help='unary latency with the ACCURATE decoders '
                             '(VERDICT r4 #6): BeamSearchDecoderDevice fuses '
                             'forward+beam into one dispatch; ...DeviceLM '
                             'adds host word-LM rescoring (hybrid); '
                             'BeamSearchDecoder is the host C++ trie beam '
                             'over fetched posteriors')
    parser.add_argument('--lm', default=None,
                        help='ARPA/CNLM path: word LM for the hybrid/host '
                             'beam, char bigram for the device beam')
    parser.add_argument('--beam-width', type=int, default=16)
    parser.add_argument('--beam-cutoff-top-n', type=int, default=8)
    parser.add_argument('--beam-alpha', type=float, default=0.5)
    parser.add_argument('--beam-beta', type=float, default=0.0)
    parser.add_argument('--beam-max-len', type=int, default=None,
                        help='device-beam hypothesis buffer cap (default '
                             "T'+1 = exact)")
    parser.add_argument('--beam-rescore', action='store_true',
                        help='host beam: acoustic-only search + word-LM '
                             'RESCORING of complete hypotheses')
    parser.add_argument('--quantize', default=None, choices=['int8'],
                        help='benchmark the int8 PTQ graph (MXU 394-TOPS '
                             'path, models/quantized.py) instead of bf16')
    parser.add_argument('--calibration-percentile', type=float, default=100.0)
    parser.add_argument('--calibration-cache', default=None,
                        help='activation-scales .npz cache (see serve): skips '
                             'the minutes-long calibration compile')
    parser.add_argument('--fused-decode', default=True,
                        type=lambda v: str(v).lower() in ('1', 'true', 'yes'),
                        help='greedy argmax on device, one packed output buffer')
    parser.add_argument('--bf16', default=True,
                        type=lambda v: str(v).lower() in ('1', 'true', 'yes'))
    return parser


if __name__ == '__main__':
    main(build_parser().parse_args())
