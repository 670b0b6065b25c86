"""Offline benchmark: synthetic-batch forward(/backward) timing + RTF.

Behavior spec: /root/reference/benchmark.py:1-221 — synthetic batch, warmup,
timed loop, RTF = B*T*iterations / fwd time, TSV append. CUDA-specific pieces
(cudnn.benchmark, nvprof hooks, fragmentation probes) are replaced by their
TPU-native counterparts: XLA compilation cache warms on the first call and
`jax.profiler` traces (--profile) produce Perfetto-compatible dumps.
"""
import argparse
import os
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
    from ..train.loop import make_optimizer_with_accum, make_train_step, \
        init_train_state
    from ..train.optim import make_optimizer

    payload, ckpt_args = (None, {})
    if args.checkpoint:
        # benchmark real weights (reference --checkpoint, benchmark.py:5,96);
        # architectural hyper-params come from the checkpoint args so the
        # weights always fit the module tree (transcribe.py:26 convention)
        from .transcribe import load_any_checkpoint
        payload, ckpt_args = load_any_checkpoint(args.checkpoint)
        args.model = ckpt_args.get('model', args.model)
        for key in ['sample_rate', 'window_size', 'window_stride',
                    'num_input_features']:
            if ckpt_args.get(key) is not None:
                setattr(args, key, ckpt_args[key])

    # --features-input benchmarks the backbone on precomputed features — the
    # reference's DEFAULT mode (benchmark.py:9-13: frontend only with
    # --frontend); our default includes the frontend (honest end-to-end cost,
    # and on TPU the DFT-conv frontend rides the MXU anyway)
    frontend = None if args.features_input else LogFilterBankFrontend(
        out_channels=args.num_input_features, sample_rate=args.sample_rate,
        window_size=args.window_size, window_stride=args.window_stride,
        window=getattr(args, 'window', 'hann_window'), dither=0.0)
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

    mult = args.input_time_dim_multiple
    T = max(mult, int(round(args.T * args.sample_rate / mult) * mult))
    example_seconds = T / args.sample_rate
    rng = np.random.RandomState(0)
    if args.features_input:
        frames = int(round(args.T / args.window_stride / mult) * mult) or mult
        x = jnp.asarray(rng.randn(args.B, frames,
                                  args.num_input_features).astype(np.float32))
    else:
        x = jnp.asarray(rng.randn(args.B, T).astype(np.float32) * 0.1)
    xlen = jnp.ones((args.B,), jnp.float32)
    print(f'batch {list(x.shape)} | audio {args.B * example_seconds:.2f} sec')

    tic = time.time()
    if payload and payload.get('params'):
        variables = {'params': payload['params'],
                     'batch_stats': payload.get('batch_stats', {})}
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, xlen)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables['params']))
    print(f'model {args.model}: {n_params / 1e6:.1f}M params, '
          f'init {time.time() - tic:.1f} sec')

    if args.data_parallel:
        # SPMD over every local device (reference --data-parallel wraps
        # torch DataParallel, benchmark.py:34,101); batch sharded on axis 0
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
        assert args.B % mesh.shape['data'] == 0, \
            f'-B must divide the {mesh.shape["data"]}-device data axis'
        batch_sharding = NamedSharding(mesh, P('data'))
        x = jax.device_put(x, batch_sharding)
        xlen = jax.device_put(xlen, batch_sharding)
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        print(f'data-parallel over {mesh.shape["data"]} devices')

    qtree = None
    if args.quantize == 'int8':
        # int8 PTQ (models/quantized.py): BN-folded weights per-channel int8,
        # activations per-tensor int8 calibrated on the benchmark batch; convs
        # run int8 x int8 -> int32 on the MXU's 394-TOPS path (2x bf16 peak)
        from ..models.quantized import quantize_cached, quantized_apply
        # a 16-row slice is plenty for absmax stats; --calibration-cache
        # skips the calibration-program compile on repeat grid runs
        calib = dict(x=np.asarray(x)[:16], xlen=np.asarray(xlen)[:16])
        tic = time.time()
        qtree = jax.device_put(quantize_cached(
            model, variables, [calib],
            cache_path=getattr(args, 'calibration_cache', None)))
        print(f'int8 PTQ calibration done in {time.time() - tic:.1f} sec')

    if args.stablehlo:
        # benchmark a serialized StableHLO artifact (the reference's
        # onnxruntime io_binding benchmark equivalent, benchmark.py:67-86)
        from jax import export as jax_export
        with open(args.stablehlo, 'rb') as f:
            exported = jax_export.deserialize(bytearray(f.read()))

        def run():
            return exported.call(variables, x, xlen)[0]
    elif args.backward:
        L = 64
        batch = dict(x=x, xlen=xlen,
                     y=jnp.asarray(rng.randint(0, args.num_classes - 1,
                                               size=(args.B, 1, L))),
                     ylen=jnp.full((args.B, 1), L))
        optimizer = make_optimizer_with_accum(make_optimizer('novograd', lambda s: 1e-2))
        state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))

        def run():
            nonlocal state
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            return metrics['loss']
    elif args.chained:
        # DEVICE-TIME measurement: all iterations inside ONE jit, each
        # feeding its full output back into the next input (no DCE), so the
        # ~26-30 ms tunnel dispatch+fetch constant is paid once, not per
        # iteration (methodology: scripts/perf_probe.py / CLAUDE.md)
        if qtree is not None:
            @jax.jit
            def chained(qt, x, xlen):
                def body(x, _):
                    lp = quantized_apply(model, qt, x, xlen=xlen)['log_probs'][0]
                    return x * (1.0 + 1e-3 * jnp.mean(lp).astype(jnp.float32)), ()
                x, _ = jax.lax.scan(body, x, None, length=args.iterations)
                return x[0, :2]

            def run():
                return chained(qtree, x, xlen)
        else:
            @jax.jit
            def chained(v, x, xlen):
                def body(x, _):
                    lp = model.apply(v, x, xlen=xlen)['log_probs'][0]
                    return x * (1.0 + 1e-3 * jnp.mean(lp).astype(jnp.float32)), ()
                x, _ = jax.lax.scan(body, x, None, length=args.iterations)
                return x[0, :2]

            def run():
                return chained(variables, x, xlen)
    elif qtree is not None:
        fwd_q = jax.jit(lambda qt, x, xlen: quantized_apply(
            model, qt, x, xlen=xlen)['log_probs'][0])

        def run():
            return fwd_q(qtree, x, xlen)
    else:
        fwd = jax.jit(lambda v, x, xlen: model.apply(v, x, xlen=xlen)['log_probs'][0])

        def run():
            return fwd(variables, x, xlen)

    def _alphabet_tokenizer():
        class _Tok:
            vocab = ['.'] * (args.num_classes - 1) + ['|']
            eps_id = args.num_classes - 1
        try:
            # real alphabet (LM lookups hit actual char strings)
            from ..text import ProcessingPipeline
            config = ProcessingPipeline.load_config(args.text_config)
            tok = ProcessingPipeline.make(config, 'char_legacy').tokenizer
            if len(tok.vocab) != args.num_classes:
                tok = _Tok()
        except Exception:
            tok = _Tok()
        return tok

    decoder = None
    decode_label = 'host beam decode'
    if args.decoder == 'BeamSearchDecoder':
        # end-to-end RTF of the accuracy-flagship configuration (VERDICT r3
        # #3): device forward + host C++ prefix beam (+ ARPA/CNLM LM,
        # decode/beam.py). The device fetch is top-k (log-prob, id) pairs —
        # the beam only ever extends cutoff_top_n candidates, so decoding a
        # densified top-k matrix equals the full-posterior decode for
        # cutoff_top_n <= k (equality proven in tests/test_streaming_beam.py)
        # while shrinking the tunnel fetch ~C/k-fold. Reference methodology:
        # benchmark.py:194-221 (RTF over the full pipeline).
        from ..decode.beam import BeamSearchDecoder
        from ..serve.streaming import BEAM_LP_FLOOR

        tok = _alphabet_tokenizer()
        decoder = BeamSearchDecoder(
            tok, lm_path=args.lm, beam_width=args.beam_width,
            beam_alpha=args.beam_alpha, beam_beta=args.beam_beta,
            cutoff_top_n=args.beam_cutoff_top_n,
            num_workers=args.decoder_workers,
            rescore=getattr(args, 'beam_rescore', False))
        K = min(max(args.beam_cutoff_top_n, 1), args.num_classes)

        if qtree is not None:
            @jax.jit
            def fwd_topk(qt, x, xlen):
                lp = quantized_apply(model, qt, x, xlen=xlen)['log_probs'][0]
                vals, ids = jax.lax.top_k(lp, K)
                return jnp.stack([vals.astype(jnp.float16),
                                  ids.astype(jnp.float16)], -1)

            def dispatch():
                return fwd_topk(qtree, x, xlen)
        else:
            @jax.jit
            def fwd_topk(v, x, xlen):
                lp = model.apply(v, x, xlen=xlen)['log_probs'][0]
                vals, ids = jax.lax.top_k(lp, K)
                return jnp.stack([vals.astype(jnp.float16),
                                  ids.astype(jnp.float16)], -1)

            def dispatch():
                return fwd_topk(variables, x, xlen)

        decode_seconds = []

        def beam_decode(dev_out):
            packed = np.asarray(dev_out, np.float32)       # (B, T', K, 2)
            vals, ids = packed[..., 0], packed[..., 1].astype(np.int64)
            dense = np.full(packed.shape[:2] + (args.num_classes,),
                            BEAM_LP_FLOOR, np.float32)
            np.put_along_axis(dense, ids, vals, axis=2)
            tic = time.perf_counter()
            out = decoder.decode(dense)
            decode_seconds.append(time.perf_counter() - tic)
            return out

    elif args.decoder == 'BeamSearchDecoderDeviceLM':
        # hybrid accuracy flagship (COMPONENTS.md row 9): the top-K prefix
        # beam runs ON DEVICE fused into the forward program (one dispatch,
        # tiny (B, K, ·) fetch), the host only rescores the K finished
        # hypotheses per utterance with the word LM — O(B·K) host work vs
        # the host beam's per-frame inner loop. Use small --beam-width
        # (e.g. 16): it is the device beam's K.
        from ..decode.beam import load_lm, rescore_with_lm
        from ..ops.beam_device import beam_search_device

        tok = _alphabet_tokenizer()
        lm = load_lm(args.lm) if args.lm else None
        labels = [str(l).lower() for l in tok.vocab]
        decode_label = 'host word-LM rescore'

        def _beam_tail(lp):
            return beam_search_device(
                lp, jnp.full((lp.shape[0],), lp.shape[1], jnp.int32),
                tok.eps_id, beam_width=args.beam_width,
                cutoff_top_n=args.beam_cutoff_top_n,
                max_len=args.beam_max_len or lp.shape[1] + 1,
                compact_tokens=True)

        if qtree is not None:
            @jax.jit
            def fwd_beam(qt, x, xlen):
                return _beam_tail(
                    quantized_apply(model, qt, x, xlen=xlen)['log_probs'][0])

            def dispatch():
                return fwd_beam(qtree, x, xlen)
        else:
            @jax.jit
            def fwd_beam(v, x, xlen):
                return _beam_tail(model.apply(v, x, xlen=xlen)['log_probs'][0])

            def dispatch():
                return fwd_beam(variables, x, xlen)

        decode_seconds = []
        decoder = 'hybrid'

        def beam_decode(dev_out):
            toks, lens, scores = (np.asarray(a) for a in dev_out)
            tic = time.perf_counter()
            out = []
            for b in range(len(toks)):
                hyps = [(toks[b, k, :lens[b, k]].tolist(),
                         float(scores[b, k])) for k in range(toks.shape[1])]
                if lm is not None:
                    hyps = rescore_with_lm(hyps, labels, lm,
                                           args.beam_alpha, args.beam_beta)
                out.append(hyps[0][0])
            decode_seconds.append(time.perf_counter() - tic)
            return out

    chained_fwd = args.chained and not args.backward and not args.stablehlo \
        and decoder is None
    print(f'warming up {args.warmup_iterations} iterations...')
    tic = time.time()
    if decoder is not None:
        beam_decode(dispatch())  # compile + beam warm in one pass
        decode_seconds.clear()
    else:
        for _ in range(1 if chained_fwd else args.warmup_iterations):
            np.asarray(run()).reshape(-1)[:1]
    print(f'warmup done in {time.time() - tic:.1f} sec')

    if args.profile:
        jax.profiler.start_trace(args.profile)

    if decoder is not None:
        # one-ahead pipeline (the transcribe CLI's shape): the device runs
        # iteration i+1 while the host beam decodes iteration i; RTF counts
        # the full wall clock, so whichever side binds shows up honestly
        tic = time.perf_counter()
        pending = dispatch()
        for _ in range(args.iterations - 1):
            nxt = dispatch()
            beam_decode(pending)
            pending = nxt
        beam_decode(pending)
        wall = time.perf_counter() - tic
        times = np.full(args.iterations, wall / args.iterations)
    elif chained_fwd:
        # one dispatch runs all iterations on device; per-iter = elapsed/iters
        tic = time.perf_counter()
        np.asarray(run()).reshape(-1)[:1]
        times = np.full(args.iterations, (time.perf_counter() - tic) / args.iterations)
    else:
        times = []
        for _ in range(args.iterations):
            tic = time.perf_counter()
            out = run()
            np.asarray(out).reshape(-1)[:1]  # host sync (tunnel-safe)
            times.append(time.perf_counter() - tic)
    if args.profile:
        jax.profiler.stop_trace()
        print(f'profile trace written to {args.profile}')

    times = np.asarray(times)
    total_audio = args.B * example_seconds * args.iterations
    rtf = total_audio / times.sum()
    kind = 'fwd+bwd' if args.backward else ('fwd-int8' if args.quantize else 'fwd')
    if decoder is not None:
        kind += ('+devbeam' if decoder == 'hybrid' else '+beam') \
            + ('+lm' if args.lm else '')
        dec = np.asarray(decode_seconds)
        workers = '' if decoder == 'hybrid' \
            else f', {args.decoder_workers} worker(s)'
        print(f'{decode_label}: mean {dec.mean() * 1e3:.1f} ms/batch '
              f'({dec.mean() * 1e3 / args.B:.2f} ms/utt{workers}) — '
              f'host-side-only RTF '
              f'{args.B * example_seconds / dec.mean():.1f}')
    print(f'{kind}: mean {times.mean() * 1e3:.2f} ms | p50 '
          f'{np.percentile(times, 50) * 1e3:.2f} | min {times.min() * 1e3:.2f}')
    print(f'RTF: {rtf:.1f} audio-sec/sec')

    if args.output_tsv:
        header = not os.path.exists(args.output_tsv)
        with open(args.output_tsv, 'a') as f:
            if header:
                f.write('model\tB\tT_sec\tkind\tmean_ms\trtf\n')
            f.write(f'{args.model}\t{args.B}\t{example_seconds:.2f}\t{kind}\t'
                    f'{times.mean() * 1e3:.2f}\t{rtf:.1f}\n')
    return rtf


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--device', default=None, choices=['cpu', 'tpu', 'axon'])
    parser.add_argument('--model', default='JasperNetBig')
    parser.add_argument('--num-input-features', type=int, default=64)
    parser.add_argument('--num-classes', type=int, default=38)
    parser.add_argument('--sample-rate', type=int, default=8000)
    parser.add_argument('--window-size', type=float, default=0.02)
    parser.add_argument('--window-stride', type=float, default=0.01)
    parser.add_argument('-B', type=int, default=64)
    parser.add_argument('-T', type=float, default=6.0, help='seconds per utterance')
    parser.add_argument('--iterations', type=int, default=20)
    parser.add_argument('--chained', default=True,
                        type=lambda v: str(v).lower() in ('1', 'true', 'yes'),
                        help='fwd: run all iterations inside one jit (device '
                             'time, tunnel dispatch paid once)')
    parser.add_argument('--warmup-iterations', '--iterations-warmup',
                        type=int, default=3)
    parser.add_argument('--checkpoint', default=None,
                        help='benchmark real weights (orbax dir or reference .pt)')
    parser.add_argument('--features-input', action='store_true',
                        help='feed precomputed log-mel features (the '
                             'reference default; frontend included otherwise)')
    parser.add_argument('--frontend', action='store_true',
                        help='compat no-op: the frontend is included unless '
                             '--features-input (reference benchmark.py:9)')
    parser.add_argument('--data-parallel', action='store_true',
                        help='shard the batch over all local devices (SPMD)')
    parser.add_argument('--input-time-dim-multiple', type=int, default=128)
    parser.add_argument('--fp16', nargs='?', const='O2', default=None,
                        help='compat no-op: bf16 is native (see --bf16)')
    parser.add_argument('--stft-mode', choices=['conv', ''], default='conv',
                        help='compat: the STFT is always a DFT-basis conv '
                             'on the MXU')
    parser.add_argument('--lang', default='ru')
    parser.add_argument('--backward', action='store_true')
    parser.add_argument('--quantize', choices=['int8'], default=None,
                        help='int8 PTQ inference (models/quantized.py): MXU '
                             'int8 path, calibrated on the benchmark batch')
    parser.add_argument('--calibration-cache', default=None,
                        help='activation-scales .npz cache (see serve): '
                             'repeat grid runs skip the calibration compile')
    parser.add_argument('--base-width', type=int, default=None,
                        help='channel-width override (tiny widths for CPU '
                             'smoke runs; checkpoints carry their own)')
    parser.add_argument('--stablehlo', '--onnx', dest='stablehlo',
                        help='benchmark a serialized StableHLO export artifact '
                             '(the reference benchmarks ONNX here)')
    parser.add_argument('--bf16', default=True,
                        type=lambda v: str(v).lower() in ('1', 'true', 'yes'))
    parser.add_argument('--profile', '--profile-autograd', dest='profile',
                        help='directory for the jax.profiler (Perfetto) trace')
    parser.add_argument('--window', default='hann_window',
                        help='frontend window function')
    parser.add_argument('--decoder', default=None,
                        choices=['BeamSearchDecoder',
                                 'BeamSearchDecoderDeviceLM'],
                        help='end-to-end RTF incl. decoding: BeamSearchDecoder'
                             ' = host C++ beam (one-ahead pipelined with the '
                             'device forward); BeamSearchDecoderDeviceLM = '
                             'on-device top-K beam fused into the forward + '
                             'host word-LM rescoring (use --beam-width ~16); '
                             'default = forward only (greedy argmax rides '
                             'the device, see transcribe --fused)')
    parser.add_argument('--lm', default=None,
                        help='ARPA(.gz)/CNLM-binary LM for --decoder')
    parser.add_argument('--beam-rescore', action='store_true',
                        help='with --decoder BeamSearchDecoder --lm: '
                             'word-LM rescoring of complete hypotheses '
                             'instead of per-frame in-beam fusion')
    parser.add_argument('--beam-max-len', type=int, default=0,
                        help='device-beam hypothesis-buffer cap (0 = T+1, '
                             'exact); speech emits ~T/10 tokens, so ~T/4 '
                             'shrinks scan HBM traffic and the fetch')
    parser.add_argument('--beam-width', type=int, default=128)
    parser.add_argument('--beam-alpha', type=float, default=0.4)
    parser.add_argument('--beam-beta', type=float, default=1.0)
    parser.add_argument('--beam-cutoff-top-n', type=int, default=8,
                        help='beam candidate cutoff; also the top-k fetched '
                             'per frame from the device')
    parser.add_argument('--decoder-workers', type=int,
                        default=max(os.cpu_count() or 1, 1),
                        help='host beam threads (C++ decode releases the GIL)')
    parser.add_argument('--text-config', default='configs/ru_text_config.json',
                        help='tokenizer alphabet for --decoder LM lookups')
    parser.add_argument('--output-tsv', '--output-path', '-o', dest='output_tsv')
    return parser


if __name__ == '__main__':
    main(build_parser().parse_args())
