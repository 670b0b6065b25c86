"""Batch/dir transcription CLI — the primary product entry point.

Behavior spec: /root/reference/transcribe.py (setup transcribe.py:23-60, main
transcribe.py:63-300, flags transcribe.py:303-358). Accepts either a
convasr_tpu orbax checkpoint directory or a reference convasr .pt checkpoint
(converted on the fly); hyper-parameters (model name, sample rate, window,
features) come from the checkpoint args, CLI can override.

Outputs per audio file: .json / .html / .txt, plus a shared transcripts.csv
and optional raw logits (.npz instead of the reference's .pt).
"""
import argparse
import functools
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..audio import io as audio_io
from ..data import transcripts
from ..data.dataset import AudioTextDataset
from ..decode.generators import GreedyCTCGenerator
from ..frontend.logmel import LogFilterBankFrontend
from ..metrics import align_strings, align_words, cer as cer_fn
from ..models.zoo import create_model
from ..ops.align_pallas import ctc_alignment_auto as ctc_alignment
from ..text import ProcessingPipeline
from ..train import checkpoints as ckpt_lib
from ..vis import report as vis


def str2bool(v):
    return str(v).lower() in ('yes', 'true', 't', '1')


def load_any_checkpoint(path: str):
    """Returns (payload{params,batch_stats}, ckpt_args: dict)."""
    if path.endswith('.pt'):
        payload, meta = ckpt_lib.load_reference_checkpoint(path)
        ckpt_args = meta.get('args', {})
        if not isinstance(ckpt_args, dict):
            ckpt_args = vars(ckpt_args)
        return payload, ckpt_args
    payload, meta = ckpt_lib.restore_checkpoint(path)
    return payload, meta.get('args', {})


def _make_dp_wrapper(mesh):
    """--data-parallel: shard the batch dim of every device call over the
    mesh 'data' axis (pod-scale inference, VERDICT r3 #2). The batch is
    zero-padded up to a multiple of the axis size (per-utterance instance
    norm + per-row convs make padding rows inert) and results sliced back.
    Spec: the reference transcribe CLI must scale like its train loop
    (transcribe.py:63-300 runs the same model DataParallel wraps,
    models.py:736-752)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    bs = NamedSharding(mesh, P('data'))
    n = mesh.shape['data']

    def wrap(fn):
        def wrapped(x, xlen, *a, **kw):
            x, xlen = np.asarray(x), np.asarray(xlen, np.float32)
            B = x.shape[0]
            Bp = -(-B // n) * n
            if Bp != B:
                x = np.concatenate(
                    [x, np.zeros((Bp - B,) + x.shape[1:], x.dtype)])
                xlen = np.concatenate([xlen, np.ones(Bp - B, np.float32)])
            out = fn(jax.device_put(jnp.asarray(x), bs),
                     jax.device_put(jnp.asarray(xlen), bs), *a, **kw)
            return jax.tree.map(lambda r: r[:B], out)
        return wrapped

    return wrap


def ckpt_model_overrides(ckpt_args: dict) -> dict:
    """Architectural hyper-params recorded in the checkpoint args (base_width,
    repeat, kernel sizes, ...) to pass back to create_model so the weights
    always fit the module tree. Shared by transcribe/serve/export."""
    from ..models.jasper import JasperNet
    model_fields = {f.name for f in JasperNet.__dataclass_fields__.values()} \
        - {'num_input_features', 'num_classes', 'frontend', 'dtype', 'bn_axis_name',
           'decoder_type', 'spec_augment'}  # spec_augment in args is the bool flag
    return {k: v for k, v in ckpt_args.items()
            if k in model_fields and v is not None}


def setup(args):
    payload, ckpt_args = load_any_checkpoint(args.checkpoint)
    for key in ['sample_rate', 'window_size', 'window_stride', 'window', 'num_input_features']:
        if ckpt_args.get(key) is not None:
            setattr(args, key, ckpt_args[key])

    frontend_name = getattr(args, 'frontend', None) or ckpt_args.get('frontend')
    if frontend_name == 'Wav2VecFrontend':
        # trained wav2vec frontend: a model SUBMODULE whose weights ride in
        # the checkpoint's params['frontend'] (reference --frontend-checkpoint,
        # train.py:355-361, models.py:446-483)
        from ..frontend.wav2vec import Wav2VecFrontend
        frontend = Wav2VecFrontend(out_channels=args.num_input_features,
                                   sample_rate=args.sample_rate)
    else:
        frontend = LogFilterBankFrontend(
            out_channels=args.num_input_features, sample_rate=args.sample_rate,
            window_size=args.window_size, window_stride=args.window_stride,
            window=getattr(args, 'window', 'hann_window'),
            dither=args.dither, dither0=getattr(args, 'dither0', 0.0),
            normalize_signal_enabled=getattr(args, 'normalize_signal', True),
            normalize_signal_multiplier=getattr(
                args, 'debug_short_long_records_normalize_signal_multiplier', 1.0))

    text_config = ProcessingPipeline.load_config(ckpt_args.get('text_config', args.text_config))
    pipeline_names = ckpt_args.get('text_pipelines', args.text_pipelines)
    # dual-head checkpoints (e.g. char+BPE, reference models.py:27-35) carry
    # ALL their heads in the param tree — the model must be built with every
    # head or the weights don't fit; --pipeline picks which head to decode
    want = getattr(args, 'pipeline', None) or pipeline_names[0]
    assert want in pipeline_names, \
        f'--pipeline {want!r} not in this checkpoint\'s heads {pipeline_names}'
    head = pipeline_names.index(want)
    all_pipelines = [ProcessingPipeline.make(text_config, n)
                     for n in pipeline_names]
    text_pipeline = all_pipelines[head]

    model_name = args.model or ckpt_args.get('model', 'JasperNetBig')
    overrides = ckpt_model_overrides(ckpt_args)
    model = create_model(model_name, num_input_features=args.num_input_features,
                         num_classes=tuple(p.tokenizer.vocab_size
                                           for p in all_pipelines),
                         decoder_type='bpe' if len(all_pipelines) > 1 else None,
                         frontend=frontend,
                         dtype=jnp.bfloat16 if args.bf16 else jnp.float32, **overrides)

    variables = {'params': payload['params'], 'batch_stats': payload.get('batch_stats', {})}
    if not variables['params']:
        # no weights (e.g. smoke runs): initialize randomly
        x0 = jnp.zeros((1, args.sample_rate), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0, xlen=jnp.ones((1,), jnp.float32))

    # params must be jit ARGUMENTS, not closure constants: closing over them
    # embeds ~700MB of weights into the HLO (and the tunneled remote-compile
    # endpoint rejects oversized programs with HTTP 413)
    @jax.jit
    def _forward(variables, x, xlen):
        out = model.apply(variables, x, xlen=xlen)
        return out['log_probs'][head], out['logits'][head], out['olen'][head]

    variables_dev = jax.device_put(variables)

    # int8 PTQ (--quantize int8): BN-folded per-channel int8 weights +
    # calibrated per-tensor activation scales; convs ride the MXU int8 path
    # (394 TOPS = 2x bf16 peak, scripts/int8_conv_probe.py). qstate is filled
    # by forward.calibrate(batches) once the first data batches exist.
    qstate = {}

    @jax.jit
    def _forward_q(qtree, x, xlen):
        from ..models.quantized import quantized_apply
        out = quantized_apply(model, qtree, x, xlen=xlen)
        return out['log_probs'][head], out['logits'][head], out['olen'][head]

    def forward(x, xlen):
        if qstate:
            return _forward_q(qstate['qtree'], x, xlen)
        return _forward(variables_dev, x, xlen)

    _param_put = jax.device_put  # --data-parallel rebinds to mesh-replicated

    def calibrate(batches, percentile=100.0, cache_path=None):
        from ..models.quantized import quantize_cached
        qstate['qtree'] = _param_put(
            quantize_cached(model, variables, batches, percentile,
                            cache_path=cache_path))

    forward.calibrate = calibrate

    # low-latency serving path: greedy argmax fused ON DEVICE, idx+confidence
    # packed into ONE buffer so the (tunneled) host fetch is a single small
    # roundtrip instead of the full (T', C) posterior (see benchmark_online)
    @jax.jit
    def _forward_fused(variables, x, xlen):
        out = model.apply(variables, x, xlen=xlen)
        lp = out['log_probs'][head]
        return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                          jnp.max(lp, -1).astype(jnp.float32)], -1)  # (B, T', 2)

    @jax.jit
    def _forward_fused_q(qtree, x, xlen):
        from ..models.quantized import quantized_apply
        lp = quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][head]
        return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                          jnp.max(lp, -1).astype(jnp.float32)], -1)

    def fused(x, xlen):
        if qstate:
            return _forward_fused_q(qstate['qtree'], x, xlen)
        return _forward_fused(variables_dev, x, xlen)

    forward.fused = fused

    # int16 ingest: LINEAR16 requests ride the wire AND the (tunneled) host->
    # device link as int16; the /32767 scale (audio/io.py SMAX convention)
    # happens on device. Halves the serving upload (measured: B=1 T=6s
    # dispatch 51 -> 38 ms through the axon tunnel).
    @jax.jit
    def _forward_fused_i16(variables, x_i16, xlen):
        x = x_i16.astype(jnp.float32) / jnp.float32(32767.0)
        out = model.apply(variables, x, xlen=xlen)
        lp = out['log_probs'][head]
        return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                          jnp.max(lp, -1).astype(jnp.float32)], -1)

    @jax.jit
    def _forward_fused_i16_q(qtree, x_i16, xlen):
        from ..models.quantized import quantized_apply
        x = x_i16.astype(jnp.float32) / jnp.float32(32767.0)
        lp = quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][head]
        return jnp.stack([jnp.argmax(lp, -1).astype(jnp.float32),
                          jnp.max(lp, -1).astype(jnp.float32)], -1)

    def fused_i16(x, xlen):
        if qstate:
            return _forward_fused_i16_q(qstate['qtree'], x, xlen)
        return _forward_fused_i16(variables_dev, x, xlen)

    forward.fused_i16 = fused_i16

    # top-k variant of the fused path: (B, T', k, 2) packed [log-prob, id]
    # pairs — the per-stream streaming-beam fetch (serve/streaming.py
    # _beam_final accumulates these and decodes finals through the host
    # C++ beam + n-gram LM)
    @functools.partial(jax.jit, static_argnums=(3,))
    def _forward_topk(variables, x, xlen, k):
        lp = model.apply(variables, x, xlen=xlen)['log_probs'][head]
        vals, ids = jax.lax.top_k(lp, k)
        return jnp.stack([vals.astype(jnp.float32),
                          ids.astype(jnp.float32)], -1)

    @functools.partial(jax.jit, static_argnums=(3,))
    def _forward_topk_q(qtree, x, xlen, k):
        from ..models.quantized import quantized_apply
        lp = quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][head]
        vals, ids = jax.lax.top_k(lp, k)
        return jnp.stack([vals.astype(jnp.float32),
                          ids.astype(jnp.float32)], -1)

    def fused_topk(x, xlen, k=8):
        if qstate:
            return _forward_topk_q(qstate['qtree'], x, xlen, k)
        return _forward_topk(variables_dev, x, xlen, k)

    forward.fused_topk = fused_topk

    # batched-streaming fused tick (serve/streaming_batch.py): the engine
    # traces apply_fn INSIDE its single-dispatch tick jit; weights resolved
    # per call so --quantize int8 calibration (which fills qstate) is honored
    def _lp(variables, x, xlen):
        return model.apply(variables, x, xlen=xlen)['log_probs'][head]

    def _lp_q(qtree, x, xlen):
        from ..models.quantized import quantized_apply
        return quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][head]

    def stream_logprobs():
        if qstate:
            return _lp_q, (lambda: qstate['qtree'])
        return _lp, (lambda: variables_dev)

    forward.stream_logprobs = stream_logprobs

    dp_mesh = None
    if getattr(args, 'data_parallel', False):
        # pod-scale inference: params replicated over the mesh, every device
        # call's batch dim sharded over 'data' (VERDICT r3 #2); greedy/fused/
        # topk/int8 paths all ride the same wrapper
        from ..parallel.mesh import make_mesh, replicated as _repl
        mesh = dp_mesh = make_mesh(n_model=1)
        variables_dev = jax.device_put(variables, _repl(mesh))
        _param_put = lambda t: jax.device_put(t, _repl(mesh))  # noqa: E731
        wrap = _make_dp_wrapper(mesh)
        fwd = wrap(forward)
        fwd.calibrate = calibrate
        fwd.fused = wrap(fused)
        fwd.fused_i16 = wrap(fused_i16)
        fwd.fused_topk = wrap(fused_topk)
        fwd.stream_logprobs = stream_logprobs
        forward = fwd
        print(f'transcribe: data-parallel over {mesh.shape["data"]} devices')

    generator = GreedyCTCGenerator(blank_amount_to_space=args.replace_blank_series)
    # NOTE: the reference parses the beam flags but transcribe.py never
    # instantiates the decoder (transcribe.py:323-328 vs main); here the beam
    # decoders are actually wired in (shared factory, also used by train eval)
    from ..decode.factory import build_decoder
    # under --data-parallel the DEVICE beams also shard their batch over the
    # mesh 'data' axis (VERDICT r4 #5: the flagship decoder at pod scale)
    decoder = build_decoder(args, text_pipeline.tokenizer, mesh=dp_mesh)
    return text_pipeline, frontend, model, forward, generator, decoder


def main(args, ext_json=('.json', '.json.gz')):
    from ..infra.utils import enable_compilation_cache, select_device
    select_device(getattr(args, 'device', None))
    enable_compilation_cache()
    assert args.output_json or args.output_html or args.output_txt or args.output_csv, \
        'at least one output format must be requested'
    os.makedirs(args.output_path, exist_ok=True)

    audio_paths = set(
        p for f in args.input_path
        for p in ([os.path.join(f, g) for g in os.listdir(f)] if os.path.isdir(f) else [f])
        if os.path.isfile(p) and any(p.endswith(e) for e in args.ext))
    json_paths = set(p for p in args.input_path if any(p.endswith(e) for e in ext_json))
    data_paths = sorted(audio_paths | json_paths)

    exclude = set(os.path.splitext(b)[0] for b in os.listdir(args.output_path)
                  if b.endswith('.json')) if args.skip_processed else None
    data_paths = [p for p in data_paths
                  if exclude is None or os.path.basename(p) not in exclude]

    text_pipeline, frontend, model, forward, generator, decoder = setup(args)

    # --profile-phases: cumulative wall seconds per pipeline phase. Worker-
    # thread phases (getitem/collate/dispatch) OVERLAP the consumer phases
    # (fetch/decode/outputs) under the one-ahead pipeline, so the sum can
    # exceed the wall clock; the per-phase totals show which side binds.
    import collections
    phases = collections.defaultdict(float)
    profile = getattr(args, 'profile_phases', False)

    def _timed(name, fn, *a, **kw):
        if not profile:
            return fn(*a, **kw)
        t0 = time.time()
        r = fn(*a, **kw)
        phases[name] += time.time() - t0
        return r

    if args.vad is not None:
        # VAD-chunked long-audio pipeline: segment each audio file by speech
        # activity, write a synthetic transcript json, and feed the segments
        # through the normal batched_transcript path (BASELINE.json config 5;
        # the reference left this as scaffolding, vad.py + transcribe.py:1-2)
        from ..audio.vad import detect_speech, mask_to_segments, postprocess_cut, \
            postprocess_batching
        neural_model = None
        if args.vad_backend == 'neural':
            # learned SAD (audio/neural_vad.py) — the in-repo stand-in for
            # the reference's pyannote SAD pipeline (diarization.py:36-45)
            from ..audio.neural_vad import NeuralVADModel
            assert args.vad_model, '--vad-backend neural needs --vad-model'
            neural_model = NeuralVADModel.load(args.vad_model)
        vad_dir = os.path.join(args.output_path, 'vad_segments')
        os.makedirs(vad_dir, exist_ok=True)
        chunked_paths = []
        for path in data_paths:
            if not any(path.endswith(e) for e in args.ext):
                chunked_paths.append(path)
                continue
            signal, sr = _timed('vad_read', audio_io.read_audio, path,
                                sample_rate=args.sample_rate, mono=True)
            mask = _timed('vad_detect', detect_speech,
                          signal, sr, window_size=0.02, aggressiveness=args.vad,
                          window_size_dilate=args.window_size_dilate,
                          backend=args.vad_backend, neural_model=neural_model)
            segments = postprocess_batching(
                postprocess_cut(mask_to_segments(mask[0], sr),
                                merge_gap=args.vad_merge_gap,
                                min_duration=args.vad_min_duration),
                max_duration=args.max_segment_duration or 20.0,
                expand=args.vad_expand)
            entries = [dict(audio_path=path, ref='', begin=b, end=e)
                       for b, e in segments] or [dict(audio_path=path, ref='')]
            seg_json = os.path.join(vad_dir, os.path.basename(path) + '.json')
            with open(seg_json, 'w') as f:
                json.dump(entries, f, ensure_ascii=False)
            chunked_paths.append(seg_json)
        data_paths = chunked_paths

    dataset = AudioTextDataset(
        data_paths, [text_pipeline], args.sample_rate, frontend=None, mono=args.mono,
        time_padding_multiple=args.batch_time_padding_multiple,
        audio_backend=args.audio_backend, exclude=exclude,
        max_duration=args.transcribe_first_n_sec,
        string_array_encoding=args.dataset_string_array_encoding,
        mode='batched_channels' if args.join_transcript else 'batched_transcript',
        duration_from_transcripts=args.join_transcript)
    print('Examples count:', len(dataset))
    meta_table = dataset.pop_meta()

    csv_sep = dict(tab='\t', comma=',')[args.csv_sep]
    csv_lines = []

    if args.quantize == 'int8' and len(dataset):
        # PTQ calibration on the first batches of the actual input corpus
        # (folded f32 stats on the host CPU backend; see models/quantized.py)
        calib = []
        for k in range(min(args.calibration_batches, len(dataset))):
            _, _, cx, cxlen, _, _ = dataset.collate_fn(dataset[k])
            if cx.size:
                calib.append(dict(x=np.asarray(cx[:, 0, :]),
                                  xlen=np.asarray(cxlen)))
        tic = time.time()
        forward.calibrate(calib, percentile=args.calibration_percentile,
                          cache_path=args.calibration_cache)
        print(f'int8 PTQ: calibrated on {len(calib)} batch(es) '
              f'in {time.time() - tic:.1f} sec')

    from ..data.loader import prefetch_map
    items = prefetch_map(lambda i: _timed('getitem', dataset.__getitem__, i),
                         range(len(dataset)), num_workers=args.num_workers)

    # fused-path software pipeline: collate + host->device upload + async
    # dispatch happen ONE item ahead (ordered single-worker lookahead), so
    # the device computes item i+1 while the host fetches/post-processes
    # item i. Through the tunnel the upload is a large share of the
    # end-to-end cost (CLAUDE.md: 8-120 MB/s link) — overlapping it with
    # the host tail roughly doubles sustained CLI throughput.
    def collate_and_dispatch(item):
        collated = _timed('collate', dataset.collate_fn, item)
        _, _, x, xlen, _, _ = collated
        fused_ok = (decoder is None and not args.align and not args.logits
                    and getattr(forward, 'fused', None) is not None)
        dev = None
        if x.size and fused_ok:
            try:
                def dispatch():
                    if args.device_transport == 'int16':
                        xi = (np.clip(x[:, 0, :], -1.0, 1.0) * 32767.0) \
                            .round().astype(np.int16)
                        return forward.fused_i16(jnp.asarray(xi), jnp.asarray(xlen))
                    return forward.fused(jnp.asarray(x[:, 0, :]), jnp.asarray(xlen))
                dev = _timed('dispatch', dispatch)
            except Exception as e:  # surfaced (and possibly skipped) at fetch
                dev = e
        return collated, dev

    pipelined = prefetch_map(collate_and_dispatch, items, num_workers=1,
                             lookahead=2)
    for i, (collated, packed_dev) in enumerate(pipelined):
        # non-default modes: one example IS one batch (batch_size=None
        # semantics, transcribe.py:102); collate zips the per-segment lists
        meta, s, x, xlen, y, ylen = collated
        meta = [meta_table[t['example_id']] for t in meta]
        audio_path = meta[0]['audio_path']
        audio_name = transcripts.audio_name(audio_path)
        if x.size == 0:
            print(f'Skipping empty [{audio_path}]')
            continue

        tic = time.time()
        begin = np.asarray([t['begin'] for t in meta], dtype=np.float64)
        end = np.asarray([t['end'] for t in meta], dtype=np.float64)
        channel = [t['channel'] for t in meta]
        speaker = [t['speaker'] for t in meta]
        speaker_name = [t.get('speaker_name') for t in meta]
        duration = x.shape[-1] / args.sample_rate

        # pure greedy runs need only the argmax path: the fused forward packs
        # idx+confidence into ONE small buffer (vs three incl. the full
        # posterior), cutting the device->host transfer ~60x
        try:
            if isinstance(packed_dev, Exception):
                raise packed_dev
            if packed_dev is not None:
                # fused greedy path, dispatched one item ahead (see
                # collate_and_dispatch): ONE small packed fetch
                packed = _timed('fetch', np.asarray, packed_dev)
                most_probable_idx = packed[..., 0].astype(np.int64)
                n_frames = packed.shape[1]
                olen = np.ceil(np.asarray(xlen, np.float64) * n_frames).astype(np.int64)
                log_probs = logits = None
            else:
                log_probs, logits, olen = forward(jnp.asarray(x[:, 0, :]),
                                                  jnp.asarray(xlen))
                log_probs, logits, olen = map(np.asarray, (log_probs, logits, olen))
                most_probable_idx = None
                n_frames = log_probs.shape[1]
        except Exception as e:  # device OOM etc. — skip the batch (spec:
            # utils.OomHandler / transcribe.py:196-202)
            if 'RESOURCE_EXHAUSTED' in str(e) or 'out of memory' in str(e).lower():
                print(f'Skipping {i}/{len(dataset)} [{audio_path}] after OOM: {e}')
                continue
            raise
        # on the pipelined fused path the forward was dispatched one item
        # ahead, so this measures fetch (+any residual compute), not dispatch
        print(f'Processing {i}/{len(dataset)}: {audio_path} '
              f'({duration:.2f}s audio, {time.time() - tic:.2f}s fetch+decode)')

        ts = duration * np.linspace(0, 1, n_frames)[None, :].repeat(x.shape[0], axis=0)

        extra = [dict(speaker=s_, speaker_name=sn, channel=c)
                 for s_, sn, c in zip(speaker, speaker_name, channel)]
        ref_segments = [[dict(channel=channel[k], begin=begin[k], end=end[k],
                              ref=text_pipeline.postprocess(
                                  text_pipeline.preprocess(meta[k]['ref'])))]
                        for k in range(len(meta))]
        if decoder is not None:
            # beam-search path: per-utterance token sequences -> one segment
            # per utterance spanning its [begin, end]
            decoded = decoder.decode(log_probs, output_lengths=olen)
            hyp_segments = []
            for k, tokens in enumerate(decoded):
                tokens = tokens if args.decoder_topk == 1 else tokens[0]
                text = text_pipeline.decode([tokens])[0]
                hyp_segments.append([transcripts.Segment(
                    begin=float(begin[k]), end=float(end[k]), hyp=text, **extra[k])])
        else:
            hyp_segments = [alts[0] for alts in _timed(
                'decode_host', generator.generate,
                tokenizer=text_pipeline.tokenizer, log_probs=log_probs, begin=begin,
                end=end, output_lengths=olen, time_stamps=ts, segment_text_key='hyp',
                segment_extra_info=extra, most_probable_idx=most_probable_idx)]
        hyp_segments = [transcripts.map_text(text_pipeline.postprocess, hyp=h)
                        for h in hyp_segments]
        hyp = '\n'.join(transcripts.join(hyp=h) for h in hyp_segments).strip()
        ref = '\n'.join(transcripts.join(ref=r) for r in ref_segments).strip()
        if args.verbose:
            print('HYP:', hyp)
        if ref:
            print('CER: {:.02%}'.format(cer_fn(hyp=hyp, ref=ref)))

        if args.align and y.size > 0 and int(ylen[:, 0].max()) > 0:
            # forced alignment of refs onto the CTC lattice (spec:
            # transcribe.py:175-195); blank = eps class
            alignment = np.asarray(ctc_alignment(
                jnp.asarray(log_probs), jnp.asarray(y[:, 0, :]),
                jnp.asarray(olen, np.int32), jnp.asarray(ylen[:, 0], np.int32),
                blank=text_pipeline.tokenizer.eps_id))
            aligned_ts = np.take_along_axis(ts, alignment, axis=1)
            onehot = np.eye(log_probs.shape[-1], dtype=np.float32)[y[:, 0, :]]
            ref_segments = [alts[0] for alts in generator.generate(
                tokenizer=text_pipeline.tokenizer, log_probs=onehot, begin=begin, end=end,
                output_lengths=ylen[:, 0], time_stamps=aligned_ts,
                segment_text_key='ref', segment_extra_info=extra)]
            ref_segments = [transcripts.map_text(text_pipeline.postprocess, ref=r)
                            for r in ref_segments]

        ref_transcript, hyp_transcript = [
            sorted(transcripts.flatten(segs), key=transcripts.sort_key)
            for segs in [ref_segments, hyp_segments]]

        if args.max_segment_duration:
            if ref:
                ref_segments = list(transcripts.segment_by_time(
                    ref_transcript, args.max_segment_duration))
                hyp_segments = list(transcripts.segment_by_ref(hyp_transcript, ref_segments))
            else:
                hyp_segments = list(transcripts.segment_by_time(
                    hyp_transcript, args.max_segment_duration))
                ref_segments = [[] for _ in hyp_segments]
        elif args.ref_transcript_path and args.join_transcript:
            base = audio_name.split('.')[0]
            ref_segments = [[t] for t in sorted(
                transcripts.load(os.path.join(args.ref_transcript_path, base + '.json')),
                key=transcripts.sort_key)]
            hyp_segments = list(transcripts.segment_by_ref(
                hyp_transcript, ref_segments, set_speaker=True, soft=False))

        transcript = []
        for hyp_seg, ref_seg in zip(hyp_segments, ref_segments):
            h, r = transcripts.join(hyp=hyp_seg), transcripts.join(ref=ref_seg)
            seg_channel = next((s['channel'] for s in list(hyp_seg) + list(ref_seg)
                                if s.get('channel') is not None),
                               transcripts.channel_missing)
            transcript.append(dict(
                audio_path=audio_path, ref=r, hyp=h, channel=seg_channel,
                speaker_name=transcripts.speaker_name(ref=ref_seg, hyp=hyp_seg),
                words=align_words(*align_strings(hyp=h, ref=r)) if args.align_words else [],
                words_ref=ref_seg if args.align_words else [],
                words_hyp=hyp_seg if args.align_words else [],
                **transcripts.summary(hyp_seg),
                cer=cer_fn(hyp=h, ref=r)))

        # --diarize: mono multi-speaker attribution (the reference's pyannote
        # speaker hack, transcribe.py:208-222) — cluster the audio into
        # speaker turns (audio/diarization.py::diarize_mono) and stamp each
        # segment with its majority speaker; --speakers then names speaker
        # ids instead of channels
        if getattr(args, 'diarize', False) and transcript:
            from ..audio.diarization import diarize_mono
            sig_d, sr_d = audio_io.read_audio(
                audio_path, sample_rate=args.sample_rate, mono=True)
            spk = diarize_mono(sig_d[0], sr_d, num_speakers=2)
            names = [transcripts.speaker_name_missing] + list(args.speakers or [])
            for t in transcript:
                span = spk[int(t['begin'] * sr_d):
                           max(int(t['end'] * sr_d), int(t['begin'] * sr_d) + 1)]
                span = span[span > 0]
                t['speaker'] = int(np.bincount(span).argmax()) if len(span) \
                    else transcripts.speaker_missing
                t['speaker_name'] = names[t['speaker']] \
                    if t['speaker'] < len(names) \
                    else transcripts.default_speaker_names[t['speaker']]
            transcripts.collect_speaker_names(transcript, set_speaker_data=False,
                                              num_speakers=2)
        else:
            # --speakers names the channels (dead in the reference: parsed at
            # transcribe.py:340 but never read; honored here)
            transcripts.collect_speaker_names(transcript, speaker_names=args.speakers or [],
                                              set_speaker_data=True, num_speakers=2)
        filtered = list(transcripts.prune(
            transcript, align_boundary_words=args.align_boundary_words,
            cer=args.prune_cer, duration=args.prune_duration, gap=args.prune_gap,
            allowed_unk_count=args.prune_unk, num_speakers=args.prune_num_speakers))
        print('Filtered segments:', len(filtered), 'of', len(transcript))

        if args.output_json:
            print(_timed('outputs', transcripts.save,
                         os.path.join(args.output_path, audio_name + '.json'),
                         filtered))
        if args.output_html:
            print(vis.transcript(os.path.join(args.output_path, audio_name + '.html'),
                                 args.sample_rate, args.mono, transcript, filtered))
        if args.output_txt:
            path = os.path.join(args.output_path, audio_name + '.txt')
            with open(path, 'w') as f:
                f.write(' '.join(t['hyp'].strip() for t in filtered))
            print(path)
        if args.output_csv and filtered:
            csv_lines.append(csv_sep.join([
                audio_path, ' '.join(t['hyp'].strip() for t in filtered),
                str(min(t['begin'] for t in filtered)),
                str(max(t['end'] for t in filtered))]))
        if args.logits:
            path = os.path.join(args.output_path, audio_name + '.npz')
            if args.logits_topk:
                from ..infra.utils import sparse_topk
                payload = {}
                for k in range(len(logits)):
                    sp = sparse_topk(logits[k, :int(olen[k])], args.logits_topk)
                    payload[f'logits_{k}_indices'] = sp['indices']
                    payload[f'logits_{k}_values'] = sp['values']
                    payload[f'logits_{k}_shape'] = np.asarray(sp['shape'])
                np.savez(path, **payload, ref=ref, hyp=hyp, audio_path=audio_path)
            else:
                # --logits-crop limits the saved frame range (transcribe.py:284-291)
                crop = (slice(*args.logits_crop) if args.logits_crop else None)
                np.savez(path, **{
                    f'logits_{k}': logits[k, :int(olen[k])][crop]
                    if crop else logits[k, :int(olen[k])]
                    for k in range(len(logits))},
                         ref=ref, hyp=hyp, audio_path=audio_path)
            print(path)

    if args.output_csv:
        path = os.path.join(args.output_path, 'transcripts.csv')
        with open(path, 'w') as f:
            f.write('\n'.join(csv_lines))
        print(path)

    if profile:
        acc = sum(phases.values())
        print('PHASES: ' + ' | '.join(
            f'{k} {v:.1f}s' for k, v in
            sorted(phases.items(), key=lambda kv: -kv[1]))
            + f' | accounted {acc:.1f}s (worker phases overlap consumer ones)')


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--verbose', action='store_true')
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--device', default=None, choices=['cpu', 'tpu', 'axon'],
                        help='JAX platform (spec: reference --device)')
    parser.add_argument('--model')
    parser.add_argument('--batch-time-padding-multiple', type=int, default=128)
    parser.add_argument('--ext', nargs='*', default=['wav', 'mp3', 'opus', 'm4a'])
    parser.add_argument('--skip-processed', action='store_true')
    parser.add_argument('--input-path', '-i', nargs='+', required=True)
    parser.add_argument('--output-path', '-o', default='data/transcribe')
    parser.add_argument('--output-json', action='store_true')
    parser.add_argument('--output-html', action='store_true')
    parser.add_argument('--output-txt', action='store_true')
    parser.add_argument('--output-csv', action='store_true')
    parser.add_argument('--csv-sep', default='tab', choices=['tab', 'comma'])
    parser.add_argument('--bf16', type=str2bool, nargs='?', const=True, default=True)
    parser.add_argument('--quantize', choices=['int8'], default=None,
                        help='int8 PTQ inference: BN-folded per-channel int8 '
                             'weights + calibrated activation scales; convs '
                             'run on the MXU int8 path (2x bf16 peak)')
    parser.add_argument('--calibration-batches', type=int, default=1,
                        help='number of leading input batches used for '
                             'activation-scale calibration (--quantize)')
    parser.add_argument('--calibration-cache', default=None,
                        help='activation-scales cache file (.npz): written '
                             'after the first calibration, loaded instead of '
                             'recalibrating (skips the minutes-long folded-'
                             'graph compile at startup); valid only for the '
                             'same checkpoint + calibration setup')
    parser.add_argument('--calibration-percentile', type=float, default=100.0,
                        help='|x| percentile for activation scales (100 = absmax)')
    parser.add_argument('--num-workers', type=int, default=0)
    parser.add_argument('--data-parallel', action='store_true',
                        help='shard every batch over all devices (data-axis '
                             'SPMD; pod-scale inference — the train loop\'s '
                             'mesh applied to the product CLI)')
    parser.add_argument('--profile-phases', action='store_true',
                        help='print cumulative per-phase wall seconds '
                             '(vad_read/vad_detect/getitem/collate/dispatch/'
                             'fetch/decode_host/outputs) at exit')
    parser.add_argument('--mono', action='store_true')
    parser.add_argument('--audio-backend', default=None, choices=[None, 'sox', 'ffmpeg'])
    parser.add_argument('--decoder', default='GreedyDecoder',
                        choices=['GreedyDecoder', 'BeamSearchDecoder',
                                 'BeamSearchDecoderDevice',
                                 'BeamSearchDecoderDeviceLM'])
    parser.add_argument('--beam-cutoff-top-n', type=int, default=8)
    parser.add_argument('--decoder-topk', type=int, default=1)
    parser.add_argument('--beam-width', type=int, default=5000)
    parser.add_argument('--beam-alpha', type=float, default=0.3)
    parser.add_argument('--beam-beta', type=float, default=1.0)
    parser.add_argument('--lm')
    parser.add_argument('--beam-rescore', action='store_true',
                        help='with --decoder BeamSearchDecoder --lm: rescore the top complete hypotheses with the word LM instead of per-frame in-beam fusion (equals the device hybrid WER at host-beam speed; streaming finals inherit it)')
    parser.add_argument('--beam-max-len', type=int, default=0,
                        help='hybrid-decoder hypothesis-buffer cap (0 = frames+1, exact; speech emits ~frames/10 tokens, so ~frames/4 cuts device-beam HBM traffic and the fetch)')
    parser.add_argument('--align', action='store_true')
    parser.add_argument('--logits', action='store_true')
    parser.add_argument('--logits-crop', nargs=2, type=int, default=None,
                        help='save only frames [begin, end) of each logit '
                             'matrix (spec: transcribe.py:284-291)')
    parser.add_argument('--normalize-signal', default=True,
                        type=lambda v: str(v).lower() in ('1', 'true', 'yes'))
    parser.add_argument('--dither0', type=float, default=0.0)
    parser.add_argument('--device-transport', choices=['float32', 'int16'],
                        default='int16',
                        help='ship audio to the device as int16 PCM (half '
                             'the host->device bytes, /32767 on device; '
                             'bit-exact for int16-sourced corpora). Applies '
                             'to the fused greedy path')
    parser.add_argument('--logits-topk', type=int, default=0,
                        help='store only top-k classes per frame (sparse logits)')
    parser.add_argument('--align-boundary-words', action='store_true')
    parser.add_argument('--align-words', action='store_true')
    parser.add_argument('--max-segment-duration', type=float, default=0.0)
    parser.add_argument('--vad-backend', default=None,
                        choices=['energy', 'webrtcvad', 'neural'],
                        help='speech detector: energy (default), webrtcvad '
                             'when installed, or the learned SAD '
                             '(audio/neural_vad.py; needs --vad-model)')
    parser.add_argument('--vad-model', default=None,
                        help='NeuralVADModel .npz for --vad-backend neural '
                             '(train: python -m convasr_tpu.audio.neural_vad '
                             '--train out.npz)')
    parser.add_argument('--vad-merge-gap', type=float, default=1.0,
                        help='merge VAD segments separated by less than this '
                             'many seconds of silence (audio/vad.py '
                             'postprocess_cut)')
    parser.add_argument('--vad-min-duration', type=float, default=0.5,
                        help='drop VAD segments shorter than this (seconds)')
    parser.add_argument('--vad-expand', type=float, default=0.5,
                        help='expand each final VAD segment by this many '
                             'seconds on each side (postprocess_batching); '
                             'keep small for models sensitive to in-segment '
                             'silence (masked instance-norm stats)')
    parser.add_argument('--vad', type=int, default=None, metavar='AGGRESSIVENESS',
                        help='segment long audio by voice activity (0-3) before decoding')
    parser.add_argument('--prune-cer', type=transcripts.number_tuple)
    parser.add_argument('--prune-duration', type=transcripts.number_tuple)
    parser.add_argument('--prune-num-speakers', type=transcripts.number_tuple)
    parser.add_argument('--prune-gap', type=transcripts.number_tuple)
    parser.add_argument('--prune-unk', type=transcripts.number_tuple)
    parser.add_argument('--replace-blank-series', type=int, default=8)
    parser.add_argument('--transcribe-first-n-sec', type=int)
    parser.add_argument('--join-transcript', action='store_true')
    parser.add_argument('--sample-rate', type=int, default=8000)
    parser.add_argument('--window-size', type=float, default=0.02)
    parser.add_argument('--window-stride', type=float, default=0.01)
    parser.add_argument('--window', default='hann_window')
    parser.add_argument('--num-input-features', type=int, default=64)
    parser.add_argument('--dither', type=float, default=0.0)
    parser.add_argument('--text-config', default='configs/ru_text_config.json')
    parser.add_argument('--text-pipelines', nargs='+', default=['char_legacy'])
    parser.add_argument('--pipeline', help='which checkpoint head/pipeline '
                        'to decode (dual-head char+BPE checkpoints; '
                        'default: the first)')
    parser.add_argument('--ref-transcript-path')
    parser.add_argument('--frontend', default=None,
                        choices=['LogFilterBankFrontend', 'Wav2VecFrontend'],
                        help='override the frontend recorded in the '
                             'checkpoint args')
    parser.add_argument('--speakers', nargs='*', default=None,
                        help='speaker names per channel (reference parses but '
                             'never reads this, transcribe.py:340); with '
                             '--diarize: names per diarized speaker id')
    parser.add_argument('--diarize', action='store_true',
                        help='mono multi-speaker attribution: cluster the '
                             'audio into speaker turns and stamp each output '
                             'segment with its majority speaker (the '
                             'reference\'s pyannote speaker hack, '
                             'transcribe.py:208-222; in-repo stand-in '
                             'audio/diarization.py::diarize_mono)')
    parser.add_argument('--dataset-string-array-encoding', default='utf_16_le',
                        choices=['utf_16_le', 'utf_32_le'])
    parser.add_argument('--window-size-dilate', type=float, default=None,
                        help='VAD speech-mask dilation in seconds (the '
                             'reference left it commented out, vad.py:21-23)')
    parser.add_argument('--oom-retries', type=int, default=100,
                        help='compat: device OOM skips the file after this '
                             'many failures (transcribe.py:197-202)')
    parser.add_argument('--fp16', nargs='?', const='O2', default=None,
                        help='compat no-op: inference runs bf16 natively')
    parser.add_argument('--frontend-in-model', action='store_true', default=True,
                        help='compat no-op, always true on TPU')
    parser.add_argument('--debug-short-long-records-normalize-signal-multiplier',
                        type=float, default=1.0,
                        help='scale on the peak-normalization denominator '
                             '(models.py:684-686 denom_multiplier)')
    parser.add_argument('--debug-short-long-records-features-from-whole-normalized-signal',
                        action='store_true',
                        help='compat no-op: the frontend always runs in-model '
                             'on the full padded signal of each example '
                             '(reference dataset-side hack, datasets.py:270-274)')
    parser.add_argument('--pack-backpointers', action='store_true',
                        help='compat no-op: the Pallas alignment kernel keeps '
                             'backpointers in VMEM tiles (reference 2-bit '
                             'packing, ctc.py:35-54)')
    return parser


if __name__ == '__main__':
    main(build_parser().parse_args())
