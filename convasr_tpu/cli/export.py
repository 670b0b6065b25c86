"""Model export + numeric-parity validation.

Behavior spec: the reference's ONNX export path (train.py:449-511: fuse
conv+BN, torch.onnx.export, then assert allclose between native and exported
logits at fp32 rtol 1e-2 / atol 1e-3; fp16 rtol 1e-1 / atol 1e-2). The
TPU-native export story is `jax.export` -> a serialized StableHLO artifact
that any XLA runtime (or `jax.export.deserialize`) can execute; the same
tolerances gate the parity check.

Also implements eval-time conv+BN fusion (models.py:141-151, 341-343) as a
pure parameter transformation — folding BN scale/bias/stats into the
preceding conv kernel, which removes the BN ops from the serving graph.
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp


def fuse_conv_bn(params: dict, batch_stats: dict, eps: float = 1e-5):
    """Eval-mode BN folding: absorb running stats into BN scale/bias so BN
    becomes a pure per-channel affine (mean=0, var=1-eps).

    The reference's fuse_conv_bn_eval (models.py:141-151) rewrites conv
    weights because PyTorch eager pays a separate BN kernel at inference.
    Under XLA that affine is fused into the preceding conv during compilation
    anyway, so the semantically-safe stat folding below (which works for
    bias-less and separable convs alike) is all that's needed; outputs are
    bit-identical to the unfused model.
    """
    import copy
    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    batch_stats = copy.deepcopy(jax.tree.map(np.asarray, batch_stats))

    def fold(block_params, block_stats):
        for bn_name, stats in block_stats.items():
            bn = block_params.get(bn_name)
            if bn is None or 'mean' not in stats:
                continue
            scale = bn['scale'] / np.sqrt(stats['var'] + eps)
            bn['bias'] = bn['bias'] - stats['mean'] * scale
            bn['scale'] = scale
            stats['mean'] = np.zeros_like(stats['mean'])
            stats['var'] = np.ones_like(stats['var']) - eps

    for block_name, block_stats in batch_stats.items():
        if block_name in params:
            fold(params[block_name], block_stats)
    return params, batch_stats


def export_model(model, variables, example_x, example_xlen, output_path: str,
                 head: int = 0):
    """Serialize the jitted forward to a StableHLO artifact. head selects
    which decoder head a dual-head (char+BPE) model exports."""
    from jax import export as jax_export

    def forward(variables, x, xlen):
        out = model.apply(variables, x, xlen=xlen)
        return out['logits'][head], out['olen'][head]

    exported = jax_export.export(jax.jit(forward))(variables, example_x, example_xlen)
    blob = exported.serialize()
    with open(output_path, 'wb') as f:
        f.write(blob)
    return output_path


def export_quantized(model, variables, batches, example_x, example_xlen,
                     output_path: str, percentile: float = 100.0,
                     cache_path: str = None, head: int = 0):
    """Serialize the int8 PTQ graph (models/quantized.py) to a StableHLO
    artifact + a `<output>.qtree.npz` sidecar holding the quantized weights/
    scales. The artifact's first argument is the qtree, so runtimes load the
    sidecar and call(qtree, x, xlen); benchmark_online --onnx picks the
    sidecar up automatically."""
    from jax import export as jax_export
    from ..models.quantized import quantize_cached, quantized_apply, save_qtree

    qtree = quantize_cached(model, variables, batches, percentile,
                            cache_path=cache_path)

    def forward(qtree, x, xlen):
        out = quantized_apply(model, qtree, x, xlen=xlen)
        return out['logits'][head], out['olen'][head]

    exported = jax_export.export(jax.jit(forward))(qtree, example_x, example_xlen)
    with open(output_path, 'wb') as f:
        f.write(exported.serialize())
    save_qtree(output_path + '.qtree.npz', qtree)
    return output_path, qtree


def validate_quantized_export(model, example_x, example_xlen, export_path: str,
                              head: int = 0):
    """Artifact(qtree sidecar) output must match the live quantized graph."""
    from jax import export as jax_export
    from ..models.quantized import load_qtree, quantized_apply
    with open(export_path, 'rb') as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    qtree = load_qtree(export_path + '.qtree.npz')
    live = quantized_apply(model, qtree, example_x,
                           xlen=example_xlen)['logits'][head]
    art, _ = exported.call(qtree, example_x, example_xlen)
    np.testing.assert_allclose(np.asarray(art, np.float32),
                               np.asarray(live, np.float32),
                               rtol=1e-4, atol=1e-4)
    return True


def validate_export(model, variables, example_x, example_xlen, export_path: str,
                    fp16: bool = False, head: int = 0):
    """Run the serialized artifact and assert logits parity (tolerances:
    train.py:486-495)."""
    from jax import export as jax_export
    with open(export_path, 'rb') as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    native_logits = model.apply(variables, example_x,
                                xlen=example_xlen)['logits'][head]
    exported_logits, _ = exported.call(variables, example_x, example_xlen)
    rtol, atol = (1e-1, 1e-2) if fp16 else (1e-2, 1e-3)
    np.testing.assert_allclose(np.asarray(exported_logits, np.float32),
                               np.asarray(native_logits, np.float32),
                               rtol=rtol, atol=atol)
    return True


def main(args):
    from ..infra.utils import enable_compilation_cache, select_device
    select_device(getattr(args, 'device', None))
    enable_compilation_cache()
    from ..cli.transcribe import load_any_checkpoint
    from ..frontend.logmel import LogFilterBankFrontend
    from ..models.zoo import create_model
    from ..text import ProcessingPipeline

    payload, ckpt_args = load_any_checkpoint(args.checkpoint)
    sample_rate = ckpt_args.get('sample_rate', args.sample_rate)
    num_features = ckpt_args.get('num_input_features', args.num_input_features)
    frontend = LogFilterBankFrontend(out_channels=num_features, sample_rate=sample_rate,
                                     window_size=ckpt_args.get('window_size', 0.02),
                                     window_stride=ckpt_args.get('window_stride', 0.01),
                                     window=ckpt_args.get('window', 'hann_window'),
                                     dither=0.0)
    config = ProcessingPipeline.load_config(ckpt_args.get('text_config', args.text_config))
    pipeline_names = ckpt_args.get('text_pipelines', ['char_legacy'])
    # dual-head checkpoints export the head picked by --pipeline (the model
    # must still be built with EVERY head so the weights fit, cli/transcribe
    # setup convention)
    want = getattr(args, 'pipeline', None) or pipeline_names[0]
    assert want in pipeline_names, \
        f'--pipeline {want!r} not in this checkpoint\'s heads {pipeline_names}'
    head = pipeline_names.index(want)
    pipelines = [ProcessingPipeline.make(config, n) for n in pipeline_names]
    pipeline = pipelines[head]
    from ..cli.transcribe import ckpt_model_overrides
    overrides = ckpt_model_overrides(ckpt_args)
    model = create_model(ckpt_args.get('model', args.model), num_input_features=num_features,
                         num_classes=tuple(p.tokenizer.vocab_size for p in pipelines),
                         decoder_type='bpe' if len(pipelines) > 1 else None,
                         frontend=frontend,
                         dtype=jnp.bfloat16 if args.bf16 else jnp.float32, **overrides)
    variables = {'params': payload['params'], 'batch_stats': payload.get('batch_stats', {})}
    if args.fuse_bn:
        fused_params, fused_stats = fuse_conv_bn(variables['params'],
                                                 variables['batch_stats'])
        variables = {'params': fused_params, 'batch_stats': fused_stats}

    T = int(args.T * sample_rate)
    x = jnp.zeros((args.B, T), jnp.float32)
    xlen = jnp.ones((args.B,), jnp.float32)
    if args.quantize == 'int8':
        import os
        batches = None
        if args.calibration_data:
            from ..data.dataset import AudioTextDataset
            dataset = AudioTextDataset([args.calibration_data], [pipeline],
                                       sample_rate, frontend=None,
                                       mode='batched_transcript')
            batches = []
            for k in range(min(args.calibration_batches, len(dataset))):
                _, _, cx, cxlen, _, _ = dataset.collate_fn(dataset[k])
                if cx.size:
                    batches.append(dict(x=np.asarray(cx[:, 0, :]),
                                        xlen=np.asarray(cxlen)))
        else:
            assert args.calibration_cache and os.path.exists(args.calibration_cache), \
                '--quantize int8 needs --calibration-data or an existing --calibration-cache'
        path, _ = export_quantized(model, variables, batches, x, xlen,
                                   args.output_path, head=head,
                                   percentile=args.calibration_percentile,
                                   cache_path=args.calibration_cache)
        print('exported int8 artifact to', path, '+ sidecar', path + '.qtree.npz')
        if args.validate:
            validate_quantized_export(model, x, xlen, path, head=head)
            print('parity check passed')
        return
    path = export_model(model, variables, x, xlen, args.output_path, head=head)
    print('exported to', path)
    if args.validate:
        validate_export(model, variables, x, xlen, path, fp16=args.bf16,
                        head=head)
        print('parity check passed')


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--output-path', '-o', required=True)
    parser.add_argument('--device', default=None, choices=['cpu', 'tpu', 'axon'],
                        help='lowering platform of the artifact (artifacts '
                             'execute on the platform they were exported for)')
    parser.add_argument('--model', default='JasperNetBig')
    parser.add_argument('--sample-rate', type=int, default=8000)
    parser.add_argument('--num-input-features', type=int, default=64)
    parser.add_argument('--text-config', default='configs/ru_text_config.json')
    parser.add_argument('--pipeline', help='which checkpoint head to export '
                        '(dual-head char+BPE checkpoints; default: the first)')
    parser.add_argument('-B', type=int, default=1)
    parser.add_argument('-T', type=float, default=6.0)
    parser.add_argument('--bf16', default=False,
                        type=lambda v: str(v).lower() in ('1', 'true', 'yes'))
    parser.add_argument('--fuse-bn', action='store_true')
    parser.add_argument('--validate', action='store_true')
    parser.add_argument('--quantize', default=None, choices=['int8'],
                        help='export the int8 PTQ graph + .qtree.npz sidecar '
                             '(models/quantized.py)')
    parser.add_argument('--calibration-data', default=None,
                        help='transcript json for PTQ activation calibration')
    parser.add_argument('--calibration-batches', type=int, default=4)
    parser.add_argument('--calibration-percentile', type=float, default=100.0)
    parser.add_argument('--calibration-cache', default=None,
                        help='activation-scales .npz cache (see serve)')
    return parser


if __name__ == '__main__':
    main(build_parser().parse_args())
