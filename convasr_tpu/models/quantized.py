"""Post-training int8 quantization (PTQ) for JasperNet inference.

Why: the v5e MXU runs int8 at 394 TOPS = 2x the bf16 peak (197 TFLOPs/s).
Measured on the hot JasperNetBig conv shape (B=256, T=304, 768ch, K=25;
scripts/int8_conv_probe.py, full-dataflow slope harness): XLA bf16 conv
183.9 TFLOPs/s vs XLA int8 conv -> int32 380.5 TOPS — 2.07x, straight
through `lax.conv_general_dilated` on int8 operands. (The round-1 "int8
gives no speedup" finding was an artifact of the DCE-distorted chain
harness; a weight-stationary Pallas int8 conv tops out at 323 TOPS and
loses to XLA, so there is no custom kernel here.)

Scheme (standard PTQ, cf. Jacob et al. 2017):
- batch-norm folded into conv weights/biases (inference only);
- weights per-OUT-CHANNEL symmetric int8 (absmax / 127);
- activations per-TENSOR symmetric int8, scales calibrated by running the
  folded fp32 graph over calibration batches and recording the absmax (or a
  percentile of |x|) at every requantization point;
- conv: int8 x int8 -> int32 (MXU), then the fused f32 epilogue
  `y * (s_in * s_w[c]) + b[c] (+ residuals) -> relu -> requant int8`; XLA
  fuses the epilogue into the conv, so HBM sees int8 tensors only.

Everything mirrors models/jasper.py inference semantics (reference behavior
models.py:80-151, 158-347): dense/flat/residual topologies, repeats,
grouped/separable convs (the depthwise half stays f32 — it is
bandwidth-bound, not MXU-bound), temporal masking, instance-norm frontend,
multi-head decoders. `mode='f32'` runs the same folded graph without
quantization — used for calibration, and as the parity oracle in tests.
"""
import typing

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.logmel import (
    compute_output_lengths, masked_instance_norm, temporal_mask,
)
from .jasper import apply_nonlinearity

BN_EPS = 1e-5


def _conv1d(x, w, stride=1, dilation=1, groups=1, out_dtype=jnp.float32):
    """Channels-last 1-D conv, reference padding (models.py:47-77 via
    jasper.ConvSamePadding: pad = dilation * K // 2 on both ends)."""
    K = w.shape[0]
    pad = dilation * K // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=('NWC', 'WIO', 'NWC'),
        preferred_element_type=out_dtype)


def _fold_bn(kernel, bn, conv_bias=None):
    """Fold inference batch-norm into conv weight/bias.
    kernel: (K, Cin/g, Cout); bn: dict(scale, bias, mean, var)."""
    s = bn['scale'] / np.sqrt(bn['var'] + BN_EPS)          # (Cout,)
    w = np.asarray(kernel, np.float32) * s
    b = bn['bias'] + ((conv_bias if conv_bias is not None else 0.0) - bn['mean']) * s
    return w.astype(np.float32), np.asarray(b, np.float32)


def _quantize_weight(w):
    """Per-out-channel symmetric int8. w: (K, Cin/g, Cout)."""
    sw = np.maximum(np.abs(w).max(axis=(0, 1)), 1e-12) / 127.0
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    return wq, sw.astype(np.float32)


def _requant(x, scale):
    """f32 -> int8 with the given per-tensor scale (fused into the producer)."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _bn_tree(variables, *path):
    p = variables['params']
    s = variables['batch_stats']
    for k in path:
        p, s = p[k], s[k]
    return dict(scale=np.asarray(p['scale'], np.float32),
                bias=np.asarray(p['bias'], np.float32),
                mean=np.asarray(s['mean'], np.float32),
                var=np.asarray(s['var'], np.float32))


def build_folded_layers(model, variables):
    """Execution-ordered {layer_name: dict(w f32, b f32, stride, dilation,
    groups)} with batch-norm folded in. Layer names:
      block{i}.conv{r}        main conv of repeat r   (+ .dw{r} for separable)
      block{i}.res{j}         dense/residual 1x1 conv j
      decoder.head0           char CTC head
      decoder.bpe{k}.conv0    optional BPE head convs
    """
    params = variables['params']
    layers = {}
    plan = model._block_plan()

    def add_convbn(layer_prefix, tree_prefix, kwargs):
        repeat = kwargs.get('repeat', 1)
        for r in range(repeat):
            conv_tree = params
            for k in tree_prefix + (f'conv{r}',):
                conv_tree = conv_tree[k]
            bn = _bn_tree(variables, *tree_prefix, f'bn{r}')
            if kwargs.get('separable'):
                # depthwise (+bias) stays float; BN folds into the pointwise
                layers[f'{layer_prefix}.dw{r}'] = dict(
                    w=np.asarray(conv_tree['depthwise']['kernel'], np.float32),
                    b=np.asarray(conv_tree['depthwise']['bias'], np.float32))
                w, b = _fold_bn(conv_tree['pointwise']['kernel'], bn)
                layers[f'{layer_prefix}.conv{r}'] = dict(w=w, b=b)
            else:
                w, b = _fold_bn(conv_tree['conv']['kernel'], bn)
                layers[f'{layer_prefix}.conv{r}'] = dict(w=w, b=b)

    for i, block in enumerate(plan):
        add_convbn(f'block{i}', (f'block{i}',), block['kwargs'])
        for j, ch in enumerate(block['residual_channels']):
            if ch is None:
                continue
            rt = params[f'block{i}'][f'conv_residual{j}']
            bn = _bn_tree(variables, f'block{i}', f'bn_residual{j}')
            w, b = _fold_bn(rt['kernel'], bn, conv_bias=np.asarray(rt['bias'], np.float32))
            layers[f'block{i}.res{j}'] = dict(w=w, b=b)

    head0 = params['decoder']['head0']
    layers['decoder.head0'] = dict(w=np.asarray(head0['kernel'], np.float32),
                                   b=np.asarray(head0['bias'], np.float32))
    if model.decoder_type == 'bpe':
        for k, (prefix, kw) in enumerate([
                ('bpe_conv0', dict(kernel_size=15)), ('bpe_conv1', dict(kernel_size=15))]):
            add_convbn(f'decoder.bpe{k}', ('decoder', prefix), kw)
    return layers


class _Recorder:
    """Collect-mode activation statistics: |x| percentile per tensor name."""

    def __init__(self, percentile):
        self.percentile = percentile
        self.stats = {}

    def observe(self, name, x):
        a = jnp.abs(x.astype(jnp.float32))
        v = (jnp.max(a) if self.percentile >= 100.0
             else jnp.percentile(a, self.percentile))
        self.stats[name] = jnp.maximum(self.stats[name], v) if name in self.stats else v


def _features(model, variables, x, xlen, act_dtype=jnp.float32):
    """Frontend + feature normalization, mirroring JasperNet.__call__
    (jasper.py:249-284, inference: no dither/SpecAugment)."""
    if model.frontend is not None and x.ndim == 2:
        mask = None
        if xlen is not None:
            lengths = compute_output_lengths(x.shape[-1], xlen)
            mask = temporal_mask(x.shape[-1], lengths)
        if hasattr(model.frontend, 'apply'):  # learned nn.Module frontend
            x = model.frontend.apply(
                {'params': variables['params']['frontend']}, x, mask=mask)
        else:
            x = model.frontend(x, mask=mask)
    if model.normalize_features:
        mask = None
        if model.normalize_features_temporal_mask and xlen is not None:
            lengths = compute_output_lengths(x.shape[1], xlen)
            mask = temporal_mask(x.shape[1], lengths)
        x = masked_instance_norm(x, mask=mask, eps=model.normalize_features_eps,
                                 legacy=model.normalize_features_legacy)
    return x.astype(act_dtype)


def _forward(model, layers, x, xlen, act_scales=None, recorder=None,
             variables=None, epilogue_dtype=jnp.float32):
    """Shared folded-graph forward. recorder set -> f32 collect mode;
    act_scales set -> int8 mode; neither -> plain folded f32 (parity oracle).

    epilogue_dtype (int8 mode): precision of the per-conv epilogue
    (scale+bias+residual+relu+requant). float32 is the accuracy-safe
    default; bfloat16 halves the epilogue's VPU/bandwidth footprint
    (measured on the v5e: see scripts/int8_amdahl_probe.py).
    """
    quant = act_scales is not None

    def observe(name, t):
        if recorder is not None:
            recorder.observe(name, t)

    def conv(name, t, t_scale, stride=1, dilation=1, groups=1):
        L = layers[name]
        if quant:
            y = _conv1d(t, L['wq'], stride, dilation, groups, out_dtype=jnp.int32)
            return (y.astype(epilogue_dtype)
                    * (t_scale * L['sw']).astype(epilogue_dtype)
                    + L['b'].astype(epilogue_dtype))
        return _conv1d(t, L['w'], stride, dilation, groups) + L['b']

    def mask_of(t):
        if not model.temporal_mask or xlen is None:
            return None
        lengths = compute_output_lengths(t.shape[1], xlen)
        return temporal_mask(t.shape[1], lengths)[:, :, None].astype(t.dtype)

    def scale_of(name):
        return act_scales[name] if quant else None

    x = _features(model, variables, x, xlen)
    observe('features', x)
    cur = _requant(x, act_scales['features']) if quant else x
    cur_scale = scale_of('features')

    plan = model._block_plan()
    num_epilogue = 2
    residual = []   # (tensor, scale, channels-or-None)

    def run_block(prefix, kwargs, block_residual=(), use_mask=True,
                  nonlinearity=None):
        nonlocal cur, cur_scale
        nonlinearity = nonlinearity or model.nonlinearity
        repeat = kwargs.get('repeat', 1)
        for r in range(repeat):
            t = cur
            if kwargs.get('separable'):
                tf = (t.astype(jnp.float32) * cur_scale) if quant else t
                tf = tf.astype(jnp.float32)  # depthwise half stays f32
                dw = layers[f'{prefix}.dw{r}']
                tf = jax.nn.relu(_conv1d(tf, dw['w'], kwargs.get('stride', 1),
                                         groups=kwargs.get('groups', 1)) + dw['b'])
                observe(f'{prefix}.dw{r}', tf)
                t = _requant(tf, act_scales[f'{prefix}.dw{r}']) if quant else tf
                t_scale = scale_of(f'{prefix}.dw{r}')
                y = conv(f'{prefix}.conv{r}', t, t_scale)  # pointwise 1x1
            else:
                # stride/dilation/groups apply at EVERY repeat (jasper.py:115)
                y = conv(f'{prefix}.conv{r}', t, cur_scale,
                         stride=kwargs.get('stride', 1),
                         dilation=kwargs.get('dilation', 1),
                         groups=kwargs.get('groups', 1))
            if r == repeat - 1:
                conv_idx = [j for j, (_, _, ch) in enumerate(block_residual)
                            if ch is not None]
                if quant and len(conv_idx) >= 2 \
                        and f'{prefix}.resfused' in layers:
                    # Dense-residual fusion: the j 1x1 convs collapse into
                    # ONE concat-GEMM with a deep contraction dim (see
                    # _fuse_residuals) — per-j epilogues become one.
                    L = layers[f'{prefix}.resfused']
                    rt_cat = jnp.concatenate(
                        [block_residual[j][0] for j in conv_idx], axis=-1)
                    yr = _conv1d(rt_cat, L['wq'], out_dtype=jnp.int32)
                    y = y + (yr.astype(epilogue_dtype)
                             * L['s'].astype(epilogue_dtype)
                             + L['b'].astype(epilogue_dtype))
                    conv_idx = []
                for j, (rt, rs, ch) in enumerate(block_residual):
                    if ch is None:   # 'flat' topology: raw add, no 1x1
                        y = y + (rt.astype(epilogue_dtype)
                                 * jnp.asarray(rs, epilogue_dtype)
                                 if quant else rt)
                    elif j in conv_idx:
                        y = y + conv(f'{prefix}.res{j}', rt, rs)
            y = apply_nonlinearity(y, nonlinearity)
            m = mask_of(y) if use_mask else None
            if m is not None:
                y = y * m
            observe(f'{prefix}.r{r}', y)
            cur_scale = scale_of(f'{prefix}.r{r}')
            cur = _requant(y, cur_scale) if quant else y

    for i, block in enumerate(plan):
        used = [residual[j] for j in range(len(block['residual_channels']))] \
            if block['residual_channels'] else []
        # 'flat' keeps channels=None markers aligned with residual tensors
        used = [(rt, rs, ch) for (rt, rs, _), ch
                in zip(used, block['residual_channels'])]
        run_block(f'block{i}', block['kwargs'], used)
        if i >= len(plan) - num_epilogue - 1:
            residual = []
        elif model.residual == 'dense':
            residual.append((cur, cur_scale, True))
        elif model.residual:
            residual = [(cur, cur_scale, True)]
        else:
            residual = []

    logits = [conv('decoder.head0', cur, cur_scale)]
    if model.decoder_type == 'bpe':
        # Decoder's ConvBn heads use default relu and get NO lengths
        # (jasper.py:154-157: called without lengths_fraction)
        for k in range(2):
            run_block(f'decoder.bpe{k}', dict(kernel_size=15),
                      use_mask=False, nonlinearity=('relu',))
        logits.append((cur.astype(jnp.float32) * cur_scale) if quant else cur)
    log_probs = [jax.nn.log_softmax(l.astype(jnp.float32), axis=-1) for l in logits]
    olen = [compute_output_lengths(l.shape[1], xlen) if xlen is not None
            else jnp.full((l.shape[0],), l.shape[1], dtype=jnp.int32) for l in logits]
    return dict(logits=logits, log_probs=log_probs, olen=olen)


def folded_apply(model, variables, x, xlen=None):
    """Folded fp32 forward — must match model.apply(training=False).
    The parity oracle for the quantized graph (tests/test_quantized.py)."""
    layers = build_folded_layers(model, variables)
    return _forward(model, layers, x, xlen, variables=variables)


def calibrate(model, variables, batches, percentile=100.0, layers=None):
    """Run the folded f32 graph over calibration batches, return
    {tensor_name: absmax-or-percentile} as float32 numpy scalars.

    The per-batch stats collection runs as ONE jitted program (an eager
    sweep of the full folded JasperNetBig took ~6 min per batch on a slow
    host core — a serving-startup cost); batches of the same shape reuse
    the compiled program, and the cross-batch max-reduce runs on the host."""
    layers = layers if layers is not None else build_folded_layers(model, variables)

    @jax.jit
    def batch_stats(layers, variables, x, xlen):
        rec = _Recorder(percentile)
        _forward(model, layers, x, xlen, recorder=rec, variables=variables)
        return rec.stats

    stats = {}
    for batch in batches:
        x, xlen = (batch['x'], batch.get('xlen')) if isinstance(batch, dict) else batch
        s = jax.device_get(batch_stats(
            layers, variables, jnp.asarray(x),
            xlen if xlen is None else jnp.asarray(xlen)))
        for k, v in s.items():
            stats[k] = max(stats.get(k, 0.0), float(v))
    return {k: np.float32(v) for k, v in stats.items()}


def save_act_scales(path, act_scales):
    """Persist calibrated activation scales (tiny: ~34 float32 scalars).
    Calibration runs the full folded graph — one compile per batch shape,
    which through the tunneled device costs MINUTES of remote-executable
    install per process (measured 305 s warm-cache) — so ship the scales
    with the checkpoint and pay it once per deployment."""
    np.savez(path, **{k: np.float32(v) for k, v in act_scales.items()})


def load_act_scales(path):
    with np.load(path) as z:
        return {k: np.float32(z[k]) for k in z.files}


def _fuse_residuals(model, layers, qlayers, act_scales):
    """Collapse each block's dense-residual 1x1 convs into ONE concat-GEMM.

    Measured motivation (scripts/int8_amdahl_probe.py / int8_shape_probe.py):
    JasperNetBig 'dense' runs 53 tiny K=1 int8 convs whose contraction dim
    (Cin=256..640) under-fills the MXU pipeline — they execute at ~45-65
    TOPS vs 380 on the K=11..29 shapes, costing most of the ~20 ms gap
    between the backbone and its analytic conv floor. Concatenating the j
    residual inputs along channels turns sum_j(rt_j @ W_j) into one GEMM
    with a j-times-deeper contraction.

    int8 wrinkle: each residual input rt_j carries its own per-tensor scale
    rs_j, which cannot be factored out after the int32 sum over the
    concatenated axis. Fix at quantize time: per output channel c pick the
    common product scale s[c] = max_j(rs_j * absmax_c(W_j) / 127) and
    requantize W_j with weight scale s[c] / rs_j (>= its natural scale, so
    values still fit int8). Residuals whose natural product scale is far
    below s[c] lose effective weight bits in proportion to how little they
    contribute to the output — WER-validated by the harness tests.
    """
    plan = model._block_plan()
    num_epilogue = 2
    res_names = []   # act_scales key of each pending residual tensor
    for i, block in enumerate(plan):
        kwargs = block['kwargs']
        chs = block['residual_channels'] or []
        idxs = [j for j, ch in enumerate(chs) if ch is not None]
        if len(idxs) >= 2:
            Ws = [layers[f'block{i}.res{j}']['w'] for j in idxs]
            rss = [float(act_scales[res_names[j]]) for j in idxs]
            s = np.maximum.reduce(
                [rs * np.maximum(np.abs(W).max(axis=(0, 1)), 1e-12) / 127.0
                 for W, rs in zip(Ws, rss)])                      # (Cout,)
            qlayers[f'block{i}.resfused'] = dict(
                wq=np.concatenate(
                    [np.clip(np.round(W / (s / rs)), -127, 127).astype(np.int8)
                     for W, rs in zip(Ws, rss)], axis=1),
                s=s.astype(np.float32),
                b=np.sum([layers[f'block{i}.res{j}']['b'] for j in idxs],
                         axis=0).astype(np.float32))
        out_name = f'block{i}.r{kwargs.get("repeat", 1) - 1}'
        if i >= len(plan) - num_epilogue - 1:
            res_names = []
        elif model.residual == 'dense':
            res_names.append(out_name)
        elif model.residual:
            res_names = [out_name]
        else:
            res_names = []


def quantize(model, variables, batches, percentile=100.0, act_scales=None):
    """PTQ: fold BN, quantize weights per-channel, calibrate activations.
    Returns a jit-friendly pytree to pass to quantized_apply. Pass
    `act_scales` (from load_act_scales) to skip calibration entirely."""
    layers = build_folded_layers(model, variables)
    stats = None if act_scales is not None else \
        calibrate(model, variables, batches, percentile, layers=layers)
    qlayers = {}
    for name, L in layers.items():
        if '.dw' in name:          # depthwise halves stay float
            entry = dict(L)
        else:
            wq, sw = _quantize_weight(L['w'])
            entry = dict(wq=wq, sw=sw, b=L['b'])
        qlayers[name] = entry
    if act_scales is None:
        act_scales = {k: np.float32(max(float(v), 1e-12) / 127.0)
                      for k, v in stats.items()}
    _fuse_residuals(model, layers, qlayers, act_scales)
    qtree = dict(layers=qlayers, act_scales=dict(act_scales))
    if 'frontend' in variables.get('params', {}):
        qtree['frontend_params'] = variables['params']['frontend']
    return qtree


def quantize_for_inference(model, variables, batches, percentile=100.0):
    """CLI entry: PTQ calibration on the SESSION device.

    Calibration is one jitted program per batch shape (see calibrate), so on
    the tunneled remote device it costs one dispatch + a ~34-scalar fetch per
    batch — milliseconds of device compute after the one-time compile. (It
    used to run eagerly pinned to the host CPU; XLA:CPU executes the folded
    NWC convs naively, which took 3-6 MINUTES per JasperNetBig batch on a
    1-core host — a serving-startup tax.) Pass `batches` as numpy (x: (B, T)
    signal or (B, T, C) features, matching what the model's forward accepts).
    """
    variables = jax.tree.map(np.asarray, variables)  # pull off-device once
    return quantize(model, variables, batches, percentile)


def quantize_cached(model, variables, batches, percentile=100.0,
                    cache_path=None):
    """quantize_for_inference with an on-disk activation-scales cache: if
    `cache_path` exists, calibration is skipped (startup in seconds); else
    calibrate and write it. The cache is only valid for the same checkpoint
    + calibration setup — delete it to recalibrate."""
    import os
    if cache_path and os.path.exists(cache_path):
        variables = jax.tree.map(np.asarray, variables)
        return quantize(model, variables, batches, percentile,
                        act_scales=load_act_scales(cache_path))
    assert batches is not None, \
        f'no calibration batches and no existing scales cache ({cache_path})'
    qtree = quantize_for_inference(model, variables, batches, percentile)
    if cache_path:
        save_act_scales(cache_path, qtree['act_scales'])
    return qtree


def save_qtree(path, qtree):
    """Persist a full quantized-inference tree (int8 weights, per-channel
    weight scales, biases, activation scales, optional frontend params) as
    one flat .npz — the sidecar of an int8 StableHLO export artifact."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(qtree)[0]:
        key = '/'.join(str(getattr(k, 'key', k)) for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_qtree(path):
    out = {}
    with np.load(path) as z:
        for key in z.files:
            node, parts = out, key.split('/')
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


def quantized_apply(model, qtree, x, xlen=None, epilogue_dtype=jnp.float32):
    """int8 inference forward. `qtree` from quantize(); jit over (x, xlen)
    with qtree as an ARGUMENT (never closed over — CLAUDE.md HTTP 413)."""
    from ..infra.shaping import check_xlen
    check_xlen(xlen, x.shape[0])
    variables = {'params': {'frontend': qtree['frontend_params']}} \
        if 'frontend_params' in qtree else None
    return _forward(model, qtree['layers'], x, xlen,
                    act_scales=qtree['act_scales'], variables=variables,
                    epilogue_dtype=epilogue_dtype)
