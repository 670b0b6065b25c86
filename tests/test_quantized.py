"""int8 PTQ path (models/quantized.py): BN-folded f32 graph must match the
flax model exactly; the int8 graph must track it closely (cosine + argmax).

The speed claim behind this path is measured on the chip
(scripts/int8_conv_probe.py: XLA int8 conv 380.5 TOPS vs bf16 183.9
TFLOPs/s); these tests pin the NUMERICS on the CPU mesh.
"""
import sys
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from test_model_parity import randomize_batch_stats

from convasr_tpu.models import quantized as q
from convasr_tpu.models.zoo import create_model

FEATURES, CLASSES = 16, 10


def build(name, **kw):
    kw.setdefault('num_classes', (CLASSES,))
    model = create_model(name, num_input_features=FEATURES,
                         dtype=jnp.float32, base_width=8,
                         normalize_features=True, **kw)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 96, FEATURES).astype(np.float32))
    xlen = jnp.asarray([1.0, 0.625], np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, xlen=xlen)
    variables = randomize_batch_stats(variables, jax.random.PRNGKey(1))
    return model, variables, x, xlen


@pytest.mark.parametrize('name,kw', [
    ('JasperNetBig', {}),                       # flagship: dense, subblocks=2
    ('JasperNet', {}),                          # temporal_mask=True path
    ('JasperNetSeparable', dict(groups=8)),     # depthwise+pointwise path
    ('JasperNetResidualBig', {}),               # plain residual topology
])
def test_folded_matches_model(name, kw):
    model, variables, x, xlen = build(name, **kw)
    want = model.apply(variables, x, xlen=xlen)
    got = q.folded_apply(model, variables, x, xlen=xlen)
    for w, g in zip(want['log_probs'], got['log_probs']):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-3, atol=1e-4)
    for w, g in zip(want['olen'], got['olen']):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_folded_matches_model_bpe_head():
    model, variables, x, xlen = build('JasperNetBig', decoder_type='bpe',
                                      num_classes=(CLASSES, 2 * CLASSES))
    want = model.apply(variables, x, xlen=xlen)
    got = q.folded_apply(model, variables, x, xlen=xlen)
    assert len(got['log_probs']) == 2
    for w, g in zip(want['log_probs'], got['log_probs']):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-3, atol=1e-4)


def test_int8_tracks_float():
    model, variables, x, xlen = build('JasperNetBig')
    qtree = q.quantize(model, variables, [dict(x=x, xlen=xlen)])
    want = model.apply(variables, x, xlen=xlen)['log_probs'][0]
    got = q.quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][0]
    w, g = np.asarray(want), np.asarray(got)
    cos = np.sum(w * g) / (np.linalg.norm(w) * np.linalg.norm(g) + 1e-9)
    assert cos > 0.99, cos
    agree = np.mean(w.argmax(-1) == g.argmax(-1))
    assert agree > 0.95, agree
    # weights really are int8 and convs run int8 x int8 -> int32
    assert qtree['layers']['block1.conv0']['wq'].dtype == np.int8


def test_int8_jits_and_scale_invariance():
    """quantized_apply must jit with qtree as an argument (not closed over)
    and produce identical results across jit/eager."""
    model, variables, x, xlen = build('JasperNetBig')
    qtree = q.quantize(model, variables, [dict(x=x, xlen=xlen)], percentile=99.9)
    eager = q.quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][0]
    jitted = jax.jit(lambda qt, x, xlen: q.quantized_apply(model, qt, x, xlen=xlen)[
        'log_probs'][0])(qtree, x, xlen)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                               rtol=1e-5, atol=1e-5)


def test_calibration_batches_widen_scales():
    """A louder calibration batch must produce >= activation scales."""
    model, variables, x, xlen = build('JasperNetBig')
    s1 = q.quantize(model, variables, [dict(x=x, xlen=xlen)])['act_scales']
    s2 = q.quantize(model, variables,
                    [dict(x=x, xlen=xlen), dict(x=5.0 * x, xlen=xlen)])['act_scales']
    assert all(s2[k] >= s1[k] - 1e-12 for k in s1)
    assert any(s2[k] > s1[k] for k in s1)


def test_act_scales_cache_roundtrip(tmp_path):
    """save/load_act_scales + quantize(act_scales=...) must reproduce the
    calibrated qtree bit-for-bit — the --calibration-cache contract that lets
    serving restarts skip the minutes-long calibration compile."""
    model, variables, x, xlen = build('JasperNetBig')
    calibrated = q.quantize(model, variables, [dict(x=x, xlen=xlen)])
    path = str(tmp_path / 'scales.npz')
    q.save_act_scales(path, calibrated['act_scales'])
    cached = q.quantize(model, variables, batches=None,
                        act_scales=q.load_act_scales(path))
    assert set(cached['act_scales']) == set(calibrated['act_scales'])
    for k in calibrated['act_scales']:
        assert cached['act_scales'][k] == calibrated['act_scales'][k], k
    a = q.quantized_apply(model, calibrated, x, xlen=xlen)['log_probs'][0]
    b = q.quantized_apply(model, cached, x, xlen=xlen)['log_probs'][0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_cached_writes_and_reads(tmp_path):
    """quantize_cached: first call calibrates + writes the cache, second call
    loads it (batches unused) and matches."""
    model, variables, x, xlen = build('JasperNetBig')
    path = str(tmp_path / 'scales.npz')
    first = q.quantize_cached(model, variables, [dict(x=x, xlen=xlen)],
                              cache_path=path)
    import os
    assert os.path.exists(path)
    second = q.quantize_cached(model, variables, batches=None, cache_path=path)
    for k in first['act_scales']:
        assert second['act_scales'][k] == first['act_scales'][k], k

def test_residual_fusion_matches_per_conv():
    """Dense-residual 1x1 convs collapse into one concat-GEMM at quantize
    time (_fuse_residuals; the int8 Amdahl fix — 53 tiny K=1 convs ran at
    ~45-65 TOPS standalone). The fused graph must track the per-conv int8
    graph closely and the f32 oracle as closely as the unfused one did."""
    model, variables, x, xlen = build('JasperNetBig')
    qtree = q.quantize(model, variables, [dict(x=x, xlen=xlen)])
    fused_names = [k for k in qtree['layers'] if k.endswith('.resfused')]
    assert fused_names, 'dense topology must produce fused residual entries'
    for k in fused_names:
        L = qtree['layers'][k]
        assert L['wq'].dtype == np.int8 and L['wq'].shape[0] == 1
        assert L['s'].shape == (L['wq'].shape[2],)   # per-out-channel scale
    # strip the fused entries -> the per-conv fallback path
    unfused = dict(qtree, layers={k: v for k, v in qtree['layers'].items()
                                  if not k.endswith('.resfused')})
    a = q.quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][0]
    b = q.quantized_apply(model, unfused, x, xlen=xlen)['log_probs'][0]
    a, b = np.asarray(a), np.asarray(b)
    cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.999, cos
    assert np.mean(a.argmax(-1) == b.argmax(-1)) > 0.99
    # and the fused int8 graph still tracks the float model
    want = np.asarray(model.apply(variables, x, xlen=xlen)['log_probs'][0])
    cos_f = np.sum(want * a) / (np.linalg.norm(want) * np.linalg.norm(a) + 1e-9)
    assert cos_f > 0.99, cos_f


def test_residual_fusion_qtree_roundtrip(tmp_path):
    """save_qtree/load_qtree must carry the fused entries; a legacy sidecar
    without them must still run (per-conv fallback)."""
    model, variables, x, xlen = build('JasperNetBig')
    qtree = q.quantize(model, variables, [dict(x=x, xlen=xlen)])
    path = str(tmp_path / 'q.npz')
    q.save_qtree(path, qtree)
    loaded = q.load_qtree(path)
    a = q.quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][0]
    b = q.quantized_apply(model, loaded, x, xlen=xlen)['log_probs'][0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_bpe_dual_head():
    """int8 graph with decoder_type='bpe': both heads quantized, both track
    the float model (reference dual-head decode, models.py:152-157)."""
    model, variables, x, xlen = build('JasperNetBig', decoder_type='bpe',
                                      num_classes=(CLASSES, 2 * CLASSES))
    qtree = q.quantize(model, variables, [dict(x=x, xlen=xlen)])
    want = model.apply(variables, x, xlen=xlen)['log_probs']
    got = q.quantized_apply(model, qtree, x, xlen=xlen)['log_probs']
    assert len(got) == 2
    for w, g in zip(want, got):
        w, g = np.asarray(w), np.asarray(g)
        cos = np.sum(w * g) / (np.linalg.norm(w) * np.linalg.norm(g) + 1e-9)
        assert cos > 0.98, cos
