"""Amdahl decomposition of the int8 PTQ inference path (run ALONE on the chip).

Context: the int8 conv itself runs at 380.5 TOPS = 2.07x bf16 on the hot
shape (scripts/int8_conv_probe.py), but end-to-end transcribe RTF improved
only ~1.57x (10,314 bf16 -> ~16,250 int8, scripts/perf_probe.py). If ALL
model FLOPs rode the 380.5 TOPS path the fwd would take ~70 ms (B=256 6s)
instead of the measured ~94 ms — this probe locates the missing ~25 ms:

  A  full int8 fwd (frontend + instance-norm + quantized backbone + heads)
  B  backbone-only (pre-computed features in) — isolates frontend+IN
  C  frontend+IN only
  D  analytic floor: conv MACs / 380.5 TOPS, plus XLA cost-analysis FLOPs

Methodology per CLAUDE.md: chain iterations thread the FULL output back into
the input (no DCE), per-iteration time = slope between two chain lengths
(cancels the ~25-30 ms tunnel dispatch+fetch constant).

Usage: python scripts/int8_amdahl_probe.py [--quick]
  --quick: A/C/B/D only (skip E1/E2 — ~4 fewer program installs through
  the tunnel; their findings are recorded in CLAUDE.md: epilogue fully
  fused at 0.7 ms, bf16 epilogue a regression).

Measured 2026-08-18 (pre-residual-fusion): A 92.9 ms (RTF 16,538), C 0.4,
B 92.5, D floor 71.5, E1 91.9 (epilogue 0.7), E2 132.3 (bf16 worse).
Post-residual-fusion clean-window re-measure (idle host, 33 ms floor):
A 74.0 (RTF 20,746), B 73.0, C 0.9, floor 71.5 -> overhead 1.6 ms total,
366.3 effective TOPS by XLA cost analysis.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from convasr_tpu.infra.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from convasr_tpu.frontend.logmel import LogFilterBankFrontend
from convasr_tpu.models import quantized as Q
from convasr_tpu.models.zoo import create_model

B, SR, DUR = 256, 8000, 6.0
T = int(SR * DUR)
ROOT = pathlib.Path(__file__).resolve().parent.parent


def timed(fn, *args, reps=3):
    """Median of `reps` runs after one warmup (rides out tunnel hiccups —
    the dispatch floor swings 26->580 ms within a degraded window)."""
    np.asarray(fn(*args)).reshape(-1)[:1]
    ts = []
    for _ in range(reps):
        tic = time.perf_counter()
        np.asarray(fn(*args)).reshape(-1)[:1]
        ts.append(time.perf_counter() - tic)
    return sorted(ts)[len(ts) // 2]


def slope(make_chain, args, short=4, long=20):
    return (timed(make_chain(long), *args)
            - timed(make_chain(short), *args)) / (long - short)


def main():
    frontend = LogFilterBankFrontend(out_channels=64, sample_rate=SR,
                                     window_size=0.02, window_stride=0.01,
                                     dither=0.0)
    model = create_model('JasperNetBig', num_input_features=64,
                         num_classes=(38,), frontend=frontend,
                         dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
    xlen = jnp.ones((B,), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, xlen)
    qtree = jax.device_put(Q.quantize(
        model, jax.tree.map(np.asarray, variables), batches=None,
        act_scales=Q.load_act_scales(str(ROOT / 'data' / 'bench_act_scales.npz'))))

    # ---- A: full int8 forward ------------------------------------------
    def make_full(iters):
        @jax.jit
        def f(qtree, x, xlen):
            def body(x, _):
                lp = Q.quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][0]
                return x * (1.0 + 1e-3 * jnp.mean(lp).astype(jnp.float32)), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x[0, :2]
        return f

    per_a = slope(make_full, (qtree, x, xlen))
    print(f'A full int8 fwd     : {per_a * 1e3:7.1f} ms  '
          f'(device RTF {B * DUR / per_a:.0f})')

    # ---- C: frontend + instance norm only ------------------------------
    def make_feat(iters):
        @jax.jit
        def f(variables, x, xlen):
            def body(x, _):
                ft = Q._features(model, variables, x, xlen)
                return x * (1.0 + 1e-3 * jnp.mean(ft)), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x[0, :2]
        return f

    variables_dev = jax.device_put(variables)
    per_c = slope(make_feat, (variables_dev, x, xlen))
    print(f'C frontend+IN only  : {per_c * 1e3:7.1f} ms  '
          f'({per_c / per_a:.1%} of A)')

    # ---- B: backbone-only (features in) --------------------------------
    feats = jax.jit(lambda v, x, xlen: Q._features(model, v, x, xlen))(
        variables_dev, x, xlen)
    print(f'features shape: {feats.shape}')

    def make_backbone(iters):
        @jax.jit
        def f(qtree, ft, xlen):
            def body(ft, _):
                lp = Q.quantized_apply(model, qtree, ft, xlen=xlen)['log_probs'][0]
                return ft * (1.0 + 1e-3 * jnp.mean(lp).astype(jnp.float32)), ()
            ft, _ = jax.lax.scan(body, ft, None, length=iters)
            return ft[0, 0, :2]
        return f

    per_b = slope(make_backbone, (qtree, feats, xlen))
    print(f'B backbone(+IN) only: {per_b * 1e3:7.1f} ms  '
          f'({per_b / per_a:.1%} of A; A-B = frontend {1e3 * (per_a - per_b):.1f} ms)')

    # ---- D: analytic conv floor ----------------------------------------
    layers = Q.build_folded_layers(model, jax.tree.map(np.asarray, variables))
    plan = model._block_plan()
    # output frames after the stride-2 first block: features T' then T'//2
    t_feat = feats.shape[1]
    macs = 0
    t_cur = t_feat
    for i, block in enumerate(plan):
        kw = block['kwargs']
        for r in range(kw.get('repeat', 1)):
            # stride applies at every repeat (jasper.py:115); JasperNetBig
            # has stride 2 only in block 0 (repeat 1)
            t_cur = -(-t_cur // kw.get('stride', 1))
            w = layers[f'block{i}.conv{r}']['w']
            macs += B * t_cur * w.shape[0] * w.shape[1] * w.shape[2]
        for j, ch in enumerate(block['residual_channels'] or []):
            if ch is not None:
                w = layers[f'block{i}.res{j}']['w']
                macs += B * t_cur * w.shape[0] * w.shape[1] * w.shape[2]
    w = layers['decoder.head0']['w']
    macs += B * t_cur * w.shape[0] * w.shape[1] * w.shape[2]
    floor = 2 * macs / 380.5e12
    print(f'D conv floor        : {floor * 1e3:7.1f} ms  '
          f'(2x{macs / 1e12:.2f} TMAC @ 380.5 TOPS; overhead A-C-D = '
          f'{1e3 * (per_a - per_c - floor):.1f} ms)')

    # XLA's own FLOP count of the backbone program for cross-check
    comp = jax.jit(lambda qtree, ft, xlen: Q.quantized_apply(
        model, qtree, ft, xlen=xlen)['log_probs'][0]) \
        .lower(qtree, feats, xlen).compile()
    fl = comp.cost_analysis().get('flops', 0.0)
    print(f'XLA cost-analysis backbone flops: {fl / 1e12:.2f} T '
          f'-> {fl / per_b / 1e12:.1f} Tflops/s effective')

    if '--quick' in sys.argv:
        return

    # ---- E1: same conv sequence, trivial shift-requant epilogue ---------
    # Isolates shape inefficiency (E1 - D) from epilogue cost (B - E1):
    # the real epilogue is f32 scale+bias+residual-adds+relu+requant; this
    # one is a bare `clip(y >> 7)` so anything above the analytic floor here
    # is the conv shapes themselves, not the epilogue.
    wq_tree = {k: v['wq'] for k, v in qtree['layers'].items() if 'wq' in v}

    def conv_only(wq_tree, t):
        residual = []
        num_epilogue = 2

        def requant(y):
            return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

        cur = t
        for i, block in enumerate(plan):
            kw = block['kwargs']
            for r in range(kw.get('repeat', 1)):
                y = Q._conv1d(cur, wq_tree[f'block{i}.conv{r}'],
                              kw.get('stride', 1), kw.get('dilation', 1),
                              kw.get('groups', 1), out_dtype=jnp.int32)
                if r == kw.get('repeat', 1) - 1:
                    for j, ch in enumerate(block['residual_channels'] or []):
                        if ch is not None:
                            y = y + Q._conv1d(residual[j], wq_tree[f'block{i}.res{j}'],
                                              out_dtype=jnp.int32)
                cur = requant(y)
            if i >= len(plan) - num_epilogue - 1:
                residual = []
            elif model.residual == 'dense':
                residual.append(cur)
            elif model.residual:
                residual = [cur]
        return Q._conv1d(cur, wq_tree['decoder.head0'], out_dtype=jnp.int32)

    q_feats = jnp.clip(jnp.round(feats / float(qtree['act_scales']['features'])),
                       -127, 127).astype(jnp.int8)

    def make_convonly(iters):
        @jax.jit
        def f(wq_tree, t):
            def body(t, _):
                out = conv_only(wq_tree, t)
                # feed a whole-output reduction back (no DCE)
                return jnp.clip(t + (jnp.sum(out) % 3 - 1).astype(jnp.int8),
                                -127, 127), ()
            t, _ = jax.lax.scan(body, t, None, length=iters)
            return t[0, 0, :2]
        return f

    per_e1 = slope(make_convonly, (jax.device_put(wq_tree), q_feats))
    print(f'E1 convs+shift-requant: {per_e1 * 1e3:5.1f} ms  '
          f'(shape inefficiency E1-D = {1e3 * (per_e1 - floor):.1f} ms; '
          f'epilogue cost B-E1 = {1e3 * (per_b - per_e1):.1f} ms)')

    # ---- E2: real backbone, bf16 epilogue ------------------------------
    def make_backbone_bf16(iters):
        @jax.jit
        def f(qtree, ft, xlen):
            def body(ft, _):
                lp = Q.quantized_apply(model, qtree, ft, xlen=xlen,
                                       epilogue_dtype=jnp.bfloat16)['log_probs'][0]
                return ft * (1.0 + 1e-3 * jnp.mean(lp).astype(jnp.float32)), ()
            ft, _ = jax.lax.scan(body, ft, None, length=iters)
            return ft[0, 0, :2]
        return f

    per_e2 = slope(make_backbone_bf16, (qtree, feats, xlen))
    print(f'E2 backbone bf16-epilogue: {per_e2 * 1e3:5.1f} ms  '
          f'(vs f32 {per_b * 1e3:.1f} ms)')


if __name__ == '__main__':
    main()
