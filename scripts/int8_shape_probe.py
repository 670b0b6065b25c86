"""Per-shape int8 conv throughput over the REAL JasperNetBig layer mix.

Companion to scripts/int8_amdahl_probe.py, which located the int8 forward's
20 ms overhead (vs the 380.5-TOPS analytic floor) INSIDE the convs
themselves (E1: bare shift-requant chain = full backbone; epilogue ~0.7 ms).
This probe times every distinct (K, Cin, Cout, dilation, T) conv shape the
model executes and reports each one's effective TOPS, so the slow shapes
(candidates: the K=1 residual 1x1s with small Cin, the dilated epilogue
convs) are identified by measurement, not guesswork.

Usage: python scripts/int8_shape_probe.py   (ALONE on the chip)

COST WARNING: this sweeps ~20 distinct shapes x 2 chain lengths = ~40 fresh
programs; each pays a remote-executable install that is seconds in a good
tunnel window and MINUTES in a bad one (gate with scripts/tunnel_probe.py
first). For the actionable question — how much of the gap a given graph
change recovers — prefer the whole-backbone ablations in
scripts/int8_amdahl_probe.py (3-4 programs, much bigger signal each).

Partial result from the one (bad-window-truncated) run, K=1 rows only,
8-iter chains so +-noise: the dense-residual 1x1s measured 0.2-0.5 ms each
(~45-65 TOPS vs 380.5 on the hot K>=11 shapes) -> motivated the
_fuse_residuals concat-GEMM in models/quantized.py.
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

B = 256
T_FEAT = 601     # frontend frames for 6 s @ 10 ms hop (+1)


def timed(fn, *args, reps=3):
    """Median of `reps` runs after one warmup (kills tunnel hiccups)."""
    np.asarray(fn(*args)).reshape(-1)[:1]
    ts = []
    for _ in range(reps):
        tic = time.perf_counter()
        np.asarray(fn(*args)).reshape(-1)[:1]
        ts.append(time.perf_counter() - tic)
    return sorted(ts)[len(ts) // 2]


def slope(make_chain, args, short, long):
    return (timed(make_chain(long), *args)
            - timed(make_chain(short), *args)) / (long - short)


def collect_shapes():
    """(K, Cin, Cout, stride, dilation, T_in, count) for every conv the
    quantized JasperNetBig backbone runs (mirrors quantized._forward)."""
    frontend = LogFilterBankFrontend(out_channels=64, sample_rate=8000,
                                     window_size=0.02, window_stride=0.01,
                                     dither=0.0)
    model = create_model('JasperNetBig', num_input_features=64,
                         num_classes=(38,), frontend=frontend,
                         dtype=jnp.bfloat16)
    plan = model._block_plan()
    x0 = jnp.zeros((1, 8000), jnp.float32)
    variables = jax.eval_shape(
        lambda: jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                    jnp.ones((1,), jnp.float32)))
    # kernel shapes from the abstract param tree
    params = variables['params']
    shapes = {}
    t_cur = T_FEAT
    residual_t = []
    for i, block in enumerate(plan):
        kw = block['kwargs']
        for r in range(kw.get('repeat', 1)):
            t_in = t_cur
            t_cur = -(-t_cur // kw.get('stride', 1))
            k = params[f'block{i}'][f'conv{r}']['conv']['kernel'].shape
            key = (k[0], k[1], k[2], kw.get('stride', 1),
                   kw.get('dilation', 1), t_in)
            shapes[key] = shapes.get(key, 0) + 1
        for j, ch in enumerate(block['residual_channels'] or []):
            if ch is not None:
                k = params[f'block{i}'][f'conv_residual{j}']['kernel'].shape
                key = (k[0], k[1], k[2], 1, 1, t_cur)
                shapes[key] = shapes.get(key, 0) + 1
    k = params['decoder']['head0']['kernel'].shape
    shapes[(k[0], k[1], k[2], 1, 1, t_cur)] = \
        shapes.get((k[0], k[1], k[2], 1, 1, t_cur), 0) + 1
    return shapes


def main():
    shapes = collect_shapes()
    rng = np.random.RandomState(0)
    total_measured, total_floor = 0.0, 0.0
    print(f'{"K":>3} {"Cin":>5} {"Cout":>5} {"s":>2} {"d":>2} {"T":>4} '
          f'{"n":>3} {"ms/conv":>8} {"TOPS":>6} {"sum ms":>7}')
    for (K, Cin, Cout, stride, dil, T), count in sorted(shapes.items()):
        x = jnp.asarray(
            rng.randint(-127, 128, size=(B, T, Cin)).astype(np.int8))
        w = jnp.asarray(
            rng.randint(-127, 128, size=(K, Cin, Cout)).astype(np.int8))

        def make(iters, K=K, stride=stride, dil=dil, x0=x):
            @jax.jit
            def f(x, w):
                def body(x, _):
                    y = Q._conv1d(x, w, stride, dil, out_dtype=jnp.int32)
                    # thread a full-output reduction back into the input
                    return jnp.clip(
                        x0 + (jnp.sum(y) % 3 - 1).astype(jnp.int8),
                        -127, 127), ()
                x, _ = jax.lax.scan(body, x, None, length=iters)
                return x[0, 0, :2]
            return f

        t_out = -(-T // stride)
        macs = B * t_out * K * Cin * Cout
        # chain long enough that the timed delta is >= ~60 ms of real work
        # even if the shape hits the analytic 380.5-TOPS floor (the r1 probe
        # used a fixed 8-iteration delta: noise >> signal on sub-ms convs)
        floor_per_iter = 2 * macs / 380.5e12
        extra = int(min(512, max(32, 0.06 / max(floor_per_iter, 1e-5))))
        per = slope(make, (x, w), short=8, long=8 + extra)
        tops = 2 * macs / per / 1e12
        total_measured += per * count
        total_floor += 2 * macs / 380.5e12 * count
        print(f'{K:>3} {Cin:>5} {Cout:>5} {stride:>2} {dil:>2} {T:>4} '
              f'{count:>3} {per * 1e3:8.2f} {tops:6.1f} '
              f'{per * count * 1e3:7.1f}')
    print(f'sum over layer mix: measured {total_measured * 1e3:.1f} ms vs '
          f'380.5-TOPS floor {total_floor * 1e3:.1f} ms '
          f'({total_measured / max(total_floor, 1e-12):.2f}x)')


if __name__ == '__main__':
    main()
