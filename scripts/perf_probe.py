"""Honest device-throughput probes for the tunneled v5e (run ALONE on the chip).

Methodology (see CLAUDE.md): every chain iteration feeds its FULL output into
the next (no dead-code elimination possible), and the per-iteration time is
the slope between a short and a long chain, cancelling the ~25-30 ms tunnel
dispatch+fetch constant. Usage: python scripts/perf_probe.py

Round-2/3 measured results (v5e, bf16 peak = 197 TFLOPs/s, int8 peak = 394 TOPS):
  pure GEMM 4096^3                 181 TFLOPs/s  (92%)
  XLA conv B256 T304 768ch K25     185 TFLOPs/s  (94%)
  XLA int8 conv (same shape)       380.5 TOPS    (97% of int8 peak, 2.07x bf16
                                   -- scripts/int8_conv_probe.py; round 2's
                                   'int8 not reachable' was a harness artifact)
  FULL JasperNetBig fwd B256 T6s   179 TFLOPs/s  (91%)  -> device RTF 10314
  int8 PTQ JasperNetBig fwd        RTF 16216-16279 (models/quantized.py)
Conclusion: bf16 AND int8 are both at MXU speed-of-light through plain XLA
convs. The bf16 pallas research kernel (ops/conv1d_pallas.py, 169 TFLOPs/s =
below XLA) was retired in round 3 -- nothing a hand kernel can add when the
compiler path is at 94-97% of peak; history: git log tests/test_conv1d_pallas.py.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

from convasr_tpu.infra.utils import enable_compilation_cache

enable_compilation_cache()


def timed(fn, *args):
    np.asarray(fn(*args)).reshape(-1)[:1]
    tic = time.perf_counter()
    np.asarray(fn(*args)).reshape(-1)[:1]
    return time.perf_counter() - tic


def slope(make_chain, args, short=10, long=40):
    return (timed(make_chain(long), *args) - timed(make_chain(short), *args)) / (long - short)


def norm_feed(out):
    o = out.astype(jnp.float32)
    return (o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)).astype(jnp.bfloat16)


def gemm_chain(N):
    def make(iters):
        @jax.jit
        def f(a, b):
            def body(x, _):
                return norm_feed(jnp.dot(x, b, preferred_element_type=jnp.float32)), ()
            x, _ = jax.lax.scan(body, a, None, length=iters)
            return x[0, :2]
        return f
    rng = np.random.RandomState(0)
    a = jnp.asarray((rng.randn(N, N) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray((rng.randn(N, N) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    per = slope(make, (a, b))
    print(f'GEMM {N}^3 bf16: {2 * N**3 / per / 1e12:.1f} TFLOPs/s ({per*1e3:.2f} ms)')


def conv_chain(B=256, T=304, C=768, K=25):
    conv = (lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1,), 'SAME', dimension_numbers=('NWC', 'WIO', 'NWC'),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    def make(iters):
        @jax.jit
        def f(x, w):
            def body(x, _):
                return norm_feed(conv(x, w)), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x[0, 0, :2]
        return f
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(B, T, C) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(K, C, C) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
    per = slope(make, (x, w))
    fl = 2 * B * T * C * C * K
    print(f'XLA conv B{B} T{T} {C}ch K{K}: {fl / per / 1e12:.1f} TFLOPs/s '
          f'= {fl / per / 1e12 / 197 * 100:.0f}% of bf16 peak')


def model_chain(B=256, seconds=6.016):
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend
    from convasr_tpu.models.zoo import create_model
    frontend = LogFilterBankFrontend(out_channels=64, sample_rate=8000,
                                     window_size=0.02, window_stride=0.01, dither=0.0)
    model = create_model('JasperNetBig', num_input_features=64, num_classes=(38,),
                         frontend=frontend, dtype=jnp.bfloat16)
    T = int(seconds * 8000)
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(B, T) * 0.1).astype(np.float32))
    xlen = jnp.ones((B,), jnp.float32)
    variables = jax.device_put(jax.jit(model.init)(jax.random.PRNGKey(0), x[:1], xlen[:1]))
    flops = jax.jit(lambda v, x, xlen: model.apply(v, x, xlen=xlen)['log_probs'][0]) \
        .lower(variables, x, xlen).compile().cost_analysis().get('flops', 0.0)

    def make(iters):
        @jax.jit
        def f(v, x, xlen):
            def body(x, _):
                lp = model.apply(v, x, xlen=xlen)['log_probs'][0]
                return x * (1.0 + 1e-3 * jnp.mean(lp).astype(jnp.float32)), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x[0, :2]
        return f
    per = slope(make, (variables, x, xlen), short=3, long=9)
    print(f'FULL JasperNetBig fwd B{B} {seconds:.1f}s: {flops / per / 1e12:.1f} TFLOPs/s '
          f'= {flops / per / 1e12 / 197 * 100:.0f}% of bf16 peak | '
          f'device RTF {B * seconds / per:.0f} audio-s/s')


if __name__ == '__main__':
    gemm_chain(4096)
    conv_chain()
    model_chain()
