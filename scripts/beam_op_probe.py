"""Micro-timing of the ops inside the device beam's scan step, on chip.

beam_device_probe.py showed the beam is COMPUTE-bound (~2.8 s for 601 steps
at B=256, K=16, N=8 — ~4.7 ms/step for (256, 160)-sized work). This probe
times a 601-step scan containing exactly ONE candidate op per program to
find which one eats the budget: argsort, top_k, segment scatters, gathers,
or plain elementwise carry.

Usage: python scripts/beam_op_probe.py [--B 256] [--M 160] [--steps 601]
NEVER run concurrently with another TPU program.
"""
import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--B', type=int, default=256)
    ap.add_argument('--M', type=int, default=160)
    ap.add_argument('--K', type=int, default=16)
    ap.add_argument('--steps', type=int, default=601)
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--device', default=None)
    args = ap.parse_args()

    from convasr_tpu.infra.utils import enable_compilation_cache, select_device
    select_device(args.device)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B, M, K, S = args.B, args.M, args.K, args.steps
    x0 = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randn(B, M).astype(np.float32)))
    np.asarray(x0[0, 0])

    def scan_of(op):
        def body(c, t):
            # mix in t so steps can't collapse; op must return (B, M)
            return op(c + t * 1e-6), None

        @jax.jit
        def run():
            out, _ = jax.lax.scan(body, x0, jnp.arange(S, dtype=jnp.float32))
            return jnp.sum(out)
        return run.lower().compile()

    def timeit(name, fn):
        np.asarray(fn())
        times = []
        for _ in range(args.iters):
            tic = time.perf_counter()
            np.asarray(fn())
            times.append(time.perf_counter() - tic)
        print(f'{name:40s} {np.median(times) * 1e3:9.1f} ms', flush=True)

    h0 = jax.device_put(jnp.asarray(
        np.random.RandomState(1).randint(0, 1 << 30, (B, M)), jnp.uint32))
    np.asarray(h0[0, 0])

    def elementwise(c):
        return c * 0.999 + jnp.tanh(c) * 1e-3

    def argsort_op(c):
        order = jnp.argsort(c, axis=-1)
        return jnp.take_along_axis(c, order, -1)

    def sort_op(c):
        return jnp.sort(c, axis=-1)

    def topk_op(c):
        vals, idx = jax.lax.top_k(c, K)
        return c.at[:, :K].set(vals)

    def iter_max_op(c):
        # K iterations of masked max — top-k without a sort
        out = c
        cur = c
        for _ in range(K):
            m = jnp.max(cur, axis=-1, keepdims=True)
            cur = jnp.where(cur == m, -1e30, cur)
        return out + 0.0 * cur

    def segsum_op(c):
        seg = (h0 % M).astype(jnp.int32)
        def one(v, s):
            return jax.ops.segment_sum(v, s, num_segments=M)
        return jax.vmap(one)(c, seg)

    def gather_op(c):
        idx = (h0 % M).astype(jnp.int32)
        return jnp.take_along_axis(c, idx, -1)

    def cumsum_op(c):
        return jnp.cumsum(c, axis=-1)

    def dense_merge_op(c):
        # sort-free merge: (B, M, M) equality matrix + masked logsumexp
        h = (h0 + (c[:, :1] * 0).astype(jnp.uint32))  # keep c live
        same = h[:, :, None] == h[:, None, :]
        mv = jnp.where(same, c[:, None, :], -1e30)
        m = jnp.max(mv, axis=-1)
        out = m + jnp.log(jnp.sum(jnp.exp(mv - m[:, :, None]), -1))
        return out

    print(f'B={B} M={M} K={K} steps={S} iters={args.iters}')
    timeit('elementwise carry only', scan_of(elementwise))
    timeit('jnp.sort (values)', scan_of(sort_op))
    timeit('argsort + take_along_axis', scan_of(argsort_op))
    timeit('lax.top_k K=16', scan_of(topk_op))
    timeit('iterative masked max x16', scan_of(iter_max_op))
    timeit('vmapped segment_sum', scan_of(segsum_op))
    timeit('take_along_axis gather', scan_of(gather_op))
    timeit('cumsum', scan_of(cumsum_op))
    timeit('dense (B,M,M) merge logsumexp', scan_of(dense_merge_op))


if __name__ == '__main__':
    main()
