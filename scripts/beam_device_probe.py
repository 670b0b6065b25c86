"""On-chip decomposition of the device beam search cost (hybrid decoder path).

The r4 benchmark measured fwd-int8+devbeam+lm at 1594 ms/batch (B=256/6s,
K=16) vs 75 ms for the int8 forward alone — this probe splits the remaining
~1.5 s into (a) device beam compute, (b) tunnel fetch of the (B, K, L)
hypothesis buffers, and times variants (scan unroll, smaller max_len, uint8
token fetch) to target the right optimization.

Methodology per CLAUDE.md: log_probs are PRE-STAGED on device (no upload in
the timed region); "compute-only" runs reduce every output to scalars (the
beam cannot be dead-code-eliminated — the sums consume all of it) so the
fetch is ~0; fetch variants pull the real buffers. Each timing is
median-of-iterations with a fetch to host (np.asarray) as the sync.

Usage: python scripts/beam_device_probe.py [--B 256] [--T 601] [--iters 5]
NEVER run concurrently with another TPU program.
"""
import argparse
import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--B', type=int, default=256)
    ap.add_argument('--T', type=int, default=601)
    ap.add_argument('--C', type=int, default=38)
    ap.add_argument('--K', type=int, default=16)
    ap.add_argument('--N', type=int, default=8)
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--device', default=None)
    args = ap.parse_args()

    from convasr_tpu.infra.utils import enable_compilation_cache, select_device
    select_device(args.device)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from convasr_tpu.ops.beam_device import beam_search_device

    rng = np.random.RandomState(0)
    # peaky-CTC-like logits: blank-dominated with sparse char spikes, so
    # hypothesis lengths resemble real speech (~T/10), not random walks
    logits = rng.randn(args.B, args.T, args.C).astype(np.float32)
    logits[..., -1] += 4.0
    spikes = rng.rand(args.B, args.T) < 0.12
    logits[..., :-1][spikes] += 8.0
    lp = jax.device_put(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = jax.device_put(jnp.full((args.B,), args.T, jnp.int32))
    np.asarray(lp[0, 0, 0])  # stage

    def timeit(name, fn, fetch):
        # warm (compile + one run)
        out = fn()
        _ = [np.asarray(o).reshape(-1)[:1] for o in jax.tree.leaves(out)]
        times = []
        for _ in range(args.iters):
            tic = time.perf_counter()
            out = fn()
            if fetch:
                got = [np.asarray(o) for o in jax.tree.leaves(out)]
                nbytes = sum(g.nbytes for g in got)
            else:
                _ = [np.asarray(o).reshape(-1)[:1]
                     for o in jax.tree.leaves(out)]
                nbytes = 0
            times.append(time.perf_counter() - tic)
        med = float(np.median(times))
        extra = f' fetch {nbytes / 1e6:.2f} MB' if fetch else ''
        print(f'{name:44s} {med * 1e3:9.1f} ms{extra}', flush=True)
        return med

    def beam(max_len, unroll=1):
        fn = functools.partial(beam_search_device, blank_id=args.C - 1,
                               beam_width=args.K, cutoff_top_n=args.N,
                               max_len=max_len, unroll=unroll)
        return jax.jit(lambda: fn(lp, lens)).lower().compile()

    def beam_sums(max_len, unroll=1):
        fn = functools.partial(beam_search_device, blank_id=args.C - 1,
                               beam_width=args.K, cutoff_top_n=args.N,
                               max_len=max_len, unroll=unroll)

        @jax.jit
        def run():
            toks, lens_o, scores = fn(lp, lens)
            return (jnp.sum(toks), jnp.sum(lens_o), jnp.sum(scores))
        return run.lower().compile()

    def beam_u8(max_len):
        fn = functools.partial(beam_search_device, blank_id=args.C - 1,
                               beam_width=args.K, cutoff_top_n=args.N,
                               max_len=max_len)

        @jax.jit
        def run():
            toks, lens_o, scores = fn(lp, lens)
            return (jnp.maximum(toks, 0).astype(jnp.uint8),
                    lens_o.astype(jnp.int16), scores.astype(jnp.float16))
        return run.lower().compile()

    L_full = args.T + 1
    print(f'B={args.B} T={args.T} C={args.C} K={args.K} N={args.N} '
          f'iters={args.iters}')
    timeit('compute-only (sum outputs), L=T+1', beam_sums(L_full), False)
    timeit('compute-only, L=128', beam_sums(128), False)
    timeit('compute-only, L=128, unroll=4', beam_sums(128, unroll=4), False)
    timeit('full fetch int32, L=T+1', beam(L_full), True)
    timeit('full fetch int32, L=128', beam(128), True)
    timeit('uint8 token fetch, L=128', beam_u8(128), True)


if __name__ == '__main__':
    main()
