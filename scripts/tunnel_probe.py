"""Tunnel-health gate for latency benchmarks on the axon-tunneled TPU.

The host<->device link of this environment is a tunnel whose dispatch floor
(normally 26-31 ms) and upload bandwidth (8-120 MB/s) VARY over tens of
minutes (CLAUDE.md). Any latency benchmark taken in a degraded window is
fiction — run this first and only benchmark when the floor is sane.

Distinct buffers per iteration: repeated-content uploads through the tunnel
have measured unrealistically fast in some sessions (content caching), so a
reused buffer would overstate bandwidth.

Usage: python scripts/tunnel_probe.py [--mb 8] [--iters 5]
Exit code 1 if the tiny-dispatch floor exceeds 60 ms (degraded window).
"""
import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mb', type=int, default=8)
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--max-floor-ms', type=float, default=60.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    print('devices:', jax.devices())
    f = jax.jit(lambda x: x.sum())
    np.asarray(f(jnp.ones(4)))  # compile

    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        np.asarray(f(jnp.ones(4)))
        lat.append(time.perf_counter() - t0)
    floor = np.median(lat) * 1e3
    print(f'tiny dispatch+fetch floor: median {floor:.0f} ms '
          f'(min {min(lat) * 1e3:.0f}, max {max(lat) * 1e3:.0f})')

    n = args.mb * (1 << 20) // 4
    bufs = [np.random.randn(n).astype(np.float32) for _ in range(args.iters)]
    t0 = time.perf_counter()
    for b in bufs:
        np.asarray(f(jnp.asarray(b)))
    per = (time.perf_counter() - t0) / args.iters
    print(f'{args.mb} MB upload+dispatch+fetch: {per * 1e3:.0f} ms '
          f'-> {args.mb / per:.1f} MB/s')

    if floor > args.max_floor_ms:
        print(f'DEGRADED tunnel window (floor {floor:.0f} ms > '
              f'{args.max_floor_ms:.0f} ms) — do not record latency numbers now')
        return 1
    print('tunnel OK for latency benchmarking')
    return 0


if __name__ == '__main__':
    sys.exit(main())
