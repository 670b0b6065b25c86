"""Profiling helpers — the TPU-native replacement for the reference's
nvprof/pyprof/autograd-profiler stack (benchmark.py:152-193,
scripts/nvprof2json.py).

`jax.profiler` already emits Perfetto/TensorBoard-compatible traces, so no
format converter is needed: `trace(...)` wraps a region, `annotate(...)`
names sub-regions (the NVTX equivalent), and the resulting trace directory
opens directly in ui.perfetto.dev or TensorBoard's profile plugin.
"""
import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Profile a region into `log_dir` (chrome-trace/perfetto compatible)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region visible in the trace (NVTX-range equivalent)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(sink: dict, key: str):
    """Wall-clock a region into sink[key] (the reference's per-iteration
    data/fwd/bwd split, train.py:799-806)."""
    tic = time.perf_counter()
    try:
        yield
    finally:
        sink[key] = time.perf_counter() - tic


def device_memory_stats() -> dict:
    """Per-device live memory (replacement for the CUDA fragmentation probes,
    utils.py:58-102)."""
    stats = {}
    for device in jax.local_devices():
        try:
            s = device.memory_stats()
            if s:
                stats[str(device)] = dict(
                    bytes_in_use=s.get('bytes_in_use', 0),
                    peak_bytes_in_use=s.get('peak_bytes_in_use', 0),
                    bytes_limit=s.get('bytes_limit', 0))
        except Exception:
            continue
    return stats
