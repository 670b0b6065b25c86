"""Small host-side utilities (spec: /root/reference/utils.py)."""
import gzip
import logging
import logging.handlers
import os
import random
import time

import numpy as np


def flatten(nested):
    """Flatten one level of nesting."""
    return [item for sub in nested for item in sub]


def open_maybe_gz(path, mode='rt'):
    return gzip.open(path, mode) if str(path).endswith('.gz') else open(path, mode)


def set_random_seed(seed: int):
    """Seed python/numpy RNGs (spec: utils.py:113-117). JAX keys are explicit."""
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass


def setup_logging(log_file_path=None, mode='a', level=logging.INFO, rank=0):
    """Root logger + optional rotating file sink (spec: utils.py:34-51)."""
    logging.basicConfig(level=level, format='%(asctime)s [%(levelname)s] %(name)s: %(message)s')
    logger = logging.getLogger()
    logger.setLevel(level if rank == 0 else logging.WARNING)
    if log_file_path:
        os.makedirs(os.path.dirname(log_file_path) or '.', exist_ok=True)
        handler = logging.handlers.RotatingFileHandler(
            log_file_path, mode=mode, maxBytes=100 * 1024 * 1024, backupCount=5)
        handler.setFormatter(logging.Formatter('%(asctime)s [%(levelname)s] %(name)s: %(message)s'))
        logger.addHandler(handler)
    return logger


def sparse_topk(x: np.ndarray, k: int, axis: int = -1, largest: bool = True,
                fill_value: float = 0.0) -> dict:
    """Save only the top-k entries along `axis` (spec: models.py:788-800 —
    used to store compact logits with --logits-topk)."""
    sign = -1 if largest else 1
    indices = np.argsort(sign * x, axis=axis)
    indices = np.take(indices, np.arange(k), axis=axis)
    values = np.take_along_axis(x, indices, axis=axis)
    return dict(k=k, axis=axis, largest=largest, shape=list(x.shape),
                dtype=str(x.dtype), fill_value=fill_value,
                indices=indices.astype(np.int32), values=values)


def sparse_topk_todense(saved: dict) -> np.ndarray:
    """Inverse of sparse_topk (spec: models.py:803-809)."""
    out = np.full(saved['shape'], saved['fill_value'], dtype=saved['dtype'])
    np.put_along_axis(out, saved['indices'].astype(np.int64), saved['values'],
                      axis=saved['axis'])
    return out


def select_device(device: str = None):
    """Force the JAX platform (spec: reference --device flag, train.py:994 /
    scripts/test.sh --device cpu).

    Must run before first backend use. Needed because this image's TPU plugin
    sets jax_platforms='axon,cpu' in jax.config, which OVERRIDES the
    JAX_PLATFORMS env var — so `JAX_PLATFORMS=cpu python -m ...` alone does
    not select CPU. Accepts 'cpu', 'tpu'/'axon', or None/'' (image default).
    """
    import jax
    if not device:
        device = os.environ.get('CONVASR_DEVICE', '')
    if not device:
        return
    platform = {'tpu': 'axon,cpu', 'axon': 'axon,cpu'}.get(device, device)
    jax.config.update('jax_platforms', platform)


def enable_compilation_cache(cache_dir: str = None):
    """Persistent XLA compilation cache — JasperNetBig compiles take tens of
    seconds; cache them across processes (the TPU analogue of
    cudnn.benchmark warmup amortization, benchmark.py:140)."""
    import jax
    # JAX_COMPILATION_CACHE_DIR wins: multi-process tests point each rank at
    # a FRESH cache so both ranks pay the same compile cost — a shared,
    # churned cache can give one rank a hit and the other a recompile, and
    # that >30 s skew blows Gloo's hardcoded first-collective rendezvous
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR') or cache_dir \
        or os.path.expanduser('~/.cache/convasr_tpu/xla')
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    return cache_dir


class Timer:
    def __enter__(self):
        self.begin = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.begin
