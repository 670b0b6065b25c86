"""Feature-space augmentation: SpecAugment time/frequency masking.

BASELINE.json lists "CTC training ... + SpecAugment-style masks" as a target
config. The reference has only a temporal-mask utility (models.py:617-619);
this adds the standard SpecAugment policy (Park et al. 2019) as a pure JAX
function over (B, T, C) log-mel features — shapes are static, masks are
generated with jax.random, so it jits cleanly inside the train step.
"""
import typing

import jax
import jax.numpy as jnp


def time_warp(features: jnp.ndarray, key: jax.Array, warp_width: int = 40) -> jnp.ndarray:
    """SpecAugment time warping (Park et al. 2019 §2 'time warping'): a random
    anchor frame w in [W, T-W) is shifted by d ~ U[-W, W]; frames are
    piecewise-linearly resampled on both sides. Fully jittable: the index map
    is computed per utterance and applied with a linear-interp gather."""
    B, T, C = features.shape
    if T <= 2 * warp_width:
        return features
    k1, k2 = jax.random.split(key)
    w = jax.random.randint(k1, (B,), warp_width, T - warp_width)    # anchor
    d = jax.random.randint(k2, (B,), -warp_width, warp_width + 1)   # shift
    w_new = (w + d).astype(jnp.float32)
    w = w.astype(jnp.float32)
    t = jnp.arange(T, dtype=jnp.float32)[None, :]                   # (1, T)
    # output frame t samples source position: [0, w_new] <- [0, w] linearly,
    # [w_new, T-1] <- [w, T-1] linearly
    left = t * (w / jnp.maximum(w_new, 1.0))[:, None]
    right = (w[:, None] + (t - w_new[:, None])
             * ((T - 1 - w) / jnp.maximum(T - 1 - w_new, 1.0))[:, None])
    src = jnp.where(t <= w_new[:, None], left, right)
    src = jnp.clip(src, 0.0, T - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    frac = (src - lo.astype(jnp.float32))[..., None]
    gathered_lo = jnp.take_along_axis(features, lo[..., None], axis=1)
    gathered_hi = jnp.take_along_axis(features, hi[..., None], axis=1)
    return gathered_lo * (1.0 - frac) + gathered_hi * frac


def spec_augment(features: jnp.ndarray, key: jax.Array,
                 num_time_masks: int = 2, time_mask_width: int = 50,
                 num_freq_masks: int = 2, freq_mask_width: int = 13,
                 mask_value: float = 0.0, time_warp_width: int = 0,
                 lengths: typing.Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Apply SpecAugment masks to (B, T, C) features.

    Each mask has a uniformly random width in [0, max_width] and a uniform
    random start; time-mask starts are bounded by per-utterance valid length
    when `lengths` (B,) is given.
    """
    B, T, C = features.shape
    keys = jax.random.split(key, 5)
    out = features

    if time_warp_width > 0:
        out = time_warp(out, keys[4], warp_width=time_warp_width)

    if num_time_masks > 0 and time_mask_width > 0:
        widths = jax.random.randint(keys[0], (B, num_time_masks), 0, time_mask_width + 1)
        max_start = (lengths[:, None] if lengths is not None else T) - widths
        starts = (jax.random.uniform(keys[1], (B, num_time_masks))
                  * jnp.maximum(max_start, 1)).astype(jnp.int32)
        t = jnp.arange(T)[None, :, None]                       # (1, T, 1)
        masked = (t >= starts[:, None, :]) & (t < (starts + widths)[:, None, :])
        out = jnp.where(masked.any(axis=-1)[:, :, None], mask_value, out)

    if num_freq_masks > 0 and freq_mask_width > 0:
        widths = jax.random.randint(keys[2], (B, num_freq_masks), 0, freq_mask_width + 1)
        starts = (jax.random.uniform(keys[3], (B, num_freq_masks))
                  * jnp.maximum(C - widths, 1)).astype(jnp.int32)
        f = jnp.arange(C)[None, :, None]
        masked = (f >= starts[:, None, :]) & (f < (starts + widths)[:, None, :])
        out = jnp.where(masked.any(axis=-1)[:, None, :], mask_value, out)
    return out
