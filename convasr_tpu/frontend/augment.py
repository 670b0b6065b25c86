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


def spec_augment(features: jnp.ndarray, key: jax.Array,
                 num_time_masks: int = 2, time_mask_width: int = 50,
                 num_freq_masks: int = 2, freq_mask_width: int = 13,
                 mask_value: float = 0.0,
                 lengths: typing.Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Apply SpecAugment masks to (B, T, C) features.

    Each mask has a uniformly random width in [0, max_width] and a uniform
    random start; time-mask starts are bounded by per-utterance valid length
    when `lengths` (B,) is given.
    """
    B, T, C = features.shape
    keys = jax.random.split(key, 4)
    out = features

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
