"""Optional wav2vec feature-extractor frontend.

Behavior spec: /root/reference/models.py:446-483 (Wav2VecFrontend): a fairseq
wav2vec model replaces the log-mel frontend (`--frontend-checkpoint`,
train.py:913); output channels must match the model's `num_input_features`.

The reference depends on fairseq (external, torch). The TPU-native equivalent
loads wav2vec conv feature-extractor weights converted to JAX; full fairseq
graph import is out of scope, so this module provides (a) the JAX conv
feature-extractor matching wav2vec's small architecture and (b) a torch
state-dict weight converter for the standard `wav2vec_small` layout.
"""
import typing

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# (dim, kernel, stride) of the standard wav2vec feature extractor
WAV2VEC_CONV_LAYERS = [(512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2),
                       (512, 4, 2), (512, 1, 1), (512, 1, 1)]


class Wav2VecFeatureExtractor(nn.Module):
    """Stacked strided 1-D convs with group-norm on the first layer,
    GELU activations — the wav2vec 2.0 feature encoder, channels-last."""

    conv_layers: typing.Tuple = tuple(WAV2VEC_CONV_LAYERS)
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, signal: jnp.ndarray) -> jnp.ndarray:
        x = signal[:, :, None].astype(self.dtype)  # (B, T, 1)
        for i, (dim, kernel, stride) in enumerate(self.conv_layers):
            x = nn.Conv(dim, (kernel,), strides=(stride,), use_bias=False,
                        dtype=self.dtype, name=f'conv{i}')(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=dim, dtype=jnp.float32, name='group_norm')(x)
            x = jax.nn.gelu(x)
        return x  # (B, frames, 512)


class Wav2VecFrontend:
    """Frontend adapter with the LogFilterBankFrontend call contract."""

    def __init__(self, out_channels: int, sample_rate: int, preemphasis: float = 0.0,
                 variables=None, conv_layers=tuple(WAV2VEC_CONV_LAYERS), **kwargs):
        assert out_channels == conv_layers[-1][0], \
            f'num_input_features must be {conv_layers[-1][0]} for this wav2vec config'
        self.sample_rate = sample_rate
        self.preemphasis = preemphasis
        self.module = Wav2VecFeatureExtractor(conv_layers=conv_layers)
        self.variables = variables
        self.hop_length = int(np.prod([s for _, _, s in conv_layers]))

    def init(self, key, example_signal):
        self.variables = self.module.init(key, example_signal)
        return self.variables

    def __call__(self, signal: jnp.ndarray, mask=None, dither_key=None) -> jnp.ndarray:
        assert self.variables is not None, 'call init() or load a converted checkpoint'
        x = signal
        if self.preemphasis > 0:
            x = jnp.concatenate([x[:, :1], x[:, 1:] - self.preemphasis * x[:, :-1]], axis=-1)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        return self.module.apply(self.variables, x)


def convert_fairseq_checkpoint(pt_path: str, conv_layers=tuple(WAV2VEC_CONV_LAYERS)):
    """Convert a fairseq wav2vec feature-extractor state dict to flax params.

    Expects keys `feature_extractor.conv_layers.{i}.0.weight` (torch conv
    (out, in, k)) and layer-0 group-norm weights.
    """
    import torch
    ckpt = torch.load(pt_path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model', ckpt)
    params: dict = {}
    for i in range(len(conv_layers)):
        for key in [f'feature_extractor.conv_layers.{i}.0.weight',
                    f'w2v_model.feature_extractor.conv_layers.{i}.0.weight']:
            if key in sd:
                w = np.asarray(sd[key])
                params[f'conv{i}'] = dict(kernel=w.transpose(2, 1, 0))
                break
    for gn_w, gn_b in [('feature_extractor.conv_layers.0.2.weight',
                        'feature_extractor.conv_layers.0.2.bias')]:
        if gn_w in sd:
            params['group_norm'] = dict(scale=np.asarray(sd[gn_w]),
                                        bias=np.asarray(sd[gn_b]))
    return {'params': params}
