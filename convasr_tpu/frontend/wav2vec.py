"""Wav2vec (v1) frontend: conv feature extractor + CNN context aggregator.

Behavior spec: /root/reference/models.py:446-483 (Wav2VecFrontend): a fairseq
wav2vec-1.0 model replaces the log-mel frontend, selected via
`--frontend-checkpoint` (train.py:355-361, 913); the reference DEFAULTS to
`use_context_features=True`, i.e. features = feature_aggregator(
feature_extractor(signal)) (models.py:476-483).

TPU-native design: the frontend is a proper Flax module that becomes a
SUBMODULE of JasperNet (params live in variables['params']['frontend']) —
so weights are jit ARGUMENTS (never HLO constants), can be frozen or
finetuned with the rest of the model, and ride in our orbax checkpoints.
Fairseq itself is not a dependency: `convert_fairseq_checkpoint` maps a
fairseq wav2vec state_dict onto this module's params.

Architecture formulas follow fairseq's wav2vec v1 (the executable spec the
reference builds via Wav2VecModel.build_model):
- feature extractor: [Conv1d(bias=False) -> GroupNorm(1 group) -> ReLU] per
  layer (VALID padding), then log compression log(1 + |x|);
- aggregator: per layer [left replication-pad (ka+kb, 0) -> Conv1d(bias=False)
  -> GroupNorm(1) -> ReLU], residual skip (1x1 conv projection when channel
  counts differ) scaled by sqrt(residual_scale).
"""
import math
import typing

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# fairseq wav2vec v1 defaults: conv_feature_layers / conv_aggregator_layers
WAV2VEC_FEATURE_LAYERS = ((512, 10, 5), (512, 8, 4), (512, 4, 2),
                          (512, 4, 2), (512, 4, 2), (512, 1, 1))
WAV2VEC_AGGREGATOR_LAYERS = ((512, 3, 1),) * 9


class Wav2VecFeatureExtractor(nn.Module):
    """(B, T) signal -> (B, frames, C) raw features (wav2vec v1 encoder)."""

    conv_layers: typing.Tuple = WAV2VEC_FEATURE_LAYERS
    log_compression: bool = True
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, signal: jnp.ndarray) -> jnp.ndarray:
        x = signal[:, :, None].astype(self.dtype)  # (B, T, 1)
        for i, (dim, kernel, stride) in enumerate(self.conv_layers):
            x = nn.Conv(dim, (kernel,), strides=(stride,), padding='VALID',
                        use_bias=False, dtype=self.dtype, name=f'conv{i}')(x)
            x = nn.GroupNorm(num_groups=1, dtype=jnp.float32, name=f'norm{i}')(x)
            x = nn.relu(x)
        if self.log_compression:
            x = jnp.log1p(jnp.abs(x))
        return x


class Wav2VecAggregator(nn.Module):
    """(B, frames, C) -> (B, frames, C) context features (CNN aggregator)."""

    conv_layers: typing.Tuple = WAV2VEC_AGGREGATOR_LAYERS
    skip_connections: bool = True
    residual_scale: float = 0.5
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = math.sqrt(self.residual_scale)
        for i, (dim, kernel, stride) in enumerate(self.conv_layers):
            residual = x
            ka = kernel // 2
            kb = ka - 1 if kernel % 2 == 0 else ka
            h = jnp.pad(x, ((0, 0), (ka + kb, 0), (0, 0)), mode='edge')
            h = nn.Conv(dim, (kernel,), strides=(stride,), padding='VALID',
                        use_bias=False, dtype=self.dtype, name=f'conv{i}')(h)
            h = nn.GroupNorm(num_groups=1, dtype=jnp.float32, name=f'norm{i}')(h)
            h = nn.relu(h)
            if self.skip_connections:
                if residual.shape[-1] != dim:
                    residual = nn.Conv(dim, (1,), use_bias=False, dtype=self.dtype,
                                       name=f'residual_proj{i}')(residual)
                h = (h + residual) * scale
            x = h
        return x


class Wav2VecFrontend(nn.Module):
    """Frontend module with the LogFilterBankFrontend call contract.

    use_context_features=True (the reference default, models.py:447,476-483)
    runs the aggregator on top of the raw conv features.
    """

    out_channels: int = 512
    sample_rate: int = 8000
    preemphasis: float = 0.0
    use_context_features: bool = True
    feature_layers: typing.Tuple = WAV2VEC_FEATURE_LAYERS
    aggregator_layers: typing.Tuple = WAV2VEC_AGGREGATOR_LAYERS
    dtype: typing.Any = jnp.float32

    @property
    def hop_length(self):
        return int(np.prod([s for _, _, s in self.feature_layers]))

    @nn.compact
    def __call__(self, signal: jnp.ndarray, mask: typing.Optional[jnp.ndarray] = None,
                 dither_key=None) -> jnp.ndarray:
        out_dim = (self.aggregator_layers if self.use_context_features
                   else self.feature_layers)[-1][0]
        assert self.out_channels == out_dim, \
            f'num_input_features must be {out_dim} for this wav2vec config'
        x = signal
        if self.preemphasis > 0:
            x = jnp.concatenate([x[:, :1], x[:, 1:] - self.preemphasis * x[:, :-1]],
                                axis=-1)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        x = Wav2VecFeatureExtractor(conv_layers=self.feature_layers,
                                    dtype=self.dtype,
                                    name='feature_extractor')(x)
        if self.use_context_features:
            x = Wav2VecAggregator(conv_layers=self.aggregator_layers,
                                  dtype=self.dtype,
                                  name='feature_aggregator')(x)
        return x  # (B, frames, out_channels)


def convert_fairseq_checkpoint(pt_path_or_sd,
                               feature_layers=WAV2VEC_FEATURE_LAYERS,
                               aggregator_layers=WAV2VEC_AGGREGATOR_LAYERS) -> dict:
    """fairseq wav2vec v1 state_dict -> params subtree for Wav2VecFrontend.

    Key layout (fairseq wav2vec.py module structure, the reference loads it
    via frontend_checkpoint['model'], train.py:355-361):
      feature_extractor.conv_layers.{i}.0.weight          conv (out, in, k)
      feature_extractor.conv_layers.{i}.2.{weight,bias}   Fp32GroupNorm(1)
      feature_aggregator.conv_layers.{i}.1.weight         conv (after pad)
      feature_aggregator.conv_layers.{i}.3.{weight,bias}  norm
      feature_aggregator.residual_proj.{i}.weight         optional 1x1 conv
    Returns {'feature_extractor': ..., 'feature_aggregator': ...} to graft at
    params['frontend'].
    """
    if isinstance(pt_path_or_sd, dict):
        sd = pt_path_or_sd
    else:
        import torch
        ckpt = torch.load(pt_path_or_sd, map_location='cpu', weights_only=False)
        sd = ckpt.get('model', ckpt)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def conv_kernel(w):
        return w.transpose(2, 1, 0)  # (out, in, k) -> (k, in, out)

    extractor: dict = {}
    for i in range(len(feature_layers)):
        w = sd.get(f'feature_extractor.conv_layers.{i}.0.weight')
        if w is None:
            raise KeyError(f'feature_extractor.conv_layers.{i}.0.weight missing — '
                           'not a fairseq wav2vec v1 checkpoint?')
        extractor[f'conv{i}'] = dict(kernel=conv_kernel(w))
        gw = sd.get(f'feature_extractor.conv_layers.{i}.2.weight')
        gb = sd.get(f'feature_extractor.conv_layers.{i}.2.bias')
        if gw is not None:
            extractor[f'norm{i}'] = dict(scale=gw, bias=gb)

    aggregator: dict = {}
    for i in range(len(aggregator_layers)):
        w = sd.get(f'feature_aggregator.conv_layers.{i}.1.weight')
        if w is None:
            break  # extractor-only checkpoint (use_context_features=False)
        aggregator[f'conv{i}'] = dict(kernel=conv_kernel(w))
        gw = sd.get(f'feature_aggregator.conv_layers.{i}.3.weight')
        gb = sd.get(f'feature_aggregator.conv_layers.{i}.3.bias')
        if gw is not None:
            aggregator[f'norm{i}'] = dict(scale=gw, bias=gb)
        rp = sd.get(f'feature_aggregator.residual_proj.{i}.weight')
        if rp is not None:
            aggregator[f'residual_proj{i}'] = dict(kernel=conv_kernel(rp))

    out = {'feature_extractor': extractor}
    if aggregator:
        out['feature_aggregator'] = aggregator
    return out
