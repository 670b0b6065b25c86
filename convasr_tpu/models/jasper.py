"""JasperNet / Wav2Letter convolutional CTC acoustic models (Flax).

Behavior spec: /root/reference/models.py — ConvSamePadding models.py:47-77,
ConvBn1d models.py:80-151, JasperNet models.py:158-347, ResidualActivation
models.py:350-399, Decoder models.py:23-44.

TPU-first design decisions:
- channels-last (B, T, C) everywhere: the C axis maps onto the 128-wide lane
  dimension, and XLA lowers the 1-D convs to MXU matmuls;
- parameters live in fp32, conv/activation compute in a configurable dtype
  (bfloat16 by default on TPU), batch-norm statistics in fp32;
- the reference's "inplace"/invertible-residual machinery (models.py:376-433)
  is a CUDA memory optimization with no JAX equivalent needed — XLA
  rematerialization (`jax.checkpoint`) provides the same memory/compute trade;
  `inplace=True` configs therefore only switch the nonlinearity, as in the
  reference's JasperNetBigInplace (models.py:1432-1442);
- cross-replica (Sync) batch-norm is `axis_name='data'` on flax BatchNorm,
  replacing torch.nn.SyncBatchNorm (models.py:757-758).
"""
import typing

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.logmel import (
    LogFilterBankFrontend, compute_output_lengths, masked_instance_norm, temporal_mask,
)
from ..infra.shaping import check_xlen


def apply_nonlinearity(x, nonlinearity: typing.Tuple):
    kind = nonlinearity[0]
    if kind == 'relu':
        return jax.nn.relu(x)
    if kind == 'hardtanh':
        lo, hi = nonlinearity[1], nonlinearity[2]
        return jnp.clip(x, lo, hi)
    if kind == 'leaky_relu':
        return jax.nn.leaky_relu(x, negative_slope=nonlinearity[1])
    raise ValueError(f'unknown nonlinearity {kind}')


def _apply_temporal_mask(x, lengths_fraction):
    if lengths_fraction is None:
        return x
    lengths = compute_output_lengths(x.shape[1], lengths_fraction)
    return x * temporal_mask(x.shape[1], lengths)[:, :, None].astype(x.dtype)


class ConvSamePadding(nn.Module):
    """'Same'-ish padded 1-D conv; optionally depthwise-separable
    (depthwise conv -> relu -> pointwise conv), spec models.py:47-77."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    separable: bool = False
    use_bias: bool = False
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * self.kernel_size // 2
        if self.separable:
            assert self.dilation == 1
            x = nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,),
                        padding=[(pad, pad)], feature_group_count=self.groups,
                        use_bias=True, dtype=self.dtype, name='depthwise')(x)
            x = jax.nn.relu(x)
            x = nn.Conv(self.features, (1,), use_bias=self.use_bias,
                        dtype=self.dtype, name='pointwise')(x)
        else:
            x = nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,),
                        padding=[(pad, pad)], kernel_dilation=(self.dilation,),
                        feature_group_count=self.groups, use_bias=self.use_bias,
                        dtype=self.dtype, name='conv')(x)
        return x


class ConvBn(nn.Module):
    """[conv -> BN -> (residuals) -> activation -> dropout -> mask] x repeat.

    Residual inputs each pass through their own 1x1 conv + BN (or identity for
    the 'flat' topology); they are added before the activation on the LAST
    repeat only. Spec: models.py:80-139.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    groups: int = 1
    repeat: int = 1
    separable: bool = False
    num_channels_residual: typing.Tuple[typing.Optional[int], ...] = ()
    temporal_mask: bool = True
    nonlinearity: typing.Tuple = ('relu',)
    batch_norm_momentum: float = 0.1
    dtype: typing.Any = jnp.float32
    bn_axis_name: typing.Optional[str] = None

    def _bn(self, name):
        return nn.BatchNorm(momentum=1.0 - self.batch_norm_momentum, epsilon=1e-5,
                            dtype=jnp.float32, axis_name=self.bn_axis_name, name=name)

    @nn.compact
    def __call__(self, x, lengths_fraction=None, residual: typing.Sequence = (),
                 training: bool = False):
        assert len(residual) == len(self.num_channels_residual)
        for i in range(self.repeat):
            # the reference applies the stride at EVERY repeat (models.py:99-110)
            x = ConvSamePadding(self.out_channels, self.kernel_size,
                                stride=self.stride,
                                dilation=self.dilation, groups=self.groups,
                                separable=self.separable, use_bias=False,
                                dtype=self.dtype, name=f'conv{i}')(x)
            x = self._bn(f'bn{i}')(x, use_running_average=not training)
            if i == self.repeat - 1:
                for j, r in enumerate(residual):
                    if self.num_channels_residual[j] is None:
                        x = x + r.astype(x.dtype)
                    else:
                        r = nn.Conv(self.out_channels, (1,), use_bias=True,
                                    dtype=self.dtype, name=f'conv_residual{j}')(r)
                        r = self._bn(f'bn_residual{j}')(r, use_running_average=not training)
                        x = x + r
            x = apply_nonlinearity(x, self.nonlinearity)
            if self.dropout > 0 and training:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
            if self.temporal_mask:
                x = _apply_temporal_mask(x, lengths_fraction)
        return x


class Decoder(nn.Module):
    """CTC decoder head(s): 1x1 conv char head, optional 2-layer BPE head
    (spec: models.py:23-44)."""

    num_classes: typing.Tuple[int, ...]
    head_type: typing.Optional[str] = None  # None | 'bpe'
    dtype: typing.Any = jnp.float32
    bn_axis_name: typing.Optional[str] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        y0 = nn.Conv(self.num_classes[0], (1,), use_bias=True, dtype=self.dtype, name='head0')(x)
        if self.head_type is None:
            return (y0,)
        assert self.head_type == 'bpe'
        h = ConvBn(x.shape[-1], 15, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name='bpe_conv0')(x, training=training)
        h = ConvBn(self.num_classes[1], 15, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   name='bpe_conv1')(h, training=training)
        return (y0, h)


class JasperNet(nn.Module):
    """Stacked ConvBn blocks with plain/residual/dense topology + CTC heads.

    __call__(signal_or_features, xlen) -> dict(logits=[...], log_probs=[...],
    olen=[...]) with everything channels-last. `xlen` is the valid-length
    FRACTION of the padded time dim (collate convention, datasets.py:321-325).
    Spec: models.py:158-347.
    """

    num_input_features: int
    num_classes: typing.Tuple[int, ...]
    repeat: int = 3
    num_subblocks: int = 1
    dilation: int = 1
    residual: typing.Union[str, bool] = 'dense'  # 'dense' | 'flat' | True | False
    kernel_sizes: typing.Tuple[int, ...] = (11, 13, 17, 21, 25)
    kernel_size_prologue: int = 11
    kernel_size_epilogue: int = 29
    base_width: int = 128
    out_width_factors: typing.Tuple[int, ...] = (2, 3, 4, 5, 6)
    out_width_factors_large: typing.Tuple[int, int] = (7, 8)
    separable: bool = False
    groups: int = 1
    dropout: float = 0.0
    dropout_prologue: float = 0.2
    dropout_epilogue: float = 0.4
    dropouts: typing.Tuple[float, ...] = (0.2, 0.2, 0.2, 0.3, 0.3)
    temporal_mask: bool = True
    nonlinearity: typing.Tuple = ('relu',)
    stride1: int = 2
    stride2: int = 1
    decoder_type: typing.Optional[str] = None
    bpe_only: bool = False
    normalize_features: bool = True
    normalize_features_eps: float = float(np.finfo(np.float16).tiny)
    normalize_features_legacy: bool = True
    normalize_features_temporal_mask: bool = True
    # either the static log-mel frontend (dataclass, no params) or a learned
    # nn.Module frontend (wav2vec — params under variables['params']['frontend'])
    frontend: typing.Any = None
    # SpecAugment policy applied to (normalized) features in training:
    # (num_time_masks, time_mask_width, num_freq_masks, freq_mask_width);
    # None = off. Requires an 'augment' rng stream (train/loop.py passes it).
    spec_augment: typing.Optional[typing.Tuple[int, int, int, int]] = None
    dtype: typing.Any = jnp.float32
    bn_axis_name: typing.Optional[str] = None
    remat: bool = False  # rematerialize each block's activations in backward
    #                      (jax.checkpoint: trades FLOPs for HBM at big batch)

    def _block_plan(self):
        """Static plan of (kwargs, residual_indices) per backbone block."""
        dropout_prologue = self.dropout_prologue if self.dropout != 0 else 0
        dropout_epilogue = self.dropout_epilogue if self.dropout != 0 else 0
        dropouts = self.dropouts if self.dropout != 0 else tuple(0 for _ in self.dropouts)

        plan = []
        in_width = self.out_width_factors[0]
        plan.append(dict(kwargs=dict(out_channels=in_width * self.base_width,
                                     kernel_size=self.kernel_size_prologue,
                                     dropout=dropout_prologue, stride=self.stride1),
                         residual_channels=()))
        num_channels_residual: list = []
        for kernel_size, dropout, out_width in zip(self.kernel_sizes, dropouts, self.out_width_factors):
            for s in range(self.num_subblocks):
                out_ch = (out_width if s == self.num_subblocks - 1 else in_width) * self.base_width
                in_ch = in_width * self.base_width
                if self.residual == 'dense':
                    num_channels_residual.append(in_ch)
                elif self.residual == 'flat':
                    num_channels_residual = [None]
                elif self.residual:
                    num_channels_residual = [in_ch]
                else:
                    num_channels_residual = []
                plan.append(dict(kwargs=dict(out_channels=out_ch, kernel_size=kernel_size,
                                             dropout=dropout, repeat=self.repeat,
                                             separable=self.separable, groups=self.groups),
                                 residual_channels=tuple(num_channels_residual)))
            in_width = out_width
        plan.append(dict(kwargs=dict(out_channels=self.out_width_factors_large[0] * self.base_width,
                                     kernel_size=self.kernel_size_epilogue,
                                     dropout=dropout_epilogue, dilation=self.dilation),
                         residual_channels=()))
        plan.append(dict(kwargs=dict(out_channels=self.out_width_factors_large[1] * self.base_width,
                                     kernel_size=1, dropout=dropout_epilogue),
                         residual_channels=()))
        return plan

    @nn.compact
    def __call__(self, x, xlen=None, training: bool = False,
                 dither_key: typing.Optional[jax.Array] = None):
        num_epilogue = 2
        # xlen seam (SURVEY §7.3): (B,) float fraction, fails loudly otherwise
        check_xlen(xlen, x.shape[0])
        if self.frontend is not None:
            assert x.ndim == 2, 'frontend expects raw signal (B, T)'
            mask = None
            if xlen is not None:
                lengths = compute_output_lengths(x.shape[-1], xlen)
                mask = temporal_mask(x.shape[-1], lengths)
            if isinstance(self.frontend, nn.Module):
                # learned frontend (wav2vec): a SUBMODULE — its params live in
                # variables['params']['frontend'], never baked into the jit
                x = self.frontend(x, mask=mask)
            else:
                x = self.frontend(x, mask=mask, dither_key=dither_key)

        assert x.ndim == 3, 'features expected as (B, T, C)'
        if self.normalize_features:
            mask = None
            if self.normalize_features_temporal_mask and xlen is not None:
                lengths = compute_output_lengths(x.shape[1], xlen)
                mask = temporal_mask(x.shape[1], lengths)
            x = masked_instance_norm(x, mask=mask, eps=self.normalize_features_eps,
                                     legacy=self.normalize_features_legacy)
        if training and self.spec_augment is not None:
            from ..frontend.augment import spec_augment
            # (n_time_masks, time_width, n_freq_masks, freq_width[, warp_width])
            n_t, w_t, n_f, w_f, *rest = self.spec_augment
            lengths = compute_output_lengths(x.shape[1], xlen) if xlen is not None else None
            x = spec_augment(x, self.make_rng('augment'),
                             num_time_masks=n_t, time_mask_width=w_t,
                             num_freq_masks=n_f, freq_mask_width=w_f,
                             time_warp_width=rest[0] if rest else 0,
                             lengths=lengths)
        x = x.astype(self.dtype)

        plan = self._block_plan()
        # static argnums: lengths_fraction may be None and training is a bool —
        # both must stay out of the traced residuals under remat
        block_cls = nn.remat(ConvBn, static_argnums=(4,)) if self.remat else ConvBn
        residual: list = []
        for i, block in enumerate(plan):
            x = block_cls(temporal_mask=self.temporal_mask, nonlinearity=self.nonlinearity,
                          num_channels_residual=block['residual_channels'], dtype=self.dtype,
                          bn_axis_name=self.bn_axis_name, name=f'block{i}',
                          **block['kwargs'])(x, xlen, tuple(residual), training)
            if i >= len(plan) - num_epilogue - 1:  # drop residuals for epilogue
                residual = []
            elif self.residual == 'dense':
                residual.append(x)
            elif self.residual:
                residual = [x]
            else:
                residual = []

        logits = Decoder(self.num_classes, head_type=self.decoder_type, dtype=self.dtype,
                         bn_axis_name=self.bn_axis_name, name='decoder')(x, training=training)
        log_probs = [jax.nn.log_softmax(l.astype(jnp.float32), axis=-1) for l in logits]
        olen = [compute_output_lengths(l.shape[1], xlen) if xlen is not None
                else jnp.full((l.shape[0],), l.shape[1], dtype=jnp.int32) for l in logits]
        return dict(logits=list(logits), log_probs=log_probs, olen=olen)
