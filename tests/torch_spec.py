"""Independent PyTorch spec-implementation of the JasperNet block structure.

Written from the reference's documented behavior (models.py:47-326) to serve
as a cross-implementation oracle for the Flax model: weights are copied from
Flax params into this model and outputs compared. NOT part of the framework —
test fixture only.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


def act(x, nonlinearity):
    kind = nonlinearity[0]
    if kind == 'relu':
        return F.relu(x)
    if kind == 'hardtanh':
        return torch.clamp(x, nonlinearity[1], nonlinearity[2])
    if kind == 'leaky_relu':
        return F.leaky_relu(x, nonlinearity[1])
    raise ValueError(kind)


class SpecConvSamePadding(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, dilation=1, groups=1, separable=False):
        super().__init__()
        pad = dilation * k // 2
        self.separable = separable
        if separable:
            self.depthwise = nn.Conv1d(in_ch, out_ch, k, stride=stride, padding=pad, groups=groups)
            self.pointwise = nn.Conv1d(out_ch, out_ch, 1, bias=False)
        else:
            self.conv = nn.Conv1d(in_ch, out_ch, k, stride=stride, padding=pad,
                                  dilation=dilation, groups=groups, bias=False)

    def forward(self, x):
        if self.separable:
            return self.pointwise(F.relu(self.depthwise(x)))
        return self.conv(x)


class SpecConvBn(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, dilation=1, groups=1, repeat=1,
                 separable=False, residual_channels=(), temporal_mask=True,
                 nonlinearity=('relu',)):
        super().__init__()
        self.convs = nn.ModuleList(
            SpecConvSamePadding(in_ch if i == 0 else out_ch, out_ch, k, stride=stride,
                                dilation=dilation, groups=groups, separable=separable)
            for i in range(repeat))
        self.bns = nn.ModuleList(nn.BatchNorm1d(out_ch) for _ in range(repeat))
        self.res_convs = nn.ModuleList(
            nn.Identity() if c is None else nn.Conv1d(c, out_ch, 1) for c in residual_channels)
        self.res_bns = nn.ModuleList(
            nn.Identity() if c is None else nn.BatchNorm1d(out_ch) for c in residual_channels)
        self.temporal_mask = temporal_mask
        self.nonlinearity = nonlinearity

    def forward(self, x, lengths_fraction=None, residual=()):
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            x = bn(conv(x))
            if i == len(self.convs) - 1:
                for rconv, rbn, r in zip(self.res_convs, self.res_bns, residual):
                    x = x + rbn(rconv(r))
            x = act(x, self.nonlinearity)
            if self.temporal_mask and lengths_fraction is not None:
                lengths = (lengths_fraction * x.shape[-1]).ceil().long()
                mask = torch.arange(x.shape[-1])[None, :] < lengths[:, None]
                x = x * mask[:, None, :]
        return x


class SpecJasperNet(nn.Module):
    """Backbone + decoder with the reference residual-list protocol
    (models.py:282-326), features-in (no frontend)."""

    def __init__(self, num_input_features, num_classes, plan, residual_mode,
                 temporal_mask=True, nonlinearity=('relu',), normalize_features=True,
                 norm_eps=6.103515625e-05):
        super().__init__()
        self.blocks = nn.ModuleList(
            SpecConvBn(in_ch, **kwargs, residual_channels=rc,
                       temporal_mask=temporal_mask, nonlinearity=nonlinearity)
            for in_ch, kwargs, rc in plan)
        self.decoder = nn.Conv1d(plan[-1][1]['out_ch'], num_classes[0], 1)
        self.residual_mode = residual_mode
        self.normalize_features = normalize_features
        self.norm_eps = norm_eps

    def forward(self, x, lengths_fraction=None):
        if self.normalize_features:
            if lengths_fraction is not None:
                lengths = (lengths_fraction * x.shape[-1]).ceil().long()
                mask = (torch.arange(x.shape[-1])[None, :] < lengths[:, None])[:, None, :].float()
                count = mask.sum(-1, keepdim=True)
                mean = (x * mask).sum(-1, keepdim=True) / count
                centered = (x - mean) * mask
                var = (centered * centered).sum(-1, keepdim=True) / count
                x = centered / (var + self.norm_eps).sqrt()
            else:
                mean = x.mean(-1, keepdim=True)
                centered = x - mean
                var = (centered * centered).mean(-1, keepdim=True)
                x = centered / (var + self.norm_eps).sqrt()
        residual = []
        num_epilogue = 2
        for i, block in enumerate(self.blocks):
            x = block(x, lengths_fraction=lengths_fraction, residual=residual)
            if i >= len(self.blocks) - num_epilogue - 1:
                residual = []
            elif self.residual_mode == 'dense':
                residual.append(x)
            elif self.residual_mode:
                residual = [x]
            else:
                residual = []
        logits = self.decoder(x)
        return logits
