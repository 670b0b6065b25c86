"""Log-mel filterbank frontend, TPU-native.

Behavior spec: /root/reference/models.py:486-603 (LogFilterBankFrontend):
signal normalize -> preemphasis 0.97 -> optional dither -> reflect+zero pad of
(freq_cutoff-1) -> STFT (hann, center=False) -> power spectrum -> mel
filterbank -> +eps -> log.

TPU-first design: instead of an FFT op, the STFT is one strided convolution
against a window-scaled real DFT basis (the reference's ONNX-export
`stft_mode='conv'` path, models.py:548-561, is the natural TPU formulation:
XLA lowers it to im2col + a dense matmul on the MXU), and the mel projection
is a second dense matmul. Everything is channels-last (B, T, C) so the
feature dimension maps onto the 128-lane axis.

The mel matrix uses the Slaney-style formula of librosa.filters.mel
(models.py:521-523 builds it via librosa), reimplemented here in numpy.
"""
import dataclasses
import math
import typing

import jax
import jax.numpy as jnp
import numpy as np

from ..infra import shaping


def hz_to_mel(freq, htk: bool = False):
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = freq / f_sp
    with np.errstate(divide='ignore'):
        log_mels = min_log_mel + np.log(np.maximum(freq, 1e-30) / min_log_hz) / logstep
    return np.where(freq >= min_log_hz, log_mels, mels)


def mel_to_hz(mels, htk: bool = False):
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = f_sp * mels
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: typing.Optional[float] = None, htk: bool = False,
                   norm: str = 'slaney') -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, 1 + n_fft//2).

    Same formula as librosa.filters.mel (the reference bakes this matrix into
    a 1x1 conv, models.py:521-526).
    """
    if fmax is None:
        fmax = sample_rate / 2
    fftfreqs = np.linspace(0, sample_rate / 2, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == 'slaney':
        enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length if periodic else win_length - 1
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / max(n, 1))).astype(np.float32)


def make_window(name: str, win_length: int, periodic: bool = True) -> np.ndarray:
    """Window by torch name (spec: the reference resolves --window with
    getattr(torch, args.window), models.py:499 / train.py:417). Formulas match
    torch.{hann,hamming,blackman,bartlett}_window with periodic=True."""
    n = max(win_length if periodic else win_length - 1, 1)
    t = 2.0 * np.pi * np.arange(win_length) / n
    name = name.replace('_window', '')
    if name == 'hann':
        w = 0.5 - 0.5 * np.cos(t)
    elif name == 'hamming':
        w = 0.54 - 0.46 * np.cos(t)
    elif name == 'blackman':
        w = 0.42 - 0.5 * np.cos(t) + 0.08 * np.cos(2.0 * t)
    elif name == 'bartlett':
        x = np.arange(win_length) * 2.0 / n
        w = 1.0 - np.abs(x - 1.0)
    else:
        raise ValueError(f'unsupported window {name!r}; '
                         "use hann_window/hamming_window/blackman_window/bartlett_window")
    return w.astype(np.float32)


def stft_basis(n_fft: int, freq_cutoff: int, window: np.ndarray) -> np.ndarray:
    """Windowed real-DFT basis, shape (n_fft, 1, 2*freq_cutoff).

    Column k is cos(2πkn/n_fft)·w(n); column freq_cutoff+k is the -sin row.
    The window (length win_length <= n_fft) is zero-padded centered, matching
    torch.stft / librosa.util.pad_center (models.py:551-553).
    """
    n = np.arange(n_fft)[:, None]
    k = np.arange(freq_cutoff)[None, :]
    angle = 2.0 * np.pi * k * n / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)  # (n_fft, 2*fc)
    pad_left = (n_fft - len(window)) // 2
    padded_window = np.zeros(n_fft, dtype=np.float64)
    padded_window[pad_left:pad_left + len(window)] = window
    return (basis * padded_window[:, None]).astype(np.float32)[:, None, :]


def normalize_signal(signal: jnp.ndarray, dim: int = -1, eps: float = 1e-5,
                     denom_multiplier: float = 1.0) -> jnp.ndarray:
    """Peak-normalize each utterance (spec: models.py:684-686)."""
    signal_max = jnp.max(jnp.abs(signal), axis=dim, keepdims=True) + eps
    return signal / (signal_max * denom_multiplier)


def apply_dither(signal: jnp.ndarray, dither: float, key: typing.Optional[jax.Array]) -> jnp.ndarray:
    if dither > 0.0 and key is not None:
        return signal + dither * jax.random.normal(key, signal.shape, signal.dtype)
    return signal


def compute_output_lengths(out_time: int, lengths_fraction: typing.Optional[jnp.ndarray]):
    """ceil(fraction * T) as int32 (spec: models.py:611-614).

    Every xlen in the repo funnels through here, so this is the single
    choke-point check for the fraction convention (SURVEY §7.3): an integer
    dtype means absolute lengths were passed and fails loudly at trace time.
    """
    if lengths_fraction is None:
        return jnp.full((1,), out_time, dtype=jnp.int32)
    assert np.issubdtype(np.dtype(lengths_fraction.dtype), np.floating), \
        f'xlen dtype {lengths_fraction.dtype}: xlen is the valid FRACTION ' \
        f'of the padded time dim (float in (0, 1]), not absolute lengths'
    return jnp.ceil(lengths_fraction.astype(jnp.float32) * out_time).astype(jnp.int32)


def temporal_mask(out_time: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """(B, T) boolean mask of valid frames (spec: models.py:617-619)."""
    return jnp.arange(out_time)[None, :] < lengths[:, None]


@dataclasses.dataclass(frozen=True)
class LogFilterBankFrontend:
    """Jittable log-mel frontend: (B, T) signal -> (B, frames, n_mels) features.

    Defaults mirror models.py:486-504 (preemphasis 0.97, hann periodic window,
    eps = float16 tiny as the mel-energy floor).
    """

    out_channels: int
    sample_rate: int
    window_size: float
    window_stride: float
    window: str = 'hann_window'
    dither: float = 1e-5
    dither0: float = 0.0  # dithering BEFORE preemphasis (--dither0): the
    #                       reference parses it but its application is
    #                       commented out (models.py:571); implemented here
    preemphasis: float = 0.97
    eps: float = float(np.finfo(np.float16).tiny)
    normalize_signal_enabled: bool = True
    # denominator scale on peak normalization (reference
    # debug_short_long_records_normalize_signal_multiplier, models.py:499,570)
    normalize_signal_multiplier: float = 1.0
    window_periodic: bool = True

    @property
    def win_length(self):
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self):
        return int(self.window_stride * self.sample_rate)

    @property
    def nfft(self):
        return 2 ** math.ceil(math.log2(self.win_length))

    @property
    def freq_cutoff(self):
        return self.nfft // 2 + 1

    def num_frames(self, signal_len: int) -> int:
        # pad total is 2*(freq_cutoff-1) == nfft, so frames = T//hop + 1
        return (signal_len + 2 * (self.freq_cutoff - 1) - self.nfft) // self.hop_length + 1

    def _constants(self):
        window = make_window(self.window, self.win_length, periodic=self.window_periodic)
        basis = stft_basis(self.nfft, self.freq_cutoff, window)  # (nfft, 1, 2*fc)
        mel = mel_filterbank(self.sample_rate, self.nfft, self.out_channels,
                             fmin=0, fmax=int(self.sample_rate / 2)).T  # (fc, n_mels)
        return jnp.asarray(basis), jnp.asarray(mel)

    @shaping.shapecheck
    def __call__(self, signal: shaping.BT, mask: typing.Optional[shaping.BT] = None,
                 dither_key: typing.Optional[jax.Array] = None) -> jnp.ndarray:
        """signal: (B, T) float; mask: optional (B, T) valid-sample mask.
        @shapecheck enforces matching (B, T) across signal and mask."""
        basis, mel = self._constants()
        x = signal.astype(jnp.float32)
        if self.normalize_signal_enabled:
            x = normalize_signal(x, denom_multiplier=self.normalize_signal_multiplier)
        if self.dither0 > 0 and dither_key is not None:
            dither_key, key0 = jax.random.split(dither_key)
            x = apply_dither(x, self.dither0, key0)
        if self.preemphasis > 0:
            x = jnp.concatenate([x[:, :1], x[:, 1:] - self.preemphasis * x[:, :-1]], axis=-1)
        x = apply_dither(x, self.dither, dither_key)
        if mask is not None:
            x = x * mask.astype(x.dtype)

        pad = self.freq_cutoff - 1
        # reflect-pad on the left, zero-pad on the right (models.py:577-582)
        if pad < x.shape[1]:
            x = jnp.pad(x, ((0, 0), (pad, 0)), mode='reflect')
        else:
            x = jnp.pad(x, ((0, 0), (pad, 0)))
        x = jnp.pad(x, ((0, 0), (0, pad)))

        # STFT as one strided conv on the MXU: (B, T, 1) * (nfft, 1, 2*fc)
        spectrum = jax.lax.conv_general_dilated(
            x[:, :, None], basis,
            window_strides=(self.hop_length,), padding='VALID',
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.float32)  # (B, frames, 2*fc)
        re, im = spectrum[..., :self.freq_cutoff], spectrum[..., self.freq_cutoff:]
        power = re * re + im * im  # (B, frames, fc)
        log_mel = jnp.log(power @ mel + self.eps)  # (B, frames, n_mels)
        return log_mel


@shaping.shapecheck
def masked_instance_norm(x: shaping.BTC, mask: typing.Optional[shaping.BT] = None,
                         eps: float = float(np.finfo(np.float16).tiny),
                         legacy: bool = True) -> jnp.ndarray:
    """Per-utterance, per-channel normalization over time.

    Spec: models.py:688-719 (MaskedInstanceNorm1d). `legacy` uses the biased
    std with eps added to the variance BEFORE sqrt — required for WER parity.
    x: (B, T, C); mask: optional (B, T). Computation is fp32 (models.py:300).
    """
    x32 = x.astype(jnp.float32)
    if mask is None:
        # legacy and standard instance norm coincide here: biased variance,
        # eps added before the sqrt (models.py:694-712)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        centered = x32 - mean
        var = jnp.mean(centered * centered, axis=1, keepdims=True)
        return (centered / jnp.sqrt(var + eps)).astype(x.dtype)
    m = mask.astype(jnp.float32)[:, :, None]
    count = jnp.sum(m, axis=1, keepdims=True)
    mean = jnp.sum(x32 * m, axis=1, keepdims=True) / count
    centered = (x32 - mean) * m
    var = jnp.sum(centered * centered, axis=1, keepdims=True) / count
    return (centered / jnp.sqrt(var + eps)).astype(x.dtype)
