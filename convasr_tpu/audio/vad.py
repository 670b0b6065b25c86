"""Voice activity detection + speech-mask utilities.

Behavior spec: /root/reference/vad.py — `detect_speech` returns a per-sample
boolean mask per channel; `upsample` resamples the mask onto the logit
timeline. The reference delegates frame classification to the webrtcvad C++
library; here the default is a self-contained adaptive-energy VAD (dual
threshold on frame log-energy vs a running noise floor, aggressiveness 0-3),
with webrtcvad used instead when the module is installed. The reference's
`postprocess_cut`/`postprocess_batching` are empty stubs (vad.py:28-42);
implemented here per their documented intent (merge close segments, drop
short ones, cap segment length).
"""
import typing

import numpy as np

try:
    import webrtcvad
except ImportError:
    webrtcvad = None


def _frame_energy_vad(channel: np.ndarray, sample_rate: int, frame_len: int,
                      aggressiveness: int) -> np.ndarray:
    n_frames = len(channel) // frame_len
    if n_frames == 0:
        return np.zeros(0, dtype=bool)
    frames = channel[:n_frames * frame_len].reshape(n_frames, frame_len)
    if frames.dtype != np.float32:
        frames = frames.astype(np.float32)
    # einsum: per-frame sum of squares without materializing frames**2
    # (hour-scale audio: this loop is on the host critical path of the
    # VAD-chunked long-audio pipeline)
    sumsq = np.einsum('ij,ij->i', frames, frames, dtype=np.float64)
    energy = 10 * np.log10(sumsq / frame_len + 1e-12)
    # noise floor: low percentile of frame energies; threshold scales with
    # aggressiveness (higher = stricter)
    floor = np.percentile(energy, 10)
    margin = [6.0, 9.0, 12.0, 15.0][int(np.clip(aggressiveness, 0, 3))]
    return energy > floor + margin


def detect_speech(signal: np.ndarray, sample_rate: int, window_size: float,
                  aggressiveness: int = 1, window_size_dilate: typing.Optional[float] = None,
                  backend: typing.Optional[str] = None,
                  neural_model=None) -> np.ndarray:
    """(C, T) float32 signal -> (C, T) boolean speech mask (spec: vad.py:12-25).

    backend: None (webrtcvad if installed, else energy), 'webrtcvad',
    'energy', or 'neural' (learned SAD, audio/neural_vad.py — the in-repo
    stand-in for the reference's pyannote SAD, diarization.py:36-45;
    requires neural_model=NeuralVADModel)."""
    signal = np.atleast_2d(np.asarray(signal))
    frame_len = int(window_size * sample_rate)
    if backend == 'neural':
        assert neural_model is not None, "backend='neural' needs neural_model"
        # the model frames at its own FRAME_SEC; re-frame to window_size
        sample_mask = neural_model.mask(signal, sample_rate)
        n_frames = signal.shape[1] // frame_len
        speech = sample_mask[:, :n_frames * frame_len] \
            .reshape(signal.shape[0], n_frames, frame_len).mean(-1) > 0.5
    else:
        use_webrtc = backend == 'webrtcvad' or (backend is None and webrtcvad is not None)
        masks = []
        for channel in signal:
            if use_webrtc and webrtcvad is not None:
                vad = webrtcvad.Vad(aggressiveness)
                int16 = (np.clip(channel, -1, 1) * 32767).astype('<i2')
                n_frames = len(int16) // frame_len
                frames = int16[:n_frames * frame_len].reshape(n_frames, frame_len)
                speech = np.asarray([vad.is_speech(f.tobytes(), sample_rate) for f in frames])
            else:
                speech = _frame_energy_vad(channel, sample_rate, frame_len, aggressiveness)
            masks.append(speech)
        speech = np.stack(masks) if masks else np.zeros((0, 0), bool)

    if window_size_dilate is not None and speech.size:
        # morphological dilation: max-pool with kernel window_size_dilate
        k = max(1, int(window_size_dilate / window_size))
        pad = k // 2
        padded = np.pad(speech, ((0, 0), (pad, pad)))
        windows = np.lib.stride_tricks.sliding_window_view(padded, k + (k % 2 == 0), axis=1)
        speech = windows.any(axis=-1)[:, :speech.shape[1]]

    # expand frame decisions back to sample resolution
    full = np.repeat(speech, frame_len, axis=1)
    out = np.zeros_like(signal, dtype=bool)
    n = min(full.shape[1], signal.shape[1])
    out[:, :n] = full[:, :n]
    return out


def mask_to_segments(mask: np.ndarray, sample_rate: int) -> typing.List[typing.Tuple[float, float]]:
    """1-D boolean mask -> [(begin_sec, end_sec)] runs of speech."""
    mask = np.asarray(mask, dtype=bool)
    if mask.size == 0:
        return []
    diff = np.diff(mask.astype(np.int8))
    starts = np.nonzero(diff == 1)[0] + 1
    ends = np.nonzero(diff == -1)[0] + 1
    if mask[0]:
        starts = np.concatenate([[0], starts])
    if mask[-1]:
        ends = np.concatenate([ends, [len(mask)]])
    return [(s / sample_rate, e / sample_rate) for s, e in zip(starts, ends)]


def postprocess_cut(segments: typing.List[typing.Tuple[float, float]],
                    merge_gap: float = 1.0, min_duration: float = 0.5,
                    expand: float = 0.1):
    """Merge segments closer than merge_gap, drop ones shorter than
    min_duration, expand boundaries by `expand` seconds (spec intent:
    vad.py:28-36)."""
    if not segments:
        return []
    segments = [(max(0.0, b - expand), e + expand) for b, e in segments]
    merged = [list(segments[0])]
    for b, e in segments[1:]:
        if b - merged[-1][1] < merge_gap:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([b, e])
    return [(b, e) for b, e in merged if e - b >= min_duration]


def postprocess_batching(segments: typing.List[typing.Tuple[float, float]],
                         max_duration: float = 20.0, expand: float = 0.5):
    """Expand segments and split any longer than max_duration (spec intent:
    vad.py:39-42)."""
    out = []
    for b, e in segments:
        b, e = max(0.0, b - expand), e + expand
        while e - b > max_duration:
            out.append((b, b + max_duration))
            b += max_duration
        out.append((b, e))
    return out


def upsample(speech: np.ndarray, out_time: int) -> np.ndarray:
    """Nearest-neighbor resample of (C, T) mask to (C, out_time) — maps the
    sample-domain mask onto the logit timeline (spec: vad.py:45-48)."""
    speech = np.atleast_2d(np.asarray(speech))
    idx = np.clip((np.arange(out_time) + 0.5) * speech.shape[1] / out_time, 0,
                  speech.shape[1] - 1).astype(np.int64)
    return speech[:, idx]
