"""Diarization utilities: 2-channel speaker selection, DER/SER evaluation.

Behavior spec: /root/reference/diarization.py — select_speaker
(diarization.py:58-99: energy max-pool morphology + sign-of-difference
speaker decision on stereo calls), rle1d (models.py:777-785), speaker_mask /
speaker_error with permutation search (diarization.py:168-201), ref/hyp/eval
CLIs (diarization.py:246-282). The reference's pyannote/webrtcvad
dependencies are optional here: SAD falls back to the in-repo energy VAD and
DER is computed natively by speaker_error (the reference computed both and
printed them side by side).
"""
import argparse
import os

import numpy as np
import scipy.ndimage

from . import io as audio_io
from . import vad as vad_module
from ..data import transcripts


def rle1d(x: np.ndarray):
    """Run-length encode a 1-D array -> (starts, lengths, values)
    (spec: models.py:777-785)."""
    x = np.asarray(x)
    assert x.ndim == 1
    if x.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), x
    boundaries = np.concatenate([[0], np.nonzero(x[1:] != x[:-1])[0] + 1, [len(x)]])
    starts = boundaries[:-1]
    lengths = boundaries[1:] - boundaries[:-1]
    return starts, lengths, x[starts]


def _maxpool(x, k):
    return scipy.ndimage.maximum_filter1d(x, size=max(k, 1), axis=-1, mode='nearest')


def _avgpool(x, k):
    return scipy.ndimage.uniform_filter1d(x.astype(np.float64), size=max(k, 1),
                                          axis=-1, mode='constant')


def convert_speaker_id(speaker_id, to_bipole=False, from_bipole=False):
    k, b = (1 - 3 / 2, 3 / 2) if from_bipole else (-2, 3) if to_bipole else (None, None)
    return (speaker_id != 0) * (speaker_id * k + b)


def select_speaker(signal: np.ndarray, kernel_size_smooth_silence: int,
                   kernel_size_smooth_signal: int, kernel_size_smooth_speaker: int,
                   silence_absolute_threshold: float = 0.2,
                   silence_relative_threshold: float = 0.5, eps: float = 1e-9,
                   normalization_percentile: float = 0.9):
    """Stereo (2, T) signal -> (speaker_id_categorical (T,), masks (3, T)).

    Each channel carries one speaker (call-center recordings): smooth |x|
    (dilation for the energy difference; dilation+erosion for the silence
    detector), threshold silence absolutely and relative to a percentile
    normalizer, then the sign of the smoothed channel-energy difference picks
    the speaker. Spec: diarization.py:58-99.
    """
    signal = np.asarray(signal, dtype=np.float32)
    assert len(signal) == 2
    abs_sig = np.abs(signal)

    smoothed_for_diff = _maxpool(abs_sig, kernel_size_smooth_signal)
    smoothed_for_silence = _maxpool(abs_sig, kernel_size_smooth_silence)           # dilation
    smoothed_for_silence = -_maxpool(-smoothed_for_silence, kernel_size_smooth_silence)  # erosion

    k = int(normalization_percentile * smoothed_for_diff.shape[-1])
    signal_max = np.partition(smoothed_for_diff, k - 1, axis=-1)[:, k - 1:k]
    silence = (smoothed_for_silence < silence_absolute_threshold) | \
              (smoothed_for_silence / (eps + signal_max) < silence_relative_threshold)

    diff = smoothed_for_diff[0] - smoothed_for_diff[1]
    speaker_id_bipole = np.sign(diff)
    speaker_id_bipole = np.sign(_avgpool(speaker_id_bipole, kernel_size_smooth_speaker))
    # drop 1-sample zero crossings between same-sign runs
    absavg = _avgpool(np.abs(speaker_id_bipole), 3)
    rawavg = _avgpool(speaker_id_bipole, 3)
    speaker_id_bipole = np.where(
        (speaker_id_bipole == 0) & np.isclose(absavg, 2 / 3) & np.isclose(rawavg, 0),
        1.0, speaker_id_bipole)

    T = min(silence.shape[-1], speaker_id_bipole.shape[-1])
    silence, speaker_id_bipole = silence[:, :T], speaker_id_bipole[:T]
    silence_flat = silence.all(axis=0)
    speaker_id = (convert_speaker_id(speaker_id_bipole, from_bipole=True)
                  * ~silence_flat).astype(np.int64)
    bipole = np.array([1, -1])
    speaker_mask_ = (~silence) & (speaker_id_bipole[None, :] == bipole[:, None])
    return speaker_id, np.concatenate([silence_flat[None], speaker_mask_])


# ------------------- mono multi-speaker attribution -------------------
# The reference labels speakers on SINGLE-channel audio through an external
# pyannote pipeline (diarization.py:36-45) consumed by its hyp CLI
# (diarization.py:204+) and the transcribe speaker hack
# (transcribe.py:208-222). The in-repo stand-in: log band-energy frame
# features -> sliding-window mean/std embeddings over speech frames ->
# k-means (k-means++ init, restarts) into speaker clusters -> median-smoothed
# frame labels. Classic spectral-profile clustering — no external models.

_DIAR_FRAME_SEC = 0.02
_DIAR_BANDS = 24


def mono_speaker_features(signal: np.ndarray, sample_rate: int,
                          frame_sec: float = _DIAR_FRAME_SEC,
                          bands: int = _DIAR_BANDS) -> np.ndarray:
    """Mono (T,) float32 -> (frames, bands) log band energies (numpy sibling
    of neural_vad.featurize; un-normalized — callers normalize over speech
    frames only so silence doesn't pollute the statistics)."""
    from .neural_vad import _band_matrix
    frame = int(frame_sec * sample_rate)
    n = len(signal) // frame
    x = np.asarray(signal[:n * frame], np.float32).reshape(n, frame)
    spec = np.abs(np.fft.rfft(x, axis=-1)) ** 2
    return np.log(spec @ _band_matrix(frame // 2 + 1, bands) + 1e-8)


def _kmeans(x: np.ndarray, k: int, seed: int = 0, restarts: int = 10,
            iters: int = 50):
    """Plain Lloyd k-means with k-means++ init; returns (labels, inertia)."""
    rng = np.random.RandomState(seed)
    best = None
    for _ in range(restarts):
        centers = x[rng.randint(len(x))][None]
        for _ in range(k - 1):
            d2 = np.min(((x[:, None] - centers[None]) ** 2).sum(-1), axis=1)
            p = d2 / max(d2.sum(), 1e-12)
            centers = np.concatenate([centers, x[rng.choice(len(x), p=p)][None]])
        for _ in range(iters):
            d2 = ((x[:, None] - centers[None]) ** 2).sum(-1)
            labels = d2.argmin(1)
            new = np.stack([x[labels == j].mean(0) if (labels == j).any()
                            else centers[j] for j in range(k)])
            if np.allclose(new, centers):
                break
            centers = new
        inertia = float(((x - centers[labels]) ** 2).sum())
        if best is None or inertia < best[1]:
            best = (labels, inertia)
    return best


def diarize_mono(signal: np.ndarray, sample_rate: int, num_speakers: int = 2,
                 window_sec: float = 1.0, hop_sec: float = 0.25,
                 smooth_sec: float = 0.6, seed: int = 0,
                 vad_backend=None, neural_model=None,
                 vad_aggressiveness: int = 1,
                 merge_dist: float = 0.5) -> np.ndarray:
    """Mono signal (T,) -> per-sample speaker ids (0 = silence,
    1..num_speakers = speaker turns).

    SAD gates which frames participate; sliding windows of speech frames are
    embedded as [mean, std] of speech-normalized log band energies and
    k-means-clustered into speakers; per-frame labels are window-majority
    votes, median-smoothed over `smooth_sec`. Spec: the reference's pyannote
    speaker pipeline (diarization.py:36-45) — same contract (speaker-labeled
    turns on mono audio), in-repo implementation."""
    signal = np.asarray(signal, np.float32).reshape(-1)
    speech = vad_module.detect_speech(signal[None], sample_rate,
                                      _DIAR_FRAME_SEC,
                                      aggressiveness=vad_aggressiveness,
                                      backend=vad_backend,
                                      neural_model=neural_model)[0]
    feats = mono_speaker_features(signal, sample_rate)
    frame = int(_DIAR_FRAME_SEC * sample_rate)
    n = len(feats)
    frame_speech = speech[:n * frame].reshape(n, frame).mean(-1) > 0.5
    out = np.zeros(len(signal), np.int64)
    if frame_speech.sum() < 2:
        out[:n * frame] = np.repeat(frame_speech.astype(np.int64), frame)
        return out

    sf = feats[frame_speech]
    mu, sd = sf.mean(0, keepdims=True), sf.std(0, keepdims=True) + 1e-5
    norm = (feats - mu) / sd

    win = max(int(round(window_sec / _DIAR_FRAME_SEC)), 2)
    hop = max(int(round(hop_sec / _DIAR_FRAME_SEC)), 1)
    speech_idx = np.nonzero(frame_speech)[0]
    # windows slide over the SPEECH frame sequence (silence-gap-free), so an
    # embedding never mixes two speakers across a long pause
    starts = list(range(0, max(len(speech_idx) - win, 0) + 1, hop)) or [0]
    embs, spans = [], []
    for s in starts:
        idx = speech_idx[s:s + win]
        w = norm[idx]
        embs.append(np.concatenate([w.mean(0), w.std(0)]))
        spans.append(idx)
    embs = np.asarray(embs, np.float64)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True) + 1e-12

    if len(embs) <= num_speakers:
        frame_label = np.where(frame_speech, 1, 0)
    else:
        labels, _ = _kmeans(embs, num_speakers, seed=seed)
        # merge clusters whose centroids are close: k-means always splits
        # into k groups even for one voice; on L2-normalized embeddings an
        # inter-centroid distance below ~0.5 is within-speaker variation
        # (measured: same-voice splits land ~0.2, distinct synthetic
        # speakers ~1.2), so such clusters are one speaker
        while True:
            uniq = np.unique(labels)
            if len(uniq) <= 1:
                break
            cents = {j: embs[labels == j].mean(0) for j in uniq}
            pairs = [(np.linalg.norm(cents[a] - cents[b]), a, b)
                     for i, a in enumerate(uniq) for b in uniq[i + 1:]]
            dist, a, b = min(pairs)
            if dist >= merge_dist:
                break
            labels[labels == b] = a
        # stable ids: speakers numbered by first appearance
        remap = {}
        for lab in labels:
            if lab not in remap:
                remap[lab] = len(remap)
        labels = np.asarray([remap[lab] for lab in labels])
        votes = np.zeros((n, num_speakers), np.int64)
        for lab, idx in zip(labels, spans):
            votes[idx, lab] += 1
        frame_label = np.zeros(n, np.int64)
        covered = votes.sum(1) > 0
        frame_label[covered] = votes[covered].argmax(1) + 1
        # speech frames missed by windowing (tail) take the nearest label
        missing = frame_speech & ~covered
        if missing.any() and covered.any():
            cov_idx = np.nonzero(covered)[0]
            for i in np.nonzero(missing)[0]:
                frame_label[i] = frame_label[cov_idx[np.abs(cov_idx - i).argmin()]]
        # median smoothing over speech labels only (runs stay contiguous)
        k = max(int(round(smooth_sec / _DIAR_FRAME_SEC)) | 1, 1)
        on = np.nonzero(frame_label)[0]
        if len(on):
            sm = scipy.ndimage.median_filter(frame_label[on], size=k,
                                             mode='nearest')
            frame_label[on] = sm
        frame_label[~frame_speech] = 0
    out[:n * frame] = np.repeat(frame_label, frame)
    return out


def mono_speaker_transcript(signal: np.ndarray, sample_rate: int,
                            num_speakers: int = 2, extra: dict = {},
                            **kw) -> list:
    """Mono diarization -> speaker-turn segments (hyp-transcript shape)."""
    speaker_id = diarize_mono(signal, sample_rate,
                              num_speakers=num_speakers, **kw)
    transcript = []
    starts, lengths, values = rle1d(speaker_id)
    for begin, length, value in zip(starts, lengths, values):
        if value:
            transcript.append(dict(
                begin=float(begin) / sample_rate,
                end=float(begin + length) / sample_rate,
                speaker=int(value),
                speaker_name=transcripts.default_speaker_names[int(value)],
                **extra))
    return transcript


def speaker_mask(transcript, num_speakers: int, duration: float, sample_rate: int):
    mask = np.zeros((1 + num_speakers, int(duration * sample_rate)), dtype=bool)
    for t in transcript:
        mask[t['speaker'], int(t['begin'] * sample_rate):int(t['end'] * sample_rate)] = True
    mask[0] = mask[1] & mask[2]
    return mask


def speaker_error(ref, hyp, num_speakers: int, sample_rate: int = 8000,
                  hyp_speaker_mapping=None, ignore_silence_and_overlapped_speech=True):
    """Frame-level speaker error with best permutation (spec:
    diarization.py:175-201). Returns (error, best_permutation)."""
    assert num_speakers == 2
    duration = transcripts.compute_duration(dict(ref=ref, hyp=hyp))
    ref_mask = speaker_mask(ref, num_speakers, duration, sample_rate)
    hyp_mask_all = speaker_mask(hyp, num_speakers, duration, sample_rate)

    vals = []
    perms = [[0, 1, 2], [0, 2, 1]] if hyp_speaker_mapping is None else hyp_speaker_mapping
    for perm in perms:
        hyp_mask = hyp_mask_all[perm]
        mismatch = (ref_mask[1] != hyp_mask[1]) | (ref_mask[2] != hyp_mask[2])
        if ignore_silence_and_overlapped_speech:
            silence_or_overlap = ref_mask[1] == ref_mask[2]
            mismatch = mismatch[~silence_or_overlap]
        vals.append((float(mismatch.mean()) if mismatch.size else 0.0, perm))
    return min(vals)


def der(ref_transcript, hyp_transcript, sample_rate: int = 100) -> float:
    """Diarization error rate = (miss + false alarm + confusion) / ref speech,
    with the best speaker permutation (native replacement of
    pyannote.metrics, diarization.py:163-166)."""
    duration = transcripts.compute_duration(dict(ref=ref_transcript, hyp=hyp_transcript))
    ref_mask = speaker_mask(ref_transcript, 2, duration, sample_rate)
    hyp_mask_all = speaker_mask(hyp_transcript, 2, duration, sample_rate)
    best = None
    for perm in [[0, 1, 2], [0, 2, 1]]:
        hyp_mask = hyp_mask_all[perm]
        confusion = ((hyp_mask[1] & ref_mask[2] & ~ref_mask[1]) |
                     (hyp_mask[2] & ref_mask[1] & ~ref_mask[2])).sum()
        false_alarm = ((hyp_mask[1] | hyp_mask[2]) & ~ref_mask[1] & ~ref_mask[2]).sum()
        miss = (~hyp_mask[1] & ~hyp_mask[2] & (ref_mask[1] | ref_mask[2])).sum()
        total = (ref_mask[1] | ref_mask[2]).sum()
        err = (confusion + false_alarm + miss) / max(total, 1)
        best = err if best is None else min(best, err)
    return float(best)


def sad_transcript(signal: np.ndarray, sample_rate: int, window_size: float = 0.02,
                   aggressiveness: int = 1, extra: dict = {},
                   backend=None, neural_model=None):
    """Per-channel speech-activity segments (spec: WebrtcSpeechActivityDetection
    diarization.py:24-33; uses the in-repo VAD when webrtcvad is absent;
    backend='neural' + neural_model runs the learned SAD — the stand-in for
    the reference's pyannote pipeline, diarization.py:36-45)."""
    speech = vad_module.detect_speech(signal, sample_rate, window_size,
                                      aggressiveness=aggressiveness,
                                      backend=backend, neural_model=neural_model)
    transcript = []
    for channel in range(len(speech)):
        starts, lengths, values = rle1d(speech[channel])
        for begin, length, value in zip(starts, lengths, values):
            if value:
                transcript.append(dict(
                    begin=float(begin) / sample_rate,
                    end=float(begin + length) / sample_rate,
                    speaker=1 + channel,
                    speaker_name=transcripts.default_speaker_names[1 + channel], **extra))
    return transcript


# ------------------------------ CLIs ------------------------------

def cmd_ref(input_path, output_path, sample_rate, window_size, max_duration,
            debug_audio, html, ext, device=None):
    os.makedirs(output_path, exist_ok=True)
    sources = ([(input_path, n) for n in os.listdir(input_path)]
               if os.path.isdir(input_path)
               else [(os.path.dirname(input_path), os.path.basename(input_path))])
    for i, (dirname, audio_name) in enumerate(sources):
        print(i, '/', len(sources), audio_name)
        audio_path = os.path.join(dirname, audio_name)
        noext = audio_name[:-len(ext)] if ext and audio_name.endswith(ext) else audio_name
        signal, sr = audio_io.read_audio(audio_path, sample_rate=sample_rate,
                                         mono=False, duration=max_duration)
        speaker_id, masks = select_speaker(
            signal, silence_absolute_threshold=0.05, silence_relative_threshold=0.2,
            kernel_size_smooth_signal=128, kernel_size_smooth_speaker=4096,
            kernel_size_smooth_silence=4096)
        transcript = []
        for speaker in range(1, len(masks)):
            starts, lengths, values = rle1d(masks[speaker])
            transcript.extend(dict(audio_path=audio_path, begin=float(b) / sr,
                                   end=float(b + l) / sr, speaker=speaker,
                                   speaker_name=transcripts.default_speaker_names[speaker])
                              for b, l, v in zip(starts, lengths, values) if v)
        transcript = [t for t in transcript if t['speaker'] != transcripts.speaker_missing]
        for out_ext in ['.json', '.rttm']:
            path = os.path.join(output_path, noext + out_ext)
            transcripts.save(path, transcript)
            print(path)
        if html:
            from ..vis import report as vis
            vis.transcript(os.path.join(output_path, audio_name + '.html'),
                           sr, True, transcript, duration=max_duration)


def cmd_hyp(input_path, output_path, sample_rate, window_size, max_duration, html, ext,
            batch_size=8, device=None, vad_backend=None, vad_model=None,
            num_speakers=2):
    """Hypothesis diarization (the reference used an external pyannote
    pipeline here, diarization.py:137-161). Mono audio gets real speaker
    attribution (diarize_mono: band-energy embeddings k-means-clustered into
    `num_speakers` turns); multi-channel audio keeps per-channel SAD (one
    speaker per channel, the call-center convention). num_speakers=1 forces
    the speech-only SAD behavior. batch_size and device
    (diarization.py:263-266) are accepted for CLI compatibility; the
    pipeline is host-side numpy so they are inert."""
    neural_model = None
    if vad_backend == 'neural':
        from .neural_vad import NeuralVADModel
        assert vad_model, "vad_backend='neural' needs vad_model"
        neural_model = NeuralVADModel.load(vad_model)
    os.makedirs(output_path, exist_ok=True)
    sources = ([(input_path, n) for n in os.listdir(input_path)]
               if os.path.isdir(input_path)
               else [(os.path.dirname(input_path), os.path.basename(input_path))])
    for i, (dirname, audio_name) in enumerate(sources):
        print(i, '/', len(sources), audio_name)
        audio_path = os.path.join(dirname, audio_name)
        noext = audio_name[:-len(ext)] if ext and audio_name.endswith(ext) else audio_name
        signal, sr = audio_io.read_audio(audio_path, sample_rate=sample_rate,
                                         mono=False, duration=max_duration)
        if len(signal) == 1 and num_speakers > 1:
            transcript = mono_speaker_transcript(
                signal[0], sr, num_speakers=num_speakers,
                extra=dict(audio_path=audio_path),
                vad_backend=vad_backend, neural_model=neural_model)
        else:
            transcript = sad_transcript(signal, sr, window_size,
                                        extra=dict(audio_path=audio_path),
                                        backend=vad_backend,
                                        neural_model=neural_model)
        transcripts.collect_speaker_names(transcript, set_speaker_data=True)
        for out_ext in ['.json', '.rttm']:
            path = os.path.join(output_path, noext + out_ext)
            transcripts.save(path, transcript)
            print(path)


def cmd_eval(ref, hyp, html, debug_audio, sample_rate=100):
    if os.path.isfile(ref) and os.path.isfile(hyp):
        print(der(transcripts.load(ref), transcripts.load(hyp), sample_rate))
        return
    errs, results = [], []
    for rttm in os.listdir(ref):
        if not rttm.endswith('.rttm'):
            continue
        ref_t, hyp_t = transcripts.load(os.path.join(ref, rttm)), \
            transcripts.load(os.path.join(hyp, rttm))
        ser_err, perm = speaker_error(ref=ref_t, hyp=hyp_t, num_speakers=2,
                                      sample_rate=sample_rate,
                                      ignore_silence_and_overlapped_speech=True)
        der_err, _ = speaker_error(ref=ref_t, hyp=hyp_t, num_speakers=2,
                                   sample_rate=sample_rate,
                                   ignore_silence_and_overlapped_speech=False)
        errs.append(dict(ser=ser_err, der=der_err))
        results.append(dict(rttm=rttm, **errs[-1]))
        print(rttm, '{ser:.2f}, {der:.2f}'.format(**errs[-1]))
    if errs:
        print('===')
        print({k: sum(e[k] for e in errs) / len(errs) for k in errs[0]})
    return results


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest='cmd', required=True)
    c = sub.add_parser('ref')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--device', default=None)
    c.add_argument('--output-path', '-o', required=True)
    c.add_argument('--sample-rate', type=int, default=8000)
    c.add_argument('--window-size', type=float, default=0.02)
    c.add_argument('--max-duration', type=float)
    c.add_argument('--audio', dest='debug_audio', action='store_true')
    c.add_argument('--html', action='store_true')
    c.add_argument('--ext', default='.mp3')
    c.set_defaults(func=cmd_ref)
    c = sub.add_parser('hyp')
    c.add_argument('--input-path', '-i', required=True)
    c.add_argument('--batch-size', type=int, default=8)
    c.add_argument('--device', default=None)
    c.add_argument('--output-path', '-o', required=True)
    c.add_argument('--sample-rate', type=int, default=16000)
    c.add_argument('--window-size', type=float, default=0.02)
    c.add_argument('--max-duration', type=float)
    c.add_argument('--html', action='store_true')
    c.add_argument('--ext', default='.mp3.wav')
    c.add_argument('--vad-backend', default=None,
                   choices=['energy', 'webrtcvad', 'neural'])
    c.add_argument('--vad-model', default=None,
                   help='NeuralVADModel .npz for --vad-backend neural')
    c.add_argument('--num-speakers', type=int, default=2,
                   help='mono audio: cluster speech into this many speaker '
                        'turns (1 = speech-only SAD segments)')
    c.set_defaults(func=cmd_hyp)
    c = sub.add_parser('eval')
    c.add_argument('--ref', required=True)
    c.add_argument('--hyp', required=True)
    c.add_argument('--html', default='data/diarization.html')
    c.add_argument('--audio', dest='debug_audio', action='store_true')
    c.set_defaults(func=cmd_eval)
    return parser


def main(argv=None):
    args = vars(build_parser().parse_args(argv))
    args.pop('cmd')
    func = args.pop('func')
    func(**args)


if __name__ == '__main__':
    main()
