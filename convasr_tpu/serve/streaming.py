"""Streaming recognition engine: fixed-window chunked inference + incremental
CTC decode.

The reference has NO streaming path (its gRPC mock implements only the unary
Recognize, serve_google_api.py:26-59; long audio is handled offline by VAD
chunking). This module adds the Google Speech `StreamingRecognize` contract
on top of the same acoustic model, designed TPU-first:

- every forward runs on a FIXED-length window (left zero-padded), so the jit
  compiles exactly once — no shape-churn recompiles as audio accumulates;
- the conv stack's receptive field needs future context, so frames younger
  than `lookahead_sec` stay INTERIM; older frames are COMMITTED exactly once
  through a carry-state CTC collapse (identical output to offline decode);
- the device returns the fused packed (idx, confidence) buffer — one small
  fetch per chunk (see cli/benchmark_online.py).
"""
import dataclasses
import typing

import numpy as np


class StreamingCTCCollapse:
    """Greedy CTC collapse with carry across feeds: feeding a token stream in
    arbitrary splits yields exactly the offline collapse of the whole."""

    def __init__(self, blank: int):
        self.blank = blank
        self.prev = blank
        self.tokens: typing.List[int] = []

    def feed(self, ids: typing.Iterable[int]) -> typing.List[int]:
        out = []
        for t in ids:
            t = int(t)
            if t != self.prev and t != self.blank:
                out.append(t)
            self.prev = t
        self.tokens.extend(out)
        return out

    def clone(self) -> 'StreamingCTCCollapse':
        c = StreamingCTCCollapse(self.blank)
        c.prev = self.prev
        c.tokens = list(self.tokens)
        return c


@dataclasses.dataclass
class StreamEvent:
    text: str            # decoded text of this update
    is_final: bool       # committed (True) or interim tail (False)
    end_time: float      # audio seconds covered so far


class StreamingTranscriber:
    """Accepts arbitrary-size audio chunks, emits committed + interim text.

    forward_fused(x (1, W) float32, xlen (1,)) must return the packed
    (1, frames, 2) [argmax idx, confidence] buffer for a fixed window of
    `window_sec` seconds (transcribe.setup's forward.fused contract).
    """

    def __init__(self, forward_fused, tokenizer, sample_rate: int,
                 window_sec: float = 10.0, lookahead_sec: float = 1.5,
                 endpoint_silence_sec: typing.Optional[float] = None,
                 endpoint_rel_threshold: float = 0.1):
        self.forward_fused = forward_fused
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.window = int(window_sec * sample_rate)
        self.window = (self.window // 128) * 128  # bucket-stable jit shape
        self.window_sec = self.window / sample_rate
        self.lookahead_sec = lookahead_sec
        # VAD endpointing (the Google-API single_utterance behavior): when
        # the trailing audio has been silent for endpoint_silence_sec, commit
        # everything pending immediately — the lookahead hold-back only buys
        # future acoustic context, and silence IS that context
        self.endpoint_silence_sec = endpoint_silence_sec
        self.endpoint_rel_threshold = endpoint_rel_threshold
        self._speech_rms = 0.0        # running speech-level estimate
        self._silence_run_sec = 0.0
        self.endpointed = False       # latched by the last endpoint event
        self.buf = np.zeros(0, np.float32)
        self.total_sec = 0.0          # audio received so far
        self.committed_sec = 0.0      # committed up to this absolute time
        self.collapse = None          # built lazily (needs blank id)
        self._frame_dur = None

    def _update_endpoint(self, chunk: np.ndarray) -> bool:
        """Track trailing silence; True when an utterance endpoint fires.

        Silence = 20 ms frame RMS below endpoint_rel_threshold x running
        speech level (adaptive — no absolute calibration needed)."""
        if self.endpoint_silence_sec is None or chunk.size == 0:
            return False
        frame = max(1, int(0.02 * self.sample_rate))
        n = len(chunk) // frame
        if n == 0:
            return False
        rms = np.sqrt(np.mean(
            chunk[:n * frame].reshape(n, frame).astype(np.float64) ** 2,
            axis=1))
        for r in rms:
            if r > self.endpoint_rel_threshold * self._speech_rms:
                self._speech_rms = max(self._speech_rms * 0.95, float(r))
                self._silence_run_sec = 0.0
            else:
                self._silence_run_sec += frame / self.sample_rate
        return (self._speech_rms > 0.0
                and self._silence_run_sec >= self.endpoint_silence_sec)

    def _decode_window(self):
        """Run the model over the last `window` samples (left zero-padded)."""
        import jax.numpy as jnp
        tail = self.buf[-self.window:]
        pad = self.window - len(tail)
        x = np.zeros((1, self.window), np.float32)
        x[0, pad:] = tail
        packed = np.asarray(self.forward_fused(
            jnp.asarray(x), jnp.ones((1,), np.float32)))  # (1, frames, 2)
        idx = packed[0, :, 0].astype(np.int64)
        frames = packed.shape[1]
        if self._frame_dur is None:
            self._frame_dur = self.window_sec / frames
        # absolute end-time of each frame
        window_end = self.total_sec
        times = window_end - (frames - 1 - np.arange(frames)) * self._frame_dur
        return idx, times

    def accept(self, chunk: np.ndarray) -> typing.List[StreamEvent]:
        """Feed a float32 mono chunk; returns [final?, interim] events."""
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        self.buf = np.concatenate([self.buf, chunk])
        # keep only what a window can ever see again
        if len(self.buf) > self.window:
            self.buf = self.buf[-self.window:]
        self.total_sec += len(chunk) / self.sample_rate
        if self.collapse is None:
            self.collapse = StreamingCTCCollapse(self.tokenizer.eps_id)

        endpoint = self._update_endpoint(chunk)
        idx, times = self._decode_window()
        return self._emit(idx, times, endpoint, self.total_sec)

    def _emit(self, idx, times, endpoint: bool,
              end_sec: float) -> typing.List['StreamEvent']:
        """Commit/interim split over one decoded window.

        `end_sec` is the stream-clock time of the last decoded frame (equals
        total_sec for the per-stream engine; the batched engine passes its
        consumed-so-far clock, which may trail total_sec by < one chunk)."""
        if self.collapse is None:
            self.collapse = StreamingCTCCollapse(self.tokenizer.eps_id)
        # at an endpoint the trailing silence IS the future context the
        # lookahead normally waits for — commit everything received
        horizon = end_sec if endpoint else end_sec - self.lookahead_sec
        commit_mask = (times > self.committed_sec) & (times <= horizon)
        interim_mask = times > max(horizon, self.committed_sec)
        self.endpointed = endpoint

        events = []
        committed_now = self.collapse.feed(idx[commit_mask])
        if commit_mask.any():
            self.committed_sec = float(times[commit_mask][-1])
        if committed_now:
            events.append(StreamEvent(
                text=self.tokenizer.decode([committed_now])[0],
                is_final=True, end_time=self.committed_sec))
        tail = self.collapse.clone().feed(idx[interim_mask])
        if tail:
            events.append(StreamEvent(
                text=self.tokenizer.decode([tail])[0],
                is_final=False, end_time=end_sec))
        return events

    def flush(self) -> typing.List[StreamEvent]:
        """End of stream: commit everything still pending."""
        if self.collapse is None or len(self.buf) == 0:
            return []
        idx, times = self._decode_window()
        pending = times > self.committed_sec
        final = self.collapse.feed(idx[pending])
        self.committed_sec = self.total_sec
        if final:
            return [StreamEvent(text=self.tokenizer.decode([final])[0],
                                is_final=True, end_time=self.total_sec)]
        return []

    def full_text(self) -> str:
        """All committed tokens decoded (the offline-equivalent transcript)."""
        if self.collapse is None:
            return ''
        return self.tokenizer.decode([self.collapse.tokens])[0]
