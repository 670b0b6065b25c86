"""Tests for audio I/O and the transcript data model."""
import json
import os

import numpy as np
import pytest

from convasr_tpu.audio import read_audio, write_audio, resample, compute_duration, extract_meta
from convasr_tpu.data import transcripts


@pytest.fixture
def wav_path(tmp_path):
    sr = 8000
    t = np.arange(sr * 2, dtype=np.float32) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
    path = str(tmp_path / 'test.wav')
    write_audio(path, sig, sr)
    return path, sig, sr


class TestAudioIO:
    def test_roundtrip(self, wav_path):
        path, sig, sr = wav_path
        out, sr_ = read_audio(path, sample_rate=sr)
        assert sr_ == sr
        assert out.shape == sig.shape
        assert np.abs(out - sig).max() < 1e-3  # int16 quantization

    def test_out_of_range_saturates(self, tmp_path):
        """|x| > 1 must CLIP on write, not wrap int16 (the reference's
        f2s_numpy wraps: +1.5 -> -0.5, audio.py:14 — corrupting loud
        synthetic/augmented audio; deliberate divergence, io.py f2s)."""
        sr = 8000
        sig = np.asarray([[0.5, 1.5, -2.0, 0.999, -1.0]], np.float32)
        path = str(tmp_path / 'loud.wav')
        write_audio(path, sig, sr)
        out, _ = read_audio(path, sample_rate=sr)
        np.testing.assert_allclose(
            out[0], [0.5, 1.0, -1.0, 0.999, -1.0], atol=1e-3)

    def test_resample(self, wav_path):
        path, sig, sr = wav_path
        out, sr_ = read_audio(path, sample_rate=16000)
        assert sr_ == 16000
        assert abs(out.shape[-1] - 2 * sig.shape[-1]) <= 2

    def test_offset_duration(self, wav_path):
        path, sig, sr = wav_path
        out, _ = read_audio(path, sample_rate=sr, offset=0.5, duration=1.0)
        assert out.shape[-1] == sr

    def test_missing_file_degrades_to_empty(self):
        out, sr = read_audio('/nonexistent/file.wav', sample_rate=8000)
        assert out.shape[-1] == 0

    def test_raw_bytes(self):
        raw = (np.ones(100, dtype=np.int16) * 1000).tobytes()
        out, sr = read_audio(None, sample_rate=8000, raw_bytes=raw,
                             raw_sample_rate=8000, raw_num_channels=1)
        assert out.shape == (1, 100)
        assert out.dtype == np.float32

    def test_compute_duration(self, wav_path):
        path, sig, sr = wav_path
        assert compute_duration(path) == pytest.approx(2.0)

    def test_extract_meta(self, wav_path):
        path, _, _ = wav_path
        meta = extract_meta(path)
        assert meta['num_channels'] == 1
        assert meta['duration'] == pytest.approx(2.0)

    def test_resample_tone_preserved(self):
        sr0, sr1 = 16000, 8000
        t = np.arange(sr0, dtype=np.float32) / sr0
        sig = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None, :]
        out, _ = resample(sig, sr0, sr1)
        spectrum = np.abs(np.fft.rfft(out[0]))
        peak_hz = np.argmax(spectrum) * sr1 / out.shape[-1]
        assert abs(peak_hz - 440) < 5


class TestTranscripts:
    def test_load_save_json(self, tmp_path):
        data = [dict(audio_path='a.wav', ref='привет', begin=0.0, end=1.0,
                     channel=0, speaker=1, speaker_name='A')]
        path = str(tmp_path / 't.json')
        transcripts.save(path, data)
        assert transcripts.load(path) == data

    def test_load_rttm(self, tmp_path):
        path = str(tmp_path / 't.rttm')
        with open(path, 'w') as f:
            f.write('SPEAKER rec 1 0.500 1.250 <NA> <NA> spk1 <NA> <NA>\n')
        [t] = transcripts.load(path)
        assert t['begin'] == 0.5 and t['end'] == pytest.approx(1.75)
        assert t['speaker_name'] == 'spk1'

    def test_load_bare_audio_path(self, tmp_path):
        path = str(tmp_path / 'x.wav')
        open(path, 'w').close()
        assert transcripts.load(path) == [dict(audio_path=path)]

    def test_join(self):
        assert transcripts.join(ref=[dict(ref='a'), dict(ref='b')]) == 'a b'
        assert transcripts.join(hyp=[dict(hyp=' c ')]) == 'c'

    def test_prune_cer(self):
        data = [dict(cer=0.1), dict(cer=0.9)]
        assert list(transcripts.prune(data, cer=(0, 0.5))) == [dict(cer=0.1)]

    def test_prune_duration(self):
        data = [dict(begin=0.0, end=1.0), dict(begin=0.0, end=50.0)]
        out = list(transcripts.prune(data, duration=(0, 10)))
        assert out == [dict(begin=0.0, end=1.0)]

    def test_prune_unk(self):
        data = [dict(ref='привет'), dict(ref='при**т')]
        assert list(transcripts.prune(data, allowed_unk_count=(0, 0))) == [dict(ref='привет')]

    def test_segment_by_time(self):
        data = [dict(begin=float(i), end=float(i) + 1.0, speaker=0, channel=0) for i in range(10)]
        segs = list(transcripts.segment_by_time(data, max_segment_seconds=3.0))
        assert sum(len(s) for s in segs) >= 8
        for seg in segs:
            assert seg[-1]['end'] - seg[0]['begin'] <= 4.0

    def test_summary(self):
        s = transcripts.summary([dict(begin=1.0, end=2.0), dict(begin=0.5, end=3.0)])
        assert s == dict(begin=0.5, end=3.0)
        assert transcripts.summary([]) == dict(begin=-1, end=-1)

    def test_collect_speaker_names_from_channels(self):
        data = [dict(channel=0), dict(channel=1)]
        names = transcripts.collect_speaker_names(data, num_speakers=2, set_speaker_data=True)
        assert data[0]['speaker_name'] == 'channel0'
        assert data[1]['speaker_name'] == 'channel1'
        assert len(names) >= 3

    def test_number_tuple(self):
        assert transcripts.number_tuple('1-2') == (1, 2)
        assert transcripts.number_tuple('0.5') == (0.5, 0.5)
        assert transcripts.number_tuple('3-') == (3, float('inf'))
        assert transcripts.number_tuple('-3') == (float('-inf'), 3)

    def test_compute_duration(self):
        assert transcripts.compute_duration(dict(begin=1.0, end=3.5)) == 2.5
        assert transcripts.compute_duration(dict(begin=0.0, end=7200.0), hours=True) == 2.0
