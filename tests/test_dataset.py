"""Dataset / collate / bucketing-sampler tests."""
import json
import pathlib

import numpy as np
import pytest

from convasr_tpu.audio import write_audio
from convasr_tpu.data.dataset import AudioTextDataset, StringArray, frame_count_bucket_fn
from convasr_tpu.data.sampler import BucketingBatchSampler
from convasr_tpu.text import ProcessingPipeline

CONFIG = ProcessingPipeline.load_config(
    str(pathlib.Path(__file__).resolve().parent.parent / 'configs' / 'ru_text_config.json'))


@pytest.fixture
def pipeline():
    return ProcessingPipeline.make(CONFIG, 'char_legacy')


@pytest.fixture
def corpus(tmp_path):
    """3 wavs of different lengths + a transcript json."""
    sr = 8000
    rng = np.random.RandomState(0)
    entries = []
    for i, dur in enumerate([0.5, 1.0, 2.0]):
        path = str(tmp_path / f'a{i}.wav')
        write_audio(path, (0.1 * rng.randn(1, int(sr * dur))).astype(np.float32), sr)
        entries.append(dict(audio_path=path, ref=['привет', 'мир', 'привет мир'][i],
                            begin=0.0, end=dur))
    json_path = str(tmp_path / 'data.json')
    with open(json_path, 'w') as f:
        json.dump(entries, f, ensure_ascii=False)
    return json_path, sr


class TestStringArray:
    def test_roundtrip(self):
        arr = StringArray(['привет', '', 'мир'])
        assert len(arr) == 3
        assert arr[0] == 'привет' and arr[1] == '' and arr[2] == 'мир'
        assert arr.tolist() == ['привет', '', 'мир']

    def test_state_dict(self):
        arr = StringArray(['ab', 'cd'])
        restored = StringArray.from_state_dict(arr.state_dict())
        assert restored.tolist() == ['ab', 'cd']


class TestAudioTextDataset:
    def test_default_mode(self, corpus, pipeline):
        json_path, sr = corpus
        ds = AudioTextDataset(json_path, [pipeline], sr)
        assert len(ds) == 3
        transcript, speaker, signal, target = ds[0]
        assert signal.shape[0] == 1
        assert signal.shape[1] == pytest.approx(0.5 * sr, abs=2)
        assert transcript['ref'] == 'привет'
        decoded = pipeline.decode([target.tolist()])[0]
        assert decoded == 'привет'

    def test_duration_pruning(self, corpus, pipeline):
        json_path, sr = corpus
        ds = AudioTextDataset(json_path, [pipeline], sr, min_duration=0.8)
        assert len(ds) == 2

    def test_collate_shapes_and_xlen(self, corpus, pipeline):
        json_path, sr = corpus
        ds = AudioTextDataset(json_path, [pipeline], sr, time_padding_multiple=128)
        batch = [ds[i] for i in range(3)]
        meta, s, x, xlen, y, ylen = ds.collate_fn(batch)
        assert x.shape[0] == 3 and x.shape[1] == 1
        assert x.shape[-1] % 128 == 0
        assert y.shape[:2] == (3, 1)
        # xlen is the valid fraction of padded length
        for k in range(3):
            valid = int(round(xlen[k] * x.shape[-1]))
            assert abs(valid - batch[k][2].shape[-1]) <= 1
        assert ylen[2, 0] == len('привет мир')

    def test_state_dict_roundtrip(self, corpus, pipeline):
        json_path, sr = corpus
        ds = AudioTextDataset(json_path, [pipeline], sr)
        state = ds.state_dict()
        ds2 = AudioTextDataset([], [pipeline], sr)
        ds2.load_state_dict(state)
        assert len(ds2) == len(ds)
        t1, _, x1, y1 = ds[1]
        t2, _, x2, y2 = ds2[1]
        assert t1['example_id'] == t2['example_id']
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)

    def test_batched_transcript_mode(self, tmp_path, pipeline):
        sr = 8000
        path = str(tmp_path / 'long.wav')
        write_audio(path, np.zeros((1, sr * 2), np.float32), sr)
        entries = [dict(audio_path=path, ref='привет', begin=0.0, end=1.0),
                   dict(audio_path=path, ref='мир', begin=1.0, end=2.0)]
        json_path = str(tmp_path / 'd.json')
        with open(json_path, 'w') as f:
            json.dump(entries, f, ensure_ascii=False)
        ds = AudioTextDataset(json_path, [pipeline], sr, mode='batched_transcript')
        assert len(ds) == 1  # one file = one example (= one batch)
        item = ds[0]
        transcript, speaker, features = item[0], item[1], item[2]
        assert len(transcript) == 2
        assert features[0].shape[-1] == pytest.approx(sr, abs=2)

    def test_batched_channels_mode(self, tmp_path, pipeline):
        sr = 8000
        path = str(tmp_path / 'stereo.wav')
        rng = np.random.RandomState(1)
        write_audio(path, (0.1 * rng.randn(2, sr)).astype(np.float32), sr)
        entries = [dict(audio_path=path, ref='привет', begin=0.0, end=0.5,
                        channel=0, speaker=1),
                   dict(audio_path=path, ref='мир', begin=0.5, end=1.0,
                        channel=1, speaker=2)]
        json_path = str(tmp_path / 's.json')
        with open(json_path, 'w') as f:
            json.dump(entries, f, ensure_ascii=False)
        ds = AudioTextDataset(json_path, [pipeline], sr, mode='batched_channels',
                              mono=False, duration_from_transcripts=True)
        assert len(ds) == 1
        item = ds[0]
        transcript, speakers, features = item[0], item[1], item[2]
        # one joined row per channel; spans come from each channel's own
        # segments (duration_from_transcripts=True)
        assert len(transcript) == 2
        spans = sorted(f.shape[-1] for f in features)
        assert spans[0] == pytest.approx(sr * 0.5, abs=2)
        assert spans[1] == pytest.approx(sr * 1.0, abs=2)
        meta, s, x, xlen, y, ylen = ds.collate_fn(item)
        assert x.shape[0] == 2  # one batch row per channel

    def test_bucket_fn(self, corpus, pipeline):
        json_path, sr = corpus
        bucket_fn = frame_count_bucket_fn(window_stride=0.01, time_padding_multiple=128)
        ds = AudioTextDataset(json_path, [pipeline], sr, bucket_fn=bucket_fn)
        assert len(set(ds.bucket.tolist())) >= 2  # short and long utts in different buckets


class TestBucketingBatchSampler:
    def _dataset_stub(self, buckets):
        class Stub:
            bucket = np.asarray(buckets, dtype=np.int16)
        return Stub()

    def test_covers_all_with_padding(self):
        ds = self._dataset_stub([0] * 5 + [1] * 3)
        sampler = BucketingBatchSampler(ds, batch_size=2)
        batches = list(sampler)
        seen = set(i for b in batches for i in b)
        assert seen == set(range(8))
        assert all(len(b) == 2 for b in batches)

    def test_same_bucket_within_batch(self):
        ds = self._dataset_stub([0] * 6 + [1] * 6)
        sampler = BucketingBatchSampler(ds, batch_size=3)
        for b in sampler:
            assert len(set(ds.bucket[b].tolist())) == 1

    def test_world_size_groups_same_bucket(self):
        ds = self._dataset_stub([0] * 8 + [1] * 8)
        sampler = BucketingBatchSampler(ds, batch_size=2, world_size=2)
        batches = list(sampler)
        for i in range(0, len(batches), 2):
            buckets = set(ds.bucket[batches[i]].tolist()) | set(ds.bucket[batches[i + 1]].tolist())
            assert len(buckets) == 1

    def test_epoch_reshuffles(self):
        ds = self._dataset_stub([0] * 16)
        sampler = BucketingBatchSampler(ds, batch_size=2)
        first = [tuple(b) for b in sampler]
        sampler.set_epoch(1)
        second = [tuple(b) for b in sampler]
        assert first != second

    def test_deterministic_per_epoch(self):
        ds = self._dataset_stub([0] * 16)
        s1 = BucketingBatchSampler(ds, batch_size=2)
        s2 = BucketingBatchSampler(ds, batch_size=2)
        assert [tuple(b) for b in s1] == [tuple(b) for b in s2]

    def test_resume_batch_idx(self):
        ds = self._dataset_stub([0] * 16)
        sampler = BucketingBatchSampler(ds, batch_size=2)
        all_batches = [tuple(b) for b in sampler]
        sampler.load_state_dict(dict(batch_idx=3))
        assert [tuple(b) for b in sampler] == all_batches[3:]

    def test_mixing_sampler(self):
        from convasr_tpu.data.sampler import MixingBatchSampler
        ds_a, ds_b = self._dataset_stub([0] * 32), self._dataset_stub([0] * 32)
        sa = BucketingBatchSampler(ds_a, batch_size=4)
        sb = BucketingBatchSampler(ds_b, batch_size=4)
        mix = MixingBatchSampler([sa, sb], [0.75, 0.25], seed=1)
        draws = [src for src, _ in mix]
        assert len(draws) == len(sa) + len(sb)
        frac_a = draws.count(0) / len(draws)
        assert 0.5 < frac_a < 0.95  # weighted toward source 0

    def test_mixing_resume_replays(self):
        from convasr_tpu.data.sampler import MixingBatchSampler
        ds = self._dataset_stub([0] * 32)
        make = lambda: MixingBatchSampler(
            [BucketingBatchSampler(self._dataset_stub([0] * 32), batch_size=4),
             BucketingBatchSampler(self._dataset_stub([0] * 32), batch_size=4)],
            [0.5, 0.5], seed=2)
        full = [(s, tuple(b)) for s, b in make()]
        resumed = make()
        resumed.load_state_dict(dict(batch_idx=5))
        assert [(s, tuple(b)) for s, b in resumed] == full[5:]

    def test_mixing_shard(self):
        """Multi-process mixing: each sync group draws ONE source; ranks see
        the same source per step and together cover every batch."""
        from convasr_tpu.data.sampler import MixingBatchSampler
        make = lambda: MixingBatchSampler(
            [BucketingBatchSampler(self._dataset_stub([0] * 32), batch_size=2,
                                   world_size=2),
             BucketingBatchSampler(self._dataset_stub([0] * 32), batch_size=2,
                                   world_size=2)],
            [0.5, 0.5], seed=3)
        r0 = [(src, tuple(b)) for src, b in make().shard(0)]
        r1 = [(src, tuple(b)) for src, b in make().shard(1)]
        assert len(r0) == len(r1)
        # same source drawn on both ranks at every step
        assert [s for s, _ in r0] == [s for s, _ in r1]
        # no batch served twice across ranks within a source
        for src in (0, 1):
            b0 = [b for s, b in r0 if s == src]
            b1 = [b for s, b in r1 if s == src]
            assert not (set(b0) & set(b1))

    def test_shard(self):
        ds = self._dataset_stub([0] * 16)
        sampler = BucketingBatchSampler(ds, batch_size=2, world_size=2)
        all_batches = [tuple(b) for b in sampler]
        r0 = [tuple(b) for b in sampler.shard(0)]
        r1 = [tuple(b) for b in sampler.shard(1)]
        assert len(r0) == len(r1) == len(all_batches) // 2
        assert sorted(r0 + r1) == sorted(all_batches)
