"""Prefetching loader tests."""
import time

import numpy as np
import pytest

from convasr_tpu.data.loader import PrefetchLoader


class FakeDataset:
    def __init__(self, n=32, delay=0.0):
        self.n = n
        self.delay = delay

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return i

    def collate_fn(self, items):
        return np.asarray(items)


class TestPrefetchMap:
    def test_order(self):
        from convasr_tpu.data.loader import prefetch_map
        out = list(prefetch_map(lambda x: x * 2, range(10), num_workers=3))
        assert out == [x * 2 for x in range(10)]

    def test_sync_mode(self):
        from convasr_tpu.data.loader import prefetch_map
        assert list(prefetch_map(str, [1, 2], num_workers=0)) == ['1', '2']

    def test_empty(self):
        from convasr_tpu.data.loader import prefetch_map
        assert list(prefetch_map(str, [], num_workers=2)) == []


class TestPrefetchLoader:
    def test_order_and_content(self):
        ds = FakeDataset()
        batches = [[0, 1], [2, 3], [4, 5]]
        out = list(PrefetchLoader(ds, iter(batches), num_workers=2))
        assert [b.tolist() for b in out] == batches

    def test_synchronous_mode(self):
        ds = FakeDataset()
        out = list(PrefetchLoader(ds, iter([[1], [2]]), num_workers=0))
        assert [b.tolist() for b in out] == [[1], [2]]

    def test_overlaps_io(self):
        # 8 batches x 2 items x 20ms: serial ~320ms, 4 workers should be much faster
        ds = FakeDataset(delay=0.02)
        batches = [[i, i + 1] for i in range(0, 16, 2)]
        t0 = time.perf_counter()
        out = list(PrefetchLoader(ds, iter(batches), num_workers=4, prefetch=4))
        parallel_time = time.perf_counter() - t0
        assert len(out) == 8
        assert parallel_time < 0.8 * (16 * 0.02)

    def test_early_break_no_hang(self):
        ds = FakeDataset(delay=0.01)
        loader = PrefetchLoader(ds, iter([[i] for i in range(100)]), num_workers=2)
        for k, batch in enumerate(loader):
            if k == 2:
                break  # must not deadlock the submitter thread
