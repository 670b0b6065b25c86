"""Infra: shaping DSL, perf meters, profiler helpers, sparse topk, utils."""
import os

import numpy as np
import pytest

from convasr_tpu.infra import perf
from convasr_tpu.infra.shaping import B, BCT, BT, shapecheck
from convasr_tpu.infra.utils import Timer, sparse_topk, sparse_topk_todense


class TestShaping:
    def test_shapecheck_passes(self):
        @shapecheck
        def f(x: BT, lens: B):
            return x.shape

        assert f(np.zeros((2, 3)), np.zeros(2)) == (2, 3)

    def test_shapecheck_fails(self):
        @shapecheck
        def f(x: BCT):
            return x

        with pytest.raises(AssertionError):
            f(np.zeros((2, 3)))

    def test_non_array_args_ignored(self):
        @shapecheck
        def f(x: BT, name: str = 'ok'):
            return name

        assert f(np.zeros((1, 1))) == 'ok'


class TestPerf:
    def test_update_and_snapshot(self):
        perf.init_default()
        perf.update(dict(loss=1.0), prefix='train')
        perf.update(dict(loss=2.0), prefix='train')
        snap = perf.default()
        assert snap['perf_cur_train_loss'] == 2.0
        assert snap['perf_max_train_loss'] == 2.0
        assert 0 < snap['perf_avg_train_loss'] <= 2.0

    def test_outlier_clamped(self):
        perf.init_default(K=2.0)
        perf.update(dict(t=1.0))
        perf.update(dict(t=100.0))  # clamped to 2*avg in the EMA
        snap = perf.default()
        assert snap['perf_avg_t'] < 10.0
        assert snap['perf_max_t'] == 100.0

    def test_nonfinite_ignored(self):
        perf.init_default()
        perf.update(dict(x=float('nan')))
        assert 'perf_cur_x' not in perf.default()


class TestSparseTopk:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        x = rng.randn(5, 10).astype(np.float32)
        saved = sparse_topk(x, k=3)
        dense = sparse_topk_todense(saved)
        # top-3 entries preserved, everything else fill_value
        for i in range(5):
            top3 = np.argsort(-x[i])[:3]
            np.testing.assert_allclose(dense[i, top3], x[i, top3])
            rest = np.setdiff1d(np.arange(10), top3)
            np.testing.assert_allclose(dense[i, rest], 0.0)


class TestProfiler:
    def test_timed(self):
        from convasr_tpu.infra.profiler import timed
        sink = {}
        with timed(sink, 'op'):
            pass
        assert sink['op'] >= 0

    def test_device_memory_stats(self):
        from convasr_tpu.infra.profiler import device_memory_stats
        stats = device_memory_stats()  # may be empty on CPU; must not raise
        assert isinstance(stats, dict)

    def test_annotate_context(self):
        from convasr_tpu.infra.profiler import annotate
        with annotate('test-region'):
            pass


class TestTimer:
    def test_elapsed(self):
        with Timer() as t:
            pass
        assert t.elapsed >= 0
