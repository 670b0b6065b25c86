"""Native C++ wav reader: parity with scipy backend + speed check."""
import time

import numpy as np
import pytest

from convasr_tpu.audio import read_audio, write_audio


@pytest.fixture
def wav(tmp_path):
    sr = 8000
    rng = np.random.RandomState(0)
    sig = (0.3 * rng.randn(2, sr * 5)).astype(np.float32)
    path = str(tmp_path / 'stereo.wav')
    write_audio(path, sig, sr)
    return path, sig, sr


class TestNativeWav:
    def test_parity_mono(self, wav):
        path, sig, sr = wav
        native, sr1 = read_audio(path, sample_rate=sr, mono=True, backend='native')
        scipy_out, sr2 = read_audio(path, sample_rate=sr, mono=True, backend='scipy')
        assert sr1 == sr2 == sr
        assert native.shape == scipy_out.shape
        np.testing.assert_allclose(native, scipy_out, atol=1e-6)

    def test_parity_stereo(self, wav):
        path, sig, sr = wav
        native, _ = read_audio(path, sample_rate=sr, mono=False, backend='native')
        ref, _ = read_audio(path, sample_rate=sr, mono=False, backend='scipy')
        assert native.shape == ref.shape == (2, sig.shape[1])
        np.testing.assert_allclose(native, ref, atol=1e-6)

    def test_speed_vs_scipy(self, wav):
        path, _, sr = wav

        def bench(backend, n=30):
            read_audio(path, sample_rate=sr, mono=True, backend=backend)
            t0 = time.perf_counter()
            for _ in range(n):
                read_audio(path, sample_rate=sr, mono=True, backend=backend)
            return (time.perf_counter() - t0) / n

        t_native, t_scipy = bench('native'), bench('scipy')
        print(f'native {t_native * 1e6:.0f} us vs scipy {t_scipy * 1e6:.0f} us per 5s read')
        # at minimum in the same ballpark; usually faster
        assert t_native < 3 * t_scipy
