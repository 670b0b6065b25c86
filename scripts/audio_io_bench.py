"""Audio decode micro-benchmark — the reference's README audio-I/O table.

Reference methodology (/root/reference/README.md:213-233, audio.py timeit
block): decode test_5s / test_1m / test_1h wav files x100 per backend,
report mean microseconds per decode. The reference measured scipy as the
fastest CPU path (30.2 ms for 5 s, 36.0 ms for 1 m, 3.58 s for 1 h of
8 kHz int16 wav). This repo adds a `native` backend — an in-repo C++ WAV
reader (native/wav_reader.cpp, ctypes-loaded) with no scipy overhead.

Usage: python scripts/audio_io_bench.py [--iterations 100] [--backends ...]
Writes one table row per (file, backend): mean us/decode over N iterations.
Run on an otherwise-idle host — a busy core inflates every backend equally
but ruins comparability with the reference's numbers.
"""
import argparse
import os
import pathlib
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_wav(path, seconds, sample_rate=8000):
    from convasr_tpu.audio import write_audio
    rng = np.random.RandomState(0)
    sig = (0.1 * rng.randn(1, int(seconds * sample_rate))).astype(np.float32)
    write_audio(path, sig, sample_rate)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--iterations', type=int, default=100)
    parser.add_argument('--backends', nargs='+',
                        default=['native', 'scipy', 'soundfile', 'sox', 'ffmpeg'])
    parser.add_argument('--durations', nargs='+', type=float,
                        default=[5.0, 60.0, 3600.0],
                        help='wav lengths in seconds (reference: 5s/1m/1h)')
    args = parser.parse_args()

    from convasr_tpu.audio.io import read_audio

    tmp = tempfile.mkdtemp(prefix='audio_io_bench_')
    try:
        print(f'{"file":>8} {"backend":>10} {"mean us/decode":>16} '
              f'{"vs scipy":>9}')
        for seconds in args.durations:
            label = (f'{seconds:.0f}s' if seconds < 60 else
                     f'{seconds / 60:.0f}m' if seconds < 3600 else
                     f'{seconds / 3600:.0f}h')
            path = os.path.join(tmp, f'test_{label}.wav')
            make_wav(path, seconds)
            iters = max(1, int(args.iterations * min(1.0, 60.0 / seconds)))
            timed, failed = {}, {}
            expect = int(seconds * 8000)
            for backend in args.backends:
                try:
                    sig, _ = read_audio(path, sample_rate=8000,
                                        backend=backend)
                    # read_audio degrades decode errors to an EMPTY signal
                    # (reference audio.py:102-104) — that is a failure here
                    assert sig.shape[-1] >= expect - 1, \
                        f'decoded {sig.shape[-1]} of {expect} samples'
                except Exception as e:
                    failed[backend] = str(e)
                    continue
                tic = time.perf_counter()
                for _ in range(iters):
                    signal, sr = read_audio(path, sample_rate=8000,
                                            backend=backend)
                timed[backend] = (time.perf_counter() - tic) / iters * 1e6
                if signal.shape[-1] < expect - 1:
                    failed[backend] = 'intermittent decode failure'
                    del timed[backend]
            base = timed.get('scipy')
            for backend in args.backends:
                if backend in failed:
                    print(f'{label:>8} {backend:>10} {"n/a":>16}  '
                          f'({failed[backend]})')
                    continue
                us = timed[backend]
                rel = f'{base / us:8.2f}x' if base else f'{"":>9}'
                print(f'{label:>8} {backend:>10} {us:16,.0f} {rel} '
                      f'(x{iters})')
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    main()
