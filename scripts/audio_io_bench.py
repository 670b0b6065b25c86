"""Audio decode micro-benchmark — the reference's README audio-I/O table.

Reference methodology (/root/reference/README.md:213-233, audio.py timeit
block): decode test_5s / test_1m / test_1h wav files x100 per backend,
report mean microseconds per decode. The reference measured scipy as the
fastest CPU path (30.2 ms for 5 s, 36.0 ms for 1 m, 3.58 s for 1 h of
8 kHz int16 wav). This repo adds a `native` backend — an in-repo C++ WAV
reader (native/wav_reader.cpp, ctypes-loaded) with no scipy overhead.

Methodology deviations from the reference (ADVICE r3): by default the
iteration count scales DOWN for files longer than 1 minute (the reference
runs x100 for every size — the 1 h file through ffmpeg alone would take
~9 min x backends on this 1-core host); pass --no-scale-long for the exact
reference x--iterations methodology. Each timed loop is preceded by
untimed warmup reads (the reference warms 3x), and a backend that fails
mid-loop degrades to an `n/a` row instead of aborting the script.

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
    parser.add_argument('--warmup', type=int, default=3,
                        help='untimed warmup reads per (file, backend) '
                             '(reference audio.py warms 3x)')
    parser.add_argument('--no-scale-long', action='store_true',
                        help='run the full --iterations even for the 1 h '
                             'file (exact reference methodology; the default '
                             'scales iterations down past 60 s)')
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
            iters = args.iterations if args.no_scale_long else \
                max(1, int(args.iterations * min(1.0, 60.0 / seconds)))
            timed, failed = {}, {}
            expect = int(seconds * 8000)
            for backend in args.backends:
                try:
                    # untimed warmups double as the does-it-decode check;
                    # read_audio degrades decode errors to an EMPTY signal
                    # (reference audio.py:102-104) — that is a failure here
                    for _ in range(max(args.warmup, 1)):
                        sig, _ = read_audio(path, sample_rate=8000,
                                            backend=backend)
                        assert sig.shape[-1] >= expect - 1, \
                            f'decoded {sig.shape[-1]} of {expect} samples'
                except Exception as e:
                    failed[backend] = str(e)
                    continue
                try:
                    tic = time.perf_counter()
                    for _ in range(iters):
                        signal, sr = read_audio(path, sample_rate=8000,
                                                backend=backend)
                        if signal.shape[-1] < expect - 1:
                            raise RuntimeError('intermittent decode failure')
                    timed[backend] = (time.perf_counter() - tic) / iters * 1e6
                except Exception as e:
                    # an intermittent mid-loop failure (e.g. a flaky ffmpeg
                    # subprocess) records this backend as n/a and moves on
                    failed[backend] = str(e)
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
