"""Audio micro-benchmark CLI (`timeit`).

Behavior spec: /root/reference/audio.py:227-262 — warm up, time N reads of a
file with the chosen backend, print process/wall microseconds per read in the
same table format as README.md:220-233.
"""
import argparse
import time

from ..audio import io as audio_io


def cmd_timeit(audio_path, sample_rate, mono, audio_backend, number,
               number_warmup, scale, raw_dtype, dtype):
    for _ in range(number_warmup):
        audio_io.read_audio(audio_path, sample_rate=sample_rate, mono=mono,
                            backend=audio_backend, dtype=dtype, raw_dtype=raw_dtype)
    start_process = time.process_time_ns()
    start_wall = time.perf_counter_ns()
    for _ in range(number):
        audio_io.read_audio(audio_path, sample_rate=sample_rate, mono=mono,
                            backend=audio_backend, dtype=dtype, raw_dtype=raw_dtype)
    process_us = (time.process_time_ns() - start_process) / scale / number
    wall_us = (time.perf_counter_ns() - start_wall) / scale / number
    print(f'|{audio_path:>20}|{number:>5}|{audio_backend or "default":>10}'
          f'|{process_us:9.0f}|{wall_us:9.0f}|')


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest='cmd', required=True)
    c = sub.add_parser('timeit')
    c.add_argument('--audio-path', required=True)
    c.add_argument('--sample-rate', type=int, default=8000)
    c.add_argument('--mono', action='store_true')
    c.add_argument('--audio-backend', default=None,
                   choices=[None, 'native', 'scipy', 'soundfile', 'sox', 'ffmpeg'])
    c.add_argument('--number', type=int, default=100)
    c.add_argument('--number-warmup', type=int, default=3)
    c.add_argument('--scale', type=int, default=1000)
    c.add_argument('--raw-dtype', default='int16', choices=['int16', 'float32'])
    c.add_argument('--dtype', default='float32', choices=['int16', 'float32'])
    c.set_defaults(func=cmd_timeit)
    return parser


def main(argv=None):
    args = vars(build_parser().parse_args(argv))
    args.pop('cmd')
    func = args.pop('func')
    func(**args)


if __name__ == '__main__':
    main()
