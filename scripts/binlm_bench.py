"""Load-time + memory benchmark for the CNLM binary LM at real-LM scale.

The point of the format (VERDICT r2 missing #1): the reference's ru word LMs
are hundreds of MB as ARPA text and get re-parsed by every process; KenLM
solves it with a binary mmap format, and this benchmarks our equivalent.

Generates a synthetic 4-gram ARPA (~200k vocab, ~7M n-grams — the scale of a
pruned production word LM), converts it with build_binary_lm, then measures:
  - python ArpaLM (text parse)   load time + RSS delta
  - python BinaryLM (mmap)       load time + RSS delta
  - C++ NgramLM text parse       load time (bsd_create)
  - C++ NgramLM binary mmap      load time (bsd_create)
  - query throughput on both python loaders (10k random scored contexts)

Usage: python scripts/binlm_bench.py [--ngrams 7000000] [--keep DIR]
"""
import argparse
import ctypes
import os
import pathlib
import resource
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def gen_arpa(path, n_total, vocab_size=200_000, seed=0):
    """Random (but well-formed) 4-gram ARPA at the requested n-gram count."""
    rng = np.random.RandomState(seed)
    counts = {1: vocab_size,
              2: int(n_total * 0.40),
              3: int(n_total * 0.35),
              4: n_total - vocab_size - int(n_total * 0.40) - int(n_total * 0.35)}
    tic = time.time()
    with open(path, 'w') as f:
        f.write('\\data\\\n')
        for n, c in counts.items():
            f.write(f'ngram {n}={c}\n')
        for n, c in counts.items():
            f.write(f'\n\\{n}-grams:\n')
            # vectorized line assembly in chunks
            done = 0
            while done < c:
                chunk = min(200_000, c - done)
                if n == 1:
                    ids = np.arange(done, done + chunk)[:, None]
                else:
                    ids = rng.randint(0, vocab_size, size=(chunk, n))
                logp = -rng.uniform(0.5, 6.0, size=chunk)
                bo = -rng.uniform(0.0, 2.0, size=chunk)
                rows = []
                for i in range(chunk):
                    words = '\t'.join(f'w{j}' for j in ids[i])
                    if n < 4:
                        rows.append(f'{logp[i]:.4f}\t{words}\t{bo[i]:.4f}')
                    else:
                        rows.append(f'{logp[i]:.4f}\t{words}')
                f.write('\n'.join(rows) + '\n')
                done += chunk
        f.write('\n\\end\\\n')
    print(f'ARPA generated: {os.path.getsize(path) / 1e6:.1f} MB '
          f'in {time.time() - tic:.1f} s')


def cpp_load_time(lm_path):
    from convasr_tpu.decode.beam import load_native
    lib = load_native()
    if lib is None:
        return None
    labels = [b'a', b'b', b' ', b'|']
    arr = (ctypes.c_char_p * len(labels))(*labels)
    tic = time.time()
    h = lib.bsd_create(arr, len(labels), 3, lm_path.encode(), 0.5, 0.0, 8, 4, 1.0)
    dt = time.time() - tic
    ok = lib.bsd_has_lm(h)
    lib.bsd_free(h)
    return dt if ok else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ngrams', type=int, default=7_000_000)
    ap.add_argument('--keep', default=None,
                    help='directory to generate into (kept); default tmp')
    args = ap.parse_args()

    d = pathlib.Path(args.keep or tempfile.mkdtemp(prefix='binlm_bench_'))
    d.mkdir(parents=True, exist_ok=True)
    arpa, binlm = str(d / 'big.arpa'), str(d / 'big.binlm')
    if not os.path.exists(arpa):
        gen_arpa(arpa, args.ngrams)

    from convasr_tpu.text.binlm import BinaryLM, build_binary_lm
    if not os.path.exists(binlm):
        tic = time.time()
        build_binary_lm(arpa, binlm)
        print(f'build_binary_lm: {time.time() - tic:.1f} s '
              f'-> {os.path.getsize(binlm) / 1e6:.1f} MB')

    # C++ loads first (separate allocations; report per-loader wall time)
    for name, path in [('C++ text parse', arpa), ('C++ binary mmap', binlm)]:
        dt = cpp_load_time(path)
        print(f'{name:22s} load: {dt:8.3f} s' if dt is not None
              else f'{name:22s} load: unavailable')

    r0 = rss_mb()
    tic = time.time()
    blm = BinaryLM(binlm)
    t_bin = time.time() - tic
    r1 = rss_mb()
    print(f'{"python BinaryLM mmap":22s} load: {t_bin:8.3f} s  '
          f'RSS +{r1 - r0:.0f} MB')

    rng = np.random.RandomState(1)
    ctxs = [[f'w{j}' for j in rng.randint(0, 200_000, size=3)]
            for _ in range(10_000)]
    tic = time.time()
    for c in ctxs:
        blm.score(c)
    print(f'{"BinaryLM":22s} 10k queries: {time.time() - tic:.2f} s')

    from convasr_tpu.decode.beam import ArpaLM
    r2 = rss_mb()
    tic = time.time()
    alm = ArpaLM(arpa)
    t_txt = time.time() - tic
    r3 = rss_mb()
    print(f'{"python ArpaLM text":22s} load: {t_txt:8.3f} s  '
          f'RSS +{r3 - r2:.0f} MB')
    tic = time.time()
    for c in ctxs:
        alm.score(c)
    print(f'{"ArpaLM":22s} 10k queries: {time.time() - tic:.2f} s')
    print(f'load speedup: {t_txt / t_bin:.0f}x')


if __name__ == '__main__':
    main()
