"""Compact mmap-able binary n-gram LM ("CNLM") — the KenLM-binary replacement.

The reference's documented LM workflow converts ARPA text to a binary KenLM
model because a real word LM is hundreds of MB as text and slow to parse per
process (/root/reference/README.md:152-172; ctcdecode loads the binary,
decoders.py:19-45). This module is the TPU-framework equivalent: an offline
`build_binary_lm(arpa, out)` conversion plus a `BinaryLM` loader that memory-
maps the n-gram bulk with ZERO parsing — load time is O(vocab) (a few ms per
100k words), independent of n-gram count, and the pages are shared between
processes mapping the same file.

Format (little-endian, 8-byte-aligned sections)::

    0   8s   magic  b'CNLMBIN1'
    8   u32  order
    12  u32  vocab_size
    16  u64  vocab_blob_bytes
    24  u64  counts[order]
    ..  vocab blob: vocab_size NUL-terminated UTF-8 strings (id = index)
    ..  per order n = 1..order:
          u64 hash[counts[n-1]]   (sorted ascending)
          f32 logp[counts[n-1]]   (natural log)
          f32 backoff[counts[n-1]] (natural log)

Each n-gram is keyed by a 64-bit FNV-1a/fmix64 fingerprint of its word-id
sequence (ids assigned by unigram order). Lookup is a binary search on the
sorted hash array — same O(log N) as KenLM's trie, no pointer chasing. A
64-bit fingerprint collides with probability ~N^2/2^65 (~3e-5 at 100M
n-grams) — the same accepted trade as KenLM's hashed probing format.

The same format is mmap-loaded by the C++ beam decoder (native/ctc_beam.cpp
NgramLM::load_binary) with a bit-identical hash, so `.binlm` files work
everywhere an `.arpa` does (python ArpaLM fallback, C++ beam, char_lm_table).

CLI: ``python -m convasr_tpu.text.binlm model.arpa[.gz] model.binlm``.
"""
import gzip
import math
import mmap
import struct
import typing

import numpy as np

MAGIC = b'CNLMBIN1'
LOG10 = math.log(10.0)
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_FNV_OFFSET = 0xcbf29ce484222325
_FNV_PRIME = 0x100000001b3
_GOLDEN = 0x9e3779b97f4a7c15
# sentinel id for words absent from the LM vocab: hashes to a key that is
# (with fingerprint probability) never present, so any n-gram containing an
# OOV word misses — mirroring ArpaLM's string-keyed behavior
OOV_ID = 0xFFFFFFFF


def _fmix64(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xff51afd7ed558ccd)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xc4ceb9fe1a85ec53)
    h = h ^ (h >> np.uint64(33))
    return h


def ngram_hash_many(ids: np.ndarray) -> np.ndarray:
    """Vectorized fingerprint of each ROW of an (N, n) uint32 id matrix."""
    ids = np.asarray(ids, np.uint64)
    with np.errstate(over='ignore'):
        h = np.full(ids.shape[0], _FNV_OFFSET, np.uint64)
        for col in range(ids.shape[1]):
            h = (h ^ (ids[:, col] + np.uint64(_GOLDEN))) * np.uint64(_FNV_PRIME)
        return _fmix64(h)


def ngram_hash(ids: typing.Sequence[int]) -> int:
    return int(ngram_hash_many(np.asarray([ids], np.uint64))[0])


def _opener(path):
    return gzip.open(path, 'rt', encoding='utf-8') \
        if str(path).endswith('.gz') else open(path, 'rt', encoding='utf-8')


def build_binary_lm(arpa_path: str, out_path: str) -> str:
    """Offline ARPA -> CNLM conversion (the `kenlm/build_binary` analog).

    One streaming pass over the ARPA text; per order the (hash, logp, backoff)
    triples are sorted by hash and written as parallel arrays."""
    vocab: typing.Dict[str, int] = {}
    per_order_ids: typing.List[typing.List[typing.List[int]]] = []
    per_order_vals: typing.List[typing.List[typing.Tuple[float, float]]] = []
    current = 0
    with _opener(arpa_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('\\data\\'):
                continue
            if line.startswith('\\end\\'):
                break
            if line.startswith('\\') and line.endswith('-grams:'):
                current = int(line[1:line.index('-')])
                while len(per_order_ids) < current:
                    per_order_ids.append([])
                    per_order_vals.append([])
                continue
            if current == 0:
                continue
            parts = line.split()
            if len(parts) < 1 + current:
                continue
            logp = float(parts[0]) * LOG10
            words = parts[1:1 + current]
            backoff = float(parts[1 + current]) * LOG10 \
                if len(parts) > 1 + current else 0.0
            ids = []
            for w in words:
                wid = vocab.get(w)
                if wid is None:
                    wid = len(vocab)
                    vocab[w] = wid
                ids.append(wid)
            per_order_ids[current - 1].append(ids)
            per_order_vals[current - 1].append((logp, backoff))

    order = len(per_order_ids)
    assert order > 0, f'no n-gram sections found in {arpa_path}'
    blob = b'\0'.join(w.encode('utf-8') for w in vocab) + b'\0'
    counts = [len(v) for v in per_order_ids]

    with open(out_path, 'wb') as out:
        out.write(MAGIC)
        out.write(struct.pack('<IIQ', order, len(vocab), len(blob)))
        out.write(struct.pack(f'<{order}Q', *counts))
        out.write(blob)
        out.write(b'\0' * (-out.tell() % 8))
        for n in range(1, order + 1):
            ids = np.asarray(per_order_ids[n - 1], np.uint32).reshape(-1, n)
            vals = np.asarray(per_order_vals[n - 1], np.float32).reshape(-1, 2)
            h = ngram_hash_many(ids)
            sort = np.argsort(h, kind='stable')
            out.write(np.ascontiguousarray(h[sort]).tobytes())
            out.write(np.ascontiguousarray(vals[sort, 0]).tobytes())
            out.write(np.ascontiguousarray(vals[sort, 1]).tobytes())
            out.write(b'\0' * (-out.tell() % 8))
    return out_path


def is_binary_lm(path: str) -> bool:
    try:
        with open(path, 'rb') as f:
            return f.read(8) == MAGIC
    except OSError:
        return False


class BinaryLM:
    """mmap loader scoring-compatible with `decode.beam.ArpaLM` (same Katz
    backoff chain, natural-log scores), so it drops into BeamSearchDecoder's
    python fallback and `char_lm_table` device fusion unchanged."""

    def __init__(self, path: str):
        self.path = str(path)   # native rescoring fast path (decode/beam.py)
        self._f = open(path, 'rb')
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        mm = self._mm
        assert mm[:8] == MAGIC, f'{path} is not a CNLM binary LM'
        self.order, vocab_size, blob_bytes = struct.unpack_from('<IIQ', mm, 8)
        counts = struct.unpack_from(f'<{self.order}Q', mm, 24)
        off = 24 + 8 * self.order
        blob = mm[off:off + blob_bytes]
        off += blob_bytes
        off += -off % 8
        # the only O(vocab) work at load: word -> id map from the blob
        words = blob.split(b'\0')[:-1]
        assert len(words) == vocab_size
        self.vocab = {w.decode('utf-8'): i for i, w in enumerate(words)}
        self._hash: typing.List[np.ndarray] = []
        self._logp: typing.List[np.ndarray] = []
        self._backoff: typing.List[np.ndarray] = []
        for n in range(self.order):
            c = counts[n]
            self._hash.append(np.frombuffer(mm, np.uint64, c, off))
            off += 8 * c
            self._logp.append(np.frombuffer(mm, np.float32, c, off))
            off += 4 * c
            self._backoff.append(np.frombuffer(mm, np.float32, c, off))
            off += 4 * c
            off += -off % 8
        unk = self.vocab.get('<unk>')
        self._unk_logp = None
        if unk is not None:
            found, logp, _ = self._lookup([unk])
            if found:
                self._unk_logp = logp

    def _lookup(self, ids: typing.Sequence[int]):
        n = len(ids)
        if n > self.order:
            return False, 0.0, 0.0
        h = np.uint64(ngram_hash(ids))
        arr = self._hash[n - 1]
        i = int(np.searchsorted(arr, h))
        if i < arr.shape[0] and arr[i] == h:
            return True, float(self._logp[n - 1][i]), \
                float(self._backoff[n - 1][i])
        return False, 0.0, 0.0

    def score(self, context_words: typing.Sequence[str]) -> float:
        """log P(w_last | preceding words) — ArpaLM.score semantics."""
        ids = [self.vocab.get(w, OOV_ID)
               for w in context_words[-self.order:]]
        total = 0.0
        while ids:
            found, logp, _ = self._lookup(ids)
            if found:
                return total + logp
            if len(ids) == 1:
                unk = self._unk_logp
                return total + (unk if unk is not None else -10.0 * LOG10)
            ctx_found, _, ctx_backoff = self._lookup(ids[:-1])
            if ctx_found:
                total += ctx_backoff
            ids = ids[1:]
        return -float('inf')


def main():
    import argparse
    import os
    import time
    ap = argparse.ArgumentParser(
        description='convert ARPA text to the mmap-able CNLM binary format')
    ap.add_argument('arpa')
    ap.add_argument('out')
    args = ap.parse_args()
    tic = time.time()
    build_binary_lm(args.arpa, args.out)
    print(f'{args.out}: {os.path.getsize(args.out) / 1e6:.1f} MB '
          f'in {time.time() - tic:.1f} s')


if __name__ == '__main__':
    main()
