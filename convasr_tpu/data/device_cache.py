"""Device-resident training-set cache: the whole corpus lives in HBM.

TPU-first design with no reference counterpart (the reference streams every
batch host->GPU via the torch DataLoader, train.py:733-830): 8 kHz int16
speech is tiny next to HBM — 16 GB holds ~270 hours — so for corpora that
fit, the audio (and targets) are uploaded ONCE, grouped by bucket, and each
training step ships only a (B,) int32 row-index vector. The gather
x = cache_x[rows] runs on device inside the jitted step.

Motivation (measured, scripts/train_feed_probe.py + the CLI itself on the
tunneled v5e): the host->device link sustains 8-120 MB/s (time-varying),
so streaming float32 audio caps the train step at 1.6-2.8 s (int16
transport: ~0.7 s) against a 124 ms compute bound. With the cache the step
is compute-bound again regardless of link weather. On locally-attached
hosts the same cache removes the per-step PCIe traffic.

Rows are padded to the BUCKET's padded length (not the per-batch max as the
streaming collate does, dataset.py:274-306), so each bucket compiles exactly
one program; xlen carries the valid fraction relative to that padded length
(reference collate convention, datasets.py:305-332).
"""
import logging
import math

import numpy as np

log = logging.getLogger('convasr_tpu.data')

SMAX = 32767.0


class DeviceDatasetCache:
    """Build with `DeviceDatasetCache.build(dataset, ...)`, then
    `rows, bucket = cache.locate(batch_indices)` per step and pass
    `cache.device[bucket]` (a dict of device arrays) to the jitted step."""

    def __init__(self, buckets_host, pos, bucket_of, nbytes):
        self.host = buckets_host      # bucket_id -> dict(x, xlen, y, ylen) numpy
        self.pos = pos                # global dataset idx -> row within bucket
        self.bucket_of = bucket_of    # global dataset idx -> bucket_id
        self.nbytes = nbytes
        self.device = {}              # bucket_id -> dict of jax arrays

    @staticmethod
    def build(dataset, time_padding_multiple: int = 1, num_workers: int = 0,
              max_bytes: int = 12 << 30):
        """One prefetched pass over the dataset; audio stored as int16
        (bit-exact transport for int16-sourced corpora, see
        cli/train.py transport_cast)."""
        from .loader import prefetch_map
        n = len(dataset)
        bucket_ids = np.asarray(dataset.bucket)

        # ONE prefetched pass decoding every utterance, staged per bucket
        items = prefetch_map(dataset.__getitem__, range(n), num_workers=num_workers)

        pos = np.zeros(n, np.int64)
        mult = max(time_padding_multiple, 1)
        staged = {}  # bucket -> list of (global_idx, x_row int16, T_true, ys, ylens)
        for i, item in enumerate(items):
            meta, s, x, *ys = item
            b = int(bucket_ids[i])
            x_row = np.asarray(x)
            if x_row.ndim == 2:      # (C, T) -> mono channel 0
                x_row = x_row[0]
            if x_row.dtype != np.int16:
                x_row = (np.clip(x_row, -1.0, 1.0) * SMAX).round().astype(np.int16)
            staged.setdefault(b, []).append((i, x_row, [np.asarray(t) for t in ys]))

        buckets_host, nbytes = {}, 0
        for b, rows in staged.items():
            T_b = int(math.ceil(max(r[1].shape[-1] for r in rows) / mult)) * mult
            T_b = max(T_b, mult)
            H = len(rows[0][2])
            L_b = max(int(math.ceil(max(r[2][j].shape[-1] for r in rows) / mult)) * mult
                      for j in range(H)) if H else 1
            N_b = len(rows)
            x = np.zeros((N_b, T_b), np.int16)
            xlen = np.zeros((N_b,), np.float32)
            y = np.zeros((N_b, H, L_b), np.int32)
            ylen = np.zeros((N_b, H), np.int32)
            for r, (gi, x_row, ys) in enumerate(rows):
                pos[gi] = r
                x[r, :x_row.shape[-1]] = x_row
                xlen[r] = x_row.shape[-1] / T_b if T_b else 1.0
                for j, t in enumerate(ys):
                    y[r, j, :t.shape[-1]] = t
                    ylen[r, j] = len(t)
            buckets_host[b] = dict(x=x, xlen=xlen, y=y, ylen=ylen)
            nbytes += sum(a.nbytes for a in buckets_host[b].values())
        if nbytes > max_bytes:
            raise MemoryError(
                f'device cache would need {nbytes / 1e9:.1f} GB '
                f'(> {max_bytes / 1e9:.1f} GB cap) — train without --device-cache')
        log.info(f'device cache: {n} utterances, {len(buckets_host)} buckets, '
                 f'{nbytes / 1e6:.1f} MB resident')
        return DeviceDatasetCache(buckets_host, pos, bucket_ids, nbytes)

    def upload(self, sharding=None):
        """One-time host->device transfer of every bucket (int16 rows).
        `sharding` (e.g. a replicated NamedSharding) places the cache for an
        SPMD mesh so the jitted gather does not re-transfer per step."""
        import jax
        import jax.numpy as jnp
        for b, arrs in self.host.items():
            self.device[b] = {
                k: (jax.device_put(v, sharding) if sharding is not None
                    else jnp.asarray(v)) for k, v in arrs.items()}
        self.host = None  # free host copy
        return self

    def upload_sharded(self, mesh, axis: str = 'data'):
        """Row-sharded upload over the mesh's data axis: device d holds rows
        [d*N/D, (d+1)*N/D) of each bucket, so cached-corpus CAPACITY scales
        linearly with pod size (VERDICT r2 #4 — the replicated mode costs
        HBM x N_devices for the same corpus; this mode costs it once total:
        a v5e-8 pod holds ~270 h replicated but ~2,100 h sharded).

        Buckets are zero-padded to a multiple of the axis size (padding rows
        are never referenced — `pos` only maps real utterances). Works
        single- and multi-process: `make_array_from_callback` pulls each
        device's row block from this host's full copy of the bucket (every
        process builds the full dataset or reads the rank-0 cache, so any
        requested index is servable locally)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        D = mesh.shape[axis]
        for b, arrs in self.host.items():
            dev = {}
            n = arrs['x'].shape[0]
            n_pad = int(math.ceil(n / D)) * D
            for k, v in arrs.items():
                if n_pad != n:
                    v = np.concatenate(
                        [v, np.zeros((n_pad - n,) + v.shape[1:], v.dtype)])
                spec = P(axis, *([None] * (v.ndim - 1)))
                sharding = NamedSharding(mesh, spec)
                dev[k] = jax.make_array_from_callback(
                    v.shape, sharding, lambda idx, v=v: v[idx])
            self.device[b] = dev
        self.host = None
        return self

    def locate(self, batch_indices):
        """Dataset indices -> (bucket_id, row indices). The bucketing sampler
        guarantees a batch stays within one bucket."""
        idx = np.asarray(batch_indices)
        b = int(self.bucket_of[idx[0]])
        assert (self.bucket_of[idx] == b).all(), 'batch spans buckets'
        return b, self.pos[idx].astype(np.int32)


def gather_batch(cache, rows):
    return dict(x=cache['x'][rows], xlen=cache['xlen'][rows],
                y=cache['y'][rows], ylen=cache['ylen'][rows])


def make_cached_train_step(train_step):
    """Wrap a train_step(state, batch, key) so the batch is GATHERED on
    device from resident cache arrays: only `rows` (B,) crosses the link."""
    def cached_step(state, cache, rows, key):
        return train_step(state, gather_batch(cache, rows), key)
    return cached_step


def make_sharded_gather(mesh, axis: str = 'data'):
    """Distributed row gather from a cache uploaded with `upload_sharded`.

    Each device owns a contiguous row block of the bucket. The global row
    vector arrives sharded P(data) (same feed as streaming batches — each
    host ships only its slice); inside the shard each device all-gathers the
    (tiny) row vector, gathers the rows it owns (one-hot masked), a psum
    over the data axis assembles the full batch (exact — only one shard
    contributes to any row), and each device keeps its own B/D slice,
    yielding a batch sharded P(data) exactly as the streaming feed produces.
    Communication is O(B*T) on ICI per step — independent of corpus size.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    D = mesh.shape[axis]

    def local(cache_blk, rows_local):
        d = jax.lax.axis_index(axis)
        rows = jax.lax.all_gather(rows_local, axis, tiled=True)  # (B,) global
        nloc = cache_blk['x'].shape[0]
        li = rows - d * nloc
        hit = (li >= 0) & (li < nloc)
        lic = jnp.clip(li, 0, nloc - 1)
        B = rows.shape[0]
        bl = B // D
        out = {}
        for k, v in cache_blk.items():
            g = v[lic]
            orig_dtype = g.dtype
            if g.dtype == jnp.int16:   # psum lacks an int16 path; exact via i32
                g = g.astype(jnp.int32)
            g = jnp.where(hit.reshape((B,) + (1,) * (g.ndim - 1)), g, 0)
            g = jax.lax.psum(g, axis)
            g = jax.lax.dynamic_slice_in_dim(g, d * bl, bl, 0)
            out[k] = g.astype(orig_dtype)
        return out

    def gather(cache, rows):
        cache_specs = {k: P(axis, *([None] * (v.ndim - 1)))
                       for k, v in cache.items()}
        out_specs = {k: P(axis, *([None] * (v.ndim - 1)))
                     for k, v in cache.items()}
        return shard_map(local, mesh=mesh, in_specs=(cache_specs, P(axis)),
                         out_specs=out_specs, check_vma=False)(cache, rows)

    return gather


def make_sharded_cached_step(train_step, mesh, axis: str = 'data'):
    """Cached step over a ROW-SHARDED corpus (see make_sharded_gather)."""
    gather = make_sharded_gather(mesh, axis)

    def cached_step(state, cache, rows, key):
        return train_step(state, gather(cache, rows), key)
    return cached_step


def make_sharded_cached_multi_step(train_step, mesh, axis: str = 'data'):
    import jax
    gather = make_sharded_gather(mesh, axis)

    def cached_multi(state, cache, rows_k, keys):
        def body(state, rk):
            rows, key = rk
            return train_step(state, gather(cache, rows), key)
        return jax.lax.scan(body, state, (rows_k, keys))
    return cached_multi


def make_cached_multi_step(train_step):
    """Scan K cached steps inside ONE dispatch: rows_k is (K, B), keys
    (K, 2) — ~1 KB per dispatch instead of K full audio batches, so the
    per-dispatch latency amortizes with zero upload cost."""
    import jax

    def cached_multi(state, cache, rows_k, keys):
        def body(state, rk):
            rows, key = rk
            return train_step(state, gather_batch(cache, rows), key)
        return jax.lax.scan(body, state, (rows_k, keys))
    return cached_multi
