"""Dynamic request batching for the gRPC server.

Beyond the reference (serve_google_api.py handles each Recognize on its own
threadpool thread with a B=1 forward): concurrent requests that arrive within
a small window are stacked into ONE padded batch and answered by a single
device dispatch. On the tunneled axon platform every dispatch+fetch costs
~26-31 ms regardless of batch size (CLAUDE.md), so batching K concurrent
requests multiplies sustainable rps by ~K at unchanged latency.

Shapes stay jit-stable: audio is already bucket-padded to a shared T by the
caller, and the batch dim is always padded up to `max_batch` with silent rows
(their xlen=1 dummies are discarded), so each T bucket compiles exactly one
(max_batch, T) program.
"""
import queue
import threading
import time

import numpy as np


class _Pending:
    __slots__ = ('x', 'xlen', 'event', 'result', 'error')

    def __init__(self, x, xlen):
        self.x = x            # (T,) float32, bucket-padded
        self.xlen = xlen      # true fraction of T
        self.event = threading.Event()
        self.result = None
        self.error = None


class DynamicBatcher:
    """Gathers concurrent fused-forward requests into one padded batch.

    forward_fused: callable (B, T) x (B,) -> np-convertible (B, T', 2)
    max_batch: rows per compiled program (batch dim is padded to this)
    max_wait_ms: how long the leader waits for followers to pile in
    """

    def __init__(self, forward_fused, max_batch: int = 8, max_wait_ms: float = 5.0,
                 dtype=np.float32):
        self.forward_fused = forward_fused
        self.max_batch = max(int(max_batch), 1)
        self.max_wait = max_wait_ms / 1e3
        self.dtype = dtype  # int16 rows halve the host->device upload
        self.queues = {}          # T -> queue.Queue of _Pending
        self.lock = threading.Lock()
        self.dispatches = 0       # device dispatch counter (for tests/stats)
        self.served = 0

    def _queue_for(self, T: int) -> queue.Queue:
        with self.lock:
            q = self.queues.get(T)
            if q is None:
                q = self.queues[T] = queue.Queue()
                threading.Thread(target=self._worker, args=(T, q),
                                 daemon=True).start()
            return q

    def _worker(self, T: int, q: queue.Queue):
        import jax.numpy as jnp
        while True:
            batch = [q.get()]                      # block for a leader
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(q.get(timeout=remaining))
                except queue.Empty:
                    break
            x = np.zeros((self.max_batch, T), self.dtype)
            xlen = np.ones((self.max_batch,), np.float32)
            for i, p in enumerate(batch):
                x[i] = p.x
                xlen[i] = p.xlen
            try:
                out = self.forward_fused(jnp.asarray(x), jnp.asarray(xlen))
                with self.lock:
                    self.dispatches += 1
                    self.served += len(batch)
                if isinstance(out, tuple):
                    # multi-output forwards (e.g. the fused forward+device-
                    # beam program: tokens/lengths/scores) — slice each
                    outs = tuple(np.asarray(o) for o in out)
                    for i, p in enumerate(batch):
                        p.result = tuple(o[i:i + 1] for o in outs)
                else:
                    packed = np.asarray(out)
                    for i, p in enumerate(batch):
                        p.result = packed[i:i + 1]  # keep the (1, T', 2) shape
            except Exception as e:                  # surface to every waiter
                for p in batch:
                    p.error = e
            for p in batch:
                p.event.set()

    def __call__(self, x: np.ndarray, xlen: float) -> np.ndarray:
        """x: (T,) bucket-padded samples; returns (1, T', 2) packed output."""
        p = _Pending(np.asarray(x, self.dtype), float(xlen))
        self._queue_for(len(p.x)).put(p)
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result
