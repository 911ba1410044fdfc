"""Prefetching episode loader.

The reference leans on torch DataLoader worker processes
(`/root/reference/mpti_train_noise.py:57`); here a thread pool overlaps
host-side episode assembly (numpy, releases the GIL in np.load/shuffle)
with device compute, and stacks `episode_batch` episodes into one batched
Episode so the device executes one fused step per batch.

Two scheduling modes:
  * ordered=True (default): batch i is always produced by worker
    i % n_workers, and batches are yielded strictly in index order.  With
    per-worker seeded samplers a run is bit-reproducible regardless of
    thread scheduling.
  * ordered=False: workers race for batch slots and the queue order depends
    on thread timing — marginally better tail latency, not reproducible.

Worker exceptions (e.g. a sampler ValueError when a class has too few
scans) propagate to the consuming iterator instead of hanging it.
"""
from __future__ import annotations

import heapq
import queue
import threading
from typing import Callable, Iterator, Optional

from r3dfsseg_tpu.models.episode import Episode, stack_episodes


class _WorkerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def device_put_prefetch(it, n: int = 2, put=None):
    """Keep `n` batches in flight to the device.

    `jax.device_put` is asynchronous on real TPU runtimes, so issuing the
    transfer for batch i+1 before batch i's step completes hides the
    ~1 MB/episode H2D copy.  The put stays on the CALLING thread: on this
    container's tunnelled backend a device_put running concurrently with a
    jit compile on another thread deadlocks the tunnel client (observed,
    reproducible), so no background thread here.  Pass `put` to place with
    a sharding (episode-DP)."""
    import jax

    put = put or jax.device_put
    from collections import deque
    buf = deque()
    for item in it:
        buf.append(put(item))
        if len(buf) >= max(n, 1):
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def prefetch_iter(it, prefetch: int = 4):
    """Run an iterator on a background thread, keeping up to `prefetch`
    items ready.  Order-preserving; exceptions re-raise at the consumer.
    Used by the eval path so h5 episode reads overlap device compute
    (the reference reads serially inline, eval_noise.py:85)."""
    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    _end = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:
            q.put(_WorkerError(e))
        q.put(_end)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _end:
            return
        if isinstance(item, _WorkerError):
            raise item.exc
        yield item


class EpisodeLoader:
    def __init__(self, sample_fn: Callable[[], Episode], *,
                 num_batches: int, episode_batch: int = 1,
                 n_workers: int = 2, prefetch: int = 4,
                 worker_fns: Optional[list] = None,
                 ordered: bool = True):
        """`sample_fn` is used by a single worker; for n_workers > 1 pass
        `worker_fns` (one independent sampler per worker — numpy Generators
        are not thread-safe)."""
        self.worker_fns = worker_fns or [sample_fn]
        self.num_batches = num_batches
        self.episode_batch = episode_batch
        self.prefetch = prefetch
        self.ordered = ordered

    def __len__(self):
        return self.num_batches

    def _make_batch(self, fn):
        eps = [fn() for _ in range(self.episode_batch)]
        return stack_episodes(eps) if self.episode_batch > 1 else eps[0]

    def __iter__(self) -> Iterator[Episode]:
        q: "queue.Queue" = queue.Queue(maxsize=max(self.prefetch, 1))
        stop = threading.Event()
        n_workers = len(self.worker_fns)
        # In-order release uses a pending buffer on the consumer side, so
        # the queue's maxsize alone cannot bound memory (a stalled worker
        # would let the others run arbitrarily far ahead).  Workers instead
        # wait until their next index is within `window` of consumption.
        window = max(self.prefetch, 1) + n_workers
        cond = threading.Condition()
        progress = {"yielded": 0}

        if self.ordered:
            def worker(w, fn):
                for i in range(w, self.num_batches, n_workers):
                    with cond:
                        while (not stop.is_set()
                               and i - progress["yielded"] >= window):
                            cond.wait(timeout=0.2)
                    if stop.is_set():
                        return
                    try:
                        item = (i, self._make_batch(fn))
                    except BaseException as e:  # propagate to consumer
                        item = (i, _WorkerError(e))
                    q.put(item)
        else:
            counter = {"n": 0}
            lock = threading.Lock()

            def worker(w, fn):
                while not stop.is_set():
                    with lock:
                        if counter["n"] >= self.num_batches:
                            return
                        i = counter["n"]
                        counter["n"] += 1
                    try:
                        item = (i, self._make_batch(fn))
                    except BaseException as e:
                        item = (i, _WorkerError(e))
                    q.put(item)

        threads = [threading.Thread(target=worker, args=(w, fn), daemon=True)
                   for w, fn in enumerate(self.worker_fns)]
        for t in threads:
            t.start()
        pending: list = []   # (index, batch) heap for in-order release
        next_idx = 0
        try:
            while next_idx < self.num_batches:
                if self.ordered:
                    while not (pending and pending[0][0] == next_idx):
                        heapq.heappush(pending, q.get())
                    _, batch = heapq.heappop(pending)
                else:
                    _, batch = q.get()
                if isinstance(batch, _WorkerError):
                    raise batch.exc
                next_idx += 1
                with cond:
                    progress["yielded"] = next_idx
                    cond.notify_all()
                yield batch
        finally:
            stop.set()
            with cond:
                cond.notify_all()
            # drain so workers blocked on put() can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def group_equal_shape(gen, t_batch: int, get_batch=lambda x: x):
    """Group consecutive items whose episode batch has an identical
    support_x shape into lists of up to ``t_batch`` (ragged/odd-shaped
    tails ship alone).  Shared by both CLIs' super-batched H2D transfer
    paths (one device_put per group amortises the link round-trip)."""
    buf: list = []
    last = None
    for item in gen:
        shape = get_batch(item).support_x.shape
        if buf and (shape != last or len(buf) >= max(t_batch, 1)):
            yield buf
            buf = []
        buf.append(item)
        last = shape
    if buf:
        yield buf


def stack_superbatch(batches):
    """Stack a group of equal-shaped episode batches along a new leading
    transfer axis (numpy, host side)."""
    import jax
    import numpy as np
    if len(batches) == 1:
        return batches[0]
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def make_take_i():
    """One jitted on-device slicer: superbatch tree + index -> one step's
    batch (a single dispatch per step; dynamic_index keeps one executable
    for every i)."""
    import jax
    return jax.jit(lambda tree, i: jax.tree.map(
        lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
        tree))
