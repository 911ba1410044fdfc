"""Prefetching episode loader.

The reference leans on torch DataLoader worker processes
(`/root/reference/mpti_train_noise.py:57`); here a thread pool overlaps
host-side episode assembly (numpy, releases the GIL in np.load/shuffle)
with device compute, and stacks `episode_batch` episodes into one batched
Episode so the device executes one fused step per batch.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional

from r3dfsseg_tpu.models.episode import Episode, stack_episodes


class EpisodeLoader:
    def __init__(self, sample_fn: Callable[[], Episode], *,
                 num_batches: int, episode_batch: int = 1,
                 n_workers: int = 2, prefetch: int = 4,
                 worker_fns: Optional[list] = None):
        """`sample_fn` is used by a single worker; for n_workers > 1 pass
        `worker_fns` (one independent sampler per worker — numpy Generators
        are not thread-safe)."""
        self.worker_fns = worker_fns or [sample_fn]
        self.num_batches = num_batches
        self.episode_batch = episode_batch
        self.prefetch = prefetch

    def __len__(self):
        return self.num_batches

    def __iter__(self) -> Iterator[Episode]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        counter = {"n": 0}
        lock = threading.Lock()

        def worker(fn):
            while not stop.is_set():
                with lock:
                    if counter["n"] >= self.num_batches:
                        break
                    counter["n"] += 1
                eps = [fn() for _ in range(self.episode_batch)]
                batch = stack_episodes(eps) if self.episode_batch > 1 else eps[0]
                q.put(batch)

        threads = [threading.Thread(target=worker, args=(fn,), daemon=True)
                   for fn in self.worker_fns]
        for t in threads:
            t.start()
        try:
            for _ in range(self.num_batches):
                yield q.get()
        finally:
            stop.set()
            # drain so workers blocked on put() can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
