"""Minimal high-throughput data loader: indexable dataset → shuffled,
batched, host-prefetched numpy batches.

The reference leans on torch ``DataLoader`` (``num_workers: 8``,
``srdiff/config.yaml:38``); here a thread pool maps ``dataset[i]`` and a
bounded queue keeps ``prefetch`` batches ready so the host never stalls the
TPU step. Batches are stacked numpy pytrees — ``jax.device_put`` (inside the
trainer/pipeline) moves them to HBM.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator

import numpy as np


def _stack(samples: list) -> Any:
    first = samples[0]
    if isinstance(first, dict):
        return {k: _stack([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(_stack([s[i] for s in samples]) for i in range(len(first)))
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        endless: bool = False,
        collate_fn: Callable | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.endless = endless
        self.collate_fn = collate_fn or _stack

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Any]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _SENTINEL = object()

        def producer():
            epoch = 0
            with ThreadPoolExecutor(self.num_workers) as pool:
                while not stop.is_set():
                    idx = self._epoch_indices(epoch)
                    nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
                    for b in range(nb):
                        if stop.is_set():
                            return
                        sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                        samples = list(pool.map(self.dataset.__getitem__, sel))
                        q.put(self.collate_fn(samples))
                    if not self.endless:
                        break
                    epoch += 1
            q.put(_SENTINEL)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    return
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
