"""Batched, threaded data loading.

Replaces torch.utils.data.DataLoader (train_bid_pointconv.py:70-95): a
thread-pool prefetches and collates fixed-shape numpy batches while the TPU
step runs — host IO overlaps device compute. (A C++ npy loader core can slot
under `_load_one` later; the interface is already batch-in/arrays-out.)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
              List[str]]


def collate(samples: Sequence) -> Batch:
    pc1 = np.stack([s[0] for s in samples]).astype(np.float32)
    pc2 = np.stack([s[1] for s in samples]).astype(np.float32)
    norm1 = np.stack([s[2] for s in samples]).astype(np.float32)
    norm2 = np.stack([s[3] for s in samples]).astype(np.float32)
    sf = np.stack([s[4] for s in samples]).astype(np.float32)
    paths = [s[5] for s in samples]
    return pc1, pc2, norm1, norm2, sf, paths


class DataLoader:
    """Iterate fixed-size batches with optional shuffling and background
    prefetch.

    drop_last=True for training (keeps the jitted step shape static);
    eval keeps every sample by padding the final batch is NOT done — eval
    uses batch_size=1 like the reference (config_evaluate_*.yaml)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_workers: int = 2, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Batch]:
        batches = self._batch_indices()
        if self.num_workers <= 0:
            for idxs in batches:
                yield collate([self.dataset[int(i)] for i in idxs])
            return

        q: "queue.Queue[Optional[Tuple[int, Batch]]]" = queue.Queue(
            maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    q.put(collate([self.dataset[int(i)] for i in idxs]))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
