"""Threaded prefetching data loader.

Replaces torch DataLoader (dataset/__init__.py:36-43: shuffle+drop_last in
train, 8 workers). Decode/augment is PIL+numpy (releases the GIL for the
heavy parts); batches are collated to contiguous numpy arrays ready for a
single device_put. Per-process sharding (`shard_id`/`num_shards`) replaces
accelerate's injected DistributedSampler for multi-host runs.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np


def default_collate(records: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack numpy leaves; lists of strings stay lists."""
    out: Dict[str, Any] = {}
    first = records[0]
    for key, val in first.items():
        vals = [r[key] for r in records]
        if isinstance(val, dict):
            out[key] = default_collate(
                [dict(v) for v in vals])
        elif isinstance(val, np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(val, (np.floating, np.integer, float, int)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals  # strings etc.
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, train: bool,
                 num_workers: int = 8, seed: int = 42,
                 shard_id: int = 0, num_shards: int = 1,
                 collate_fn: Optional[Callable] = None,
                 prefetch: int = 4, drop_last: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.collate = collate_fn or default_collate
        self.prefetch = prefetch
        self.drop_last = train if drop_last is None else drop_last
        self.epoch = 0

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.train:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard_id::self.num_shards]

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = self._indices()
        if self.drop_last:
            idx = idx[: (len(idx) // self.batch_size) * self.batch_size]
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        self.epoch += 1

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    records = list(pool.map(self.dataset.__getitem__,
                                            batch_idx))
                    q.put(self.collate(records))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def create_loader(dataset, batch_size: int, num_workers: int = 8,
                  train: bool = False, **kw) -> DataLoader:
    """Factory matching dataset/__init__.py:36-43."""
    return DataLoader(dataset, batch_size=batch_size, train=train,
                      num_workers=num_workers, **kw)
