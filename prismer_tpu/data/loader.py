"""Prefetching data loader (thread or forked-process workers).

Replaces torch DataLoader (dataset/__init__.py:36-43: shuffle+drop_last in
train, 8 workers). Decode/augment is PIL+numpy; PIL releases the GIL for
the pixel work, so thread workers scale partially — `worker_type="process"`
forks worker processes (torch-DataLoader-style) for full multi-core scaling
of the Python-side transform glue. Measured cost of the full 6-expert 480px
record (decode + joint Transform/RandAugment + tensorize,
tools/bench_input_pipeline.py): 17.8 records/sec/core with the native
libpng label path (default) vs 10.6 with PIL — one chip's appetite
(~216 img/s, BENCH) needs ~12 cores of workers.

Batches are collated to contiguous numpy arrays ready for a single
device_put. Per-process sharding (`shard_id`/`num_shards`) replaces
accelerate's injected DistributedSampler for multi-host runs.

Fork safety: workers must not touch jax/TPU state — they only run
PIL/numpy; the parent keeps the device runtime.
"""

from __future__ import annotations

import multiprocessing
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

_WORKER_DS = None


def _proc_init(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _proc_get(index):
    return _WORKER_DS[index]


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
                 prefetch: int = 4, drop_last: Optional[bool] = None,
                 worker_type: str = "auto"):
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
        assert worker_type in ("thread", "process", "auto"), worker_type
        if worker_type == "auto":
            # the record pipeline (PIL decode + RandAugment + tensorize) is
            # largely GIL-bound python, so a thread pool cannot exceed ~1
            # core of it; the fork pool can use every core. On a 1-core
            # host forking only adds overhead (measured: 14.8 thread vs
            # 13.8 process rec/s, tools/bench_input_pipeline.py — numbers
            # in README), so auto picks processes exactly when >1 core is
            # available. PRISMER_WORKER_TYPE=thread|process overrides.
            env = os.environ.get("PRISMER_WORKER_TYPE")
            if env:
                worker_type = env
            else:
                try:
                    cores = len(os.sched_getaffinity(0))
                except AttributeError:
                    cores = os.cpu_count() or 1
                worker_type = ("process" if self.num_workers >= 2
                               and cores >= 2 and hasattr(os, "fork")
                               else "thread")
        self.worker_type = worker_type
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
            if self.worker_type == "process":
                ctx = multiprocessing.get_context("fork")
                pool = ctx.Pool(self.num_workers, initializer=_proc_init,
                                initargs=(self.dataset,))
                get, close = pool.map, pool.terminate
                fn = _proc_get
            else:
                pool = ThreadPoolExecutor(self.num_workers)
                get, close = pool.map, lambda: pool.shutdown(wait=False)
                fn = self.dataset.__getitem__
            try:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    records = list(get(fn, list(batch_idx)))
                    q.put(self.collate(records))
            finally:
                close()
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
