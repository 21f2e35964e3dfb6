"""Tracing / timing harness (SURVEY.md §5: the reference has no profiling at
all — tqdm bars and wall-clock prints only, train_caption.py:126,173).

  with trace("/tmp/tb"):            # jax.profiler trace (view in XProf)
      step_fn(state, batch)

  t = timeit_readback(fn, *args)    # honest per-call seconds: forces a
                                    # scalar readback, because this
                                    # environment's async dispatch makes
                                    # block_until_ready unreliable
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _checksum(tree: Any) -> float:
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.number)]
    total = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
    return float(total)


def timeit_readback(fn: Callable, *args, repeats: int = 3,
                    warmup: int = 1) -> Dict[str, float]:
    """Times fn(*args) end-to-end including a host readback of a checksum
    over its outputs. Returns {'min', 'mean', 'max'} seconds."""
    for _ in range(warmup):
        _checksum(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _checksum(fn(*args))
        times.append(time.perf_counter() - t0)
    return {"min": float(np.min(times)), "mean": float(np.mean(times)),
            "max": float(np.max(times))}
