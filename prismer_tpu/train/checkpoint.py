"""Orbax checkpointing (reference: accelerator.save_state per epoch +
sidecar epoch.pt + cider.pt best-gating files, train_caption.py:162-176).

We save the full TrainState (params/opt_state/batch_stats/step) plus a
metadata dict {epoch, best_metric} in ONE checkpoint — no filesystem
handshake between processes (the reference's cider.pt cross-process gate is
a latent race; SURVEY.md §5)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from prismer_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState,
                    metadata: Optional[Dict[str, Any]] = None) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "rng": jax.random.key_data(state.rng),
        "metadata": dict(metadata or {}),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state: TrainState
                       ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of `state` (shapes/shardings from it)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "rng": jax.random.key_data(state.rng),
        "metadata": None,
    }
    restored = ckptr.restore(path, template)
    new_state = state.replace(
        step=restored["step"], params=restored["params"],
        opt_state=restored["opt_state"],
        batch_stats=restored["batch_stats"],
        rng=jax.random.wrap_key_data(restored["rng"]))
    return new_state, restored["metadata"] or {}


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export of a param tree (lightweight interchange format)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)
