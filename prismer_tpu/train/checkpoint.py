"""Orbax checkpointing (reference: accelerator.save_state per epoch +
sidecar epoch.pt + cider.pt best-gating files, train_caption.py:162-176).

We save the full TrainState (params/opt_state/batch_stats/step) plus a
metadata dict {epoch, best_metric} in ONE checkpoint — no filesystem
handshake between processes (the reference's cider.pt cross-process gate is
a latent race; SURVEY.md §5). Metadata is JSON-encoded into a uint8 leaf so
arbitrary keys survive the typed pytree round trip."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from prismer_tpu.train.state import TrainState

_META_BYTES = 4096


def _encode_meta(metadata: Optional[Dict[str, Any]]) -> np.ndarray:
    blob = json.dumps(metadata or {}).encode("utf-8")
    assert len(blob) < _META_BYTES, "metadata too large"
    buf = np.zeros(_META_BYTES, np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, np.uint8)
    return buf


def _decode_meta(buf: np.ndarray) -> Dict[str, Any]:
    raw = bytes(np.asarray(buf, np.uint8)).rstrip(b"\x00")
    return json.loads(raw.decode("utf-8")) if raw else {}


def _payload(state: TrainState, metadata) -> Dict[str, Any]:
    out = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
        "metadata": _encode_meta(metadata),
    }
    if state.batch_stats:
        out["batch_stats"] = state.batch_stats
    return out


def save_checkpoint(path: str, state: TrainState,
                    metadata: Optional[Dict[str, Any]] = None) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _payload(state, metadata), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state: TrainState
                       ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of `state` (shapes/shardings from it)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = _payload(state, {})
    template["metadata"] = np.zeros(_META_BYTES, np.uint8)
    restored = ckptr.restore(path, template)
    new_state = state.replace(
        step=restored["step"], params=restored["params"],
        opt_state=restored["opt_state"],
        batch_stats=restored.get("batch_stats", state.batch_stats),
        rng=jax.random.wrap_key_data(restored["rng"]))
    return new_state, _decode_meta(restored["metadata"])


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export of a param tree (lightweight interchange format)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


def load_params_npz(path: str) -> Any:
    """Inverse of save_params_npz: flat keystr paths -> nested dict tree."""
    import re
    z = np.load(path)
    tree: Any = {}
    for key in z.files:
        parts = re.findall(r"\['([^']*)'\]", key)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = z[key]
    return tree
