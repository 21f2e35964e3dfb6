"""Device mesh + sharding specs.

The reference's distributed runtime is HF accelerate over NCCL: DDP
allreduce, FSDP ZeRO-2/3 wrappers with ignored_modules (train_caption.py:
56-93). TPU-native, all of that is a *sharding spec*, not a wrapper:

  * data parallelism  = batch sharded on the 'data' mesh axis; gradient
    psum inserted by GSPMD.
  * ZeRO-3 / FSDP     = parameters NamedSharding'd along 'data'; XLA
    schedules the all-gather/reduce-scatter pairs.
  * ZeRO-2            = parameters replicated, optimizer state sharded.
  * tensor parallelism = optional 'model' axis (reference has none, P4).

Frozen-parameter exclusion (the reference's ignored_modules machinery,
model/prismer.py:61-94) is unnecessary: trainability is an optax partition
(train/optim.py) — orthogonal to sharding by construction.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """1-D or 2-D mesh over ICI. Default: all devices on the 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim on 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with batch-dim sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch)


# -- FSDP-style parameter sharding ------------------------------------------

_FSDP_MIN_SIZE = 2 ** 16  # replicate anything smaller (LN scales, biases)


def _fsdp_spec(path: str, x: Any, mesh: Mesh,
               min_size: int = _FSDP_MIN_SIZE, exclude=()) -> P:
    n = mesh.shape["data"]
    shape = np.shape(x)
    if np.prod(shape, dtype=np.int64) < min_size or not shape:
        return P()
    # shard the largest divisible dim on 'data' (ZeRO-3 analog of the
    # reference's per-layer FULL_SHARD wrap policy, train_caption.py:68-91);
    # dims in `exclude` already carry the TP 'model' axis — pick another so
    # the leaf is sharded n_data x n_model ways, not just n_model
    order = np.argsort(shape)[::-1]
    for d in order:
        if d in exclude:
            continue
        if shape[d] % n == 0:
            spec = [None] * len(shape)
            spec[d] = "data"
            return P(*spec)
    return P()


# parameters whose LAST dim is a tensor-parallel "expand" dim (attention
# head projections, MLP up-projections): shard out-features on 'model'
_TP_COL_PARENTS = ("q_proj", "k_proj", "v_proj", "query", "key", "value",
                   "c_fc", "intermediate", "down_proj")
# parameters whose FIRST dim contracts a TP-sharded activation (attention
# output / MLP down-projections): shard in-features on 'model'
_TP_ROW_PARENTS = ("out_proj", "c_proj", "up_proj")


def _tp_spec(path_parts, x, mesh: Mesh) -> P:
    """Megatron-style TP spec for the ViT/decoder transformer blocks.

    The reference has no tensor parallelism at all (SURVEY.md P4); this is
    an optional 'model'-axis extension: column-parallel qkv/up projections,
    row-parallel output/down projections; XLA (GSPMD) inserts the psums."""
    n = mesh.shape["model"]
    shape = np.shape(x)
    if n == 1 or len(shape) < 2:
        return P()
    parent = path_parts[-2] if len(path_parts) >= 2 else ""
    leaf = path_parts[-1]
    if leaf != "kernel":
        return P()
    if parent in _TP_COL_PARENTS and shape[-1] % n == 0:
        return P(*([None] * (len(shape) - 1)), "model")
    if parent in _TP_ROW_PARENTS and shape[0] % n == 0:
        return P("model", *([None] * (len(shape) - 1)))
    return P()


def _merge_specs(a: P, b: P, ndim: int) -> P:
    out = []
    for i in range(ndim):
        ax = None
        for spec in (a, b):
            if i < len(spec) and spec[i] is not None:
                ax = spec[i] if ax is None else (*_tuple(ax), *_tuple(spec[i]))
        out.append(ax)
    return P(*out)


def _tuple(x):
    return x if isinstance(x, tuple) else (x,)


def param_shardings(params: Any, mesh: Mesh, fsdp: bool = False,
                    tp: bool = False, min_size: int = _FSDP_MIN_SIZE) -> Any:
    """Pytree of NamedShardings for a param/opt-state tree.

    fsdp=False, tp=False -> fully replicated (plain DP; grads psum'd by GSPMD)
    fsdp=True            -> ZeRO-3: tensors >= min_size sharded along 'data'
    tp=True              -> Megatron-style column/row sharding on 'model'
    Both may combine (2-D sharding); FSDP skips dims taken by TP."""
    def to_sharding(path, x):
        parts = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        spec = P()
        if tp:
            spec = _tp_spec(parts, x, mesh)
        if fsdp:
            used = {i for i, s in enumerate(spec) if s is not None}
            fspec = _fsdp_spec(jax.tree_util.keystr(path), x, mesh, min_size,
                               exclude=used)
            spec = _merge_specs(spec, fspec, np.ndim(x))
        return NamedSharding(mesh, spec)

    if not fsdp and not tp:
        return jax.tree.map(lambda x: replicate_sharding(mesh), params)
    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False,
                 tp: bool = False, min_size: int = _FSDP_MIN_SIZE) -> Any:
    """Device-put params with the chosen sharding."""
    sh = param_shardings(params, mesh, fsdp=fsdp, tp=tp, min_size=min_size)
    return jax.tree.map(jax.device_put, params, sh)


def shard_opt_state(opt_state: Any, mesh: Mesh,
                    min_size: int = _FSDP_MIN_SIZE) -> Any:
    """ZeRO-2 analog (--shard_grad_op, train_caption.py:56-66): optimizer
    moments sharded along 'data' while params stay replicated. Leaf-wise:
    any tensor large enough gets the FSDP spec."""
    def put(path, x):
        spec = _fsdp_spec(jax.tree_util.keystr(path), x, mesh, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(put, opt_state)
