"""Shared driver plumbing for the task CLIs.

Replaces the reference's per-script accelerate boilerplate
(train_caption.py:28-117): argument parsing, config selection, model/state
construction, checkpoint restore, host-side batch prep, and multi-host
collectives (process_allgather instead of NCCL gather_for_metrics)."""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prismer_tpu.config import (PrismerConfig, build_prismer_config,
                                default_config_path, load_task_config)
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from prismer_tpu.tokenizer import BPETokenizer, load_tokenizer
from prismer_tpu.train import TrainState, freeze_labels, make_optimizer


def base_parser(task: str) -> argparse.ArgumentParser:
    """Flags mirroring the reference scripts (train_caption.py:28-41)."""
    p = argparse.ArgumentParser(description=f"prismer_tpu {task}")
    p.add_argument("--config", default=default_config_path(task))
    p.add_argument("--target_dataset", default="coco")
    p.add_argument("--exp_name", default="", type=str)
    p.add_argument("--from_checkpoint", action="store_true")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--shard_grad_op", action="store_true",
                   help="ZeRO-2: shard optimizer state over 'data'")
    p.add_argument("--full_shard", action="store_true",
                   help="ZeRO-3: shard parameters over 'data'")
    p.add_argument("--mixed_precision", default="bf16",
                   choices=["bf16", "fp32"])
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--pretrained", default="",
                   help="path to converted pretrain params (.npz/orbax) or "
                        "reference pytorch_model.bin to convert on the fly")
    p.add_argument("--tokenizer_dir", default="")
    p.add_argument("--logging_dir", default="logging")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize()")
    return p


def setup(args, task: str, keyed: bool = True
          ) -> Tuple[Dict[str, Any], PrismerConfig, Prismer, BPETokenizer]:
    if args.multihost:
        jax.distributed.initialize()
    config = load_task_config(args.config,
                              args.target_dataset if keyed else None)
    if args.mixed_precision == "fp32":
        config["dtype"] = "float32"
    cfg = build_prismer_config(config)
    model = Prismer(cfg)
    if args.tokenizer_dir:
        os.environ["PRISMER_TOKENIZER_DIR"] = args.tokenizer_dir
    tokenizer = load_tokenizer(cfg.decoder.model_name)
    return config, cfg, model, tokenizer


def make_dummy_inputs(cfg: PrismerConfig, batch: int = 1):
    rng = np.random.default_rng(0)
    res = cfg.vision.label_resolution
    out = {}
    for exp, ch in cfg.vision.experts:
        if exp == "rgb":
            r = cfg.vision.image_resolution
            out[exp] = jnp.zeros((batch, r, r, ch), jnp.float32)
        elif exp == "obj_detection":
            out[exp] = {"label": jnp.zeros((batch, res, res, ch), jnp.float32),
                        "instance": jnp.zeros((batch, res, res, 1), jnp.int32)}
        else:
            out[exp] = jnp.zeros((batch, res, res, ch), jnp.float32)
    return out


def init_model_variables(model: Prismer, cfg: PrismerConfig, seed: int = 0):
    from prismer_tpu.models.layers import xla_attention
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), xla_attention():
        experts = make_dummy_inputs(cfg)
        ids = jnp.ones((1, 4), jnp.int32)
        mask = jnp.ones((1, 4), jnp.int32)
        variables = model.init(
            {"params": jax.random.key(seed), "instance": jax.random.key(1)},
            experts, ids, mask)
    return variables


def load_pretrained(path: str, cfg: PrismerConfig, variables):
    """Load converted params: .npz flat export, or a reference
    pytorch_model.bin converted on the fly (train_caption.py:96-100)."""
    from prismer_tpu.convert.torch_to_jax import (convert_prismer_checkpoint,
                                                  merge_params)
    if path.endswith(".bin") or path.endswith(".pt"):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        tree = convert_prismer_checkpoint(sd, cfg)
        params = merge_params(variables["params"], tree["params"])
        stats = variables.get("batch_stats", {})
        if tree.get("batch_stats"):
            stats = merge_params(stats, tree["batch_stats"])
        return {"params": params, "batch_stats": stats}
    if path.endswith(".npz"):
        # flat export from train.checkpoint.save_params_npz (params only)
        flat = dict(np.load(path))
        loaded = [0]

        def lookup(p, v):
            key = jax.tree_util.keystr(p)
            if key in flat:
                loaded[0] += 1
                assert flat[key].shape == np.shape(v), key
                return jnp.asarray(flat[key])
            return v

        params = jax.tree_util.tree_map_with_path(lookup,
                                                  variables["params"])
        if loaded[0] == 0:
            raise ValueError(f"no matching params found in {path}")
        out = dict(variables)
        out["params"] = params
        return out
    raise ValueError(f"unknown pretrained format: {path}")


def build_state(args, config, cfg, model, lr_schedule):
    variables = init_model_variables(model, cfg, seed=args.seed)
    if args.pretrained:
        variables = load_pretrained(args.pretrained, cfg, variables)

    mesh = make_mesh()
    params = shard_params(variables["params"], mesh,
                          fsdp=args.full_shard)
    labels = freeze_labels(params, cfg.freeze)
    tx = make_optimizer(lr_schedule, config.get("weight_decay", 0.05),
                        params, cfg.freeze)
    state = TrainState.create(
        params, tx, batch_stats=variables.get("batch_stats", {}),
        rng=jax.random.key(args.seed))
    if args.shard_grad_op and not args.full_shard:
        from prismer_tpu.parallel.mesh import shard_opt_state
        state = state.replace(
            opt_state=shard_opt_state(state.opt_state, mesh))
    return state, tx, labels, mesh


def experts_to_device(experts_batch: Dict[str, Any], mesh=None):
    """Host expert batch (numpy, raw id/table format) -> device arrays."""
    def conv(v):
        return jax.tree.map(jnp.asarray, v)
    tree = {k: conv(v) for k, v in experts_batch.items()}
    if mesh is not None:
        tree = shard_batch(tree, mesh)
    return tree


def gather_for_metrics(values: np.ndarray) -> np.ndarray:
    """Multi-host allgather of per-host metric arrays (replaces
    accelerate.gather_for_metrics, train_caption.py:147)."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(values))


def gather_results(results: list) -> list:
    """Allgather per-host JSON-able result lists (replaces the reference's
    tokenize-then-NCCL-gather dance, train_caption.py:144-147). Serialized
    to padded uint8 buffers for process_allgather; no-op single-host."""
    if jax.process_count() == 1:
        return results
    from jax.experimental import multihost_utils
    blob = json.dumps(results).encode("utf-8")
    length = np.asarray([len(blob)], np.int32)
    max_len = int(np.max(multihost_utils.process_allgather(length)))
    buf = np.zeros(max_len, np.uint8)
    buf[:len(blob)] = np.frombuffer(blob, np.uint8)
    all_bufs = np.asarray(multihost_utils.process_allgather(buf))
    all_lens = np.asarray(multihost_utils.process_allgather(length))
    merged = []
    for row, n in zip(all_bufs.reshape(jax.process_count(), -1),
                      all_lens.reshape(-1)):
        merged += json.loads(bytes(row[:int(n)]).decode("utf-8"))
    return merged


def broadcast_from_main(value: float) -> float:
    """Broadcast a scalar decision from process 0 (replaces the reference's
    cider.pt file handshake, train_caption.py:163-176)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    return float(multihost_utils.broadcast_one_to_all(
        np.asarray(value, np.float32)))


def is_main_process() -> bool:
    return jax.process_index() == 0


def dump_results(results, results_dir: str, name: str) -> Optional[str]:
    if not is_main_process():
        return None
    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir, name)
    with open(path, "w") as f:
        json.dump(results, f)
    return path
