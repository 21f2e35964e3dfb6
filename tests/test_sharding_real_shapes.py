"""Real-shape sharding validation (VERDICT round-2 item #8).

The multichip dryrun exercises tiny shapes; these tests assert the ZeRO-3
and tensor-parallel specs actually DIVIDE every tensor of the real
Prismer-BASE and Prismer-LARGE configurations (full 6-expert caption setup,
480px, 50265 vocab, 722-way detection table, 24-layer roberta-large) on an
8-device mesh — no silent P() replication of any large tensor, and a
per-device ZeRO-3 footprint of ~1/n. Shapes come from jax.eval_shape (no
compute), so the LARGE model costs only a trace."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from prismer_tpu.config import build_prismer_config
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.parallel.mesh import (_FSDP_MIN_SIZE, make_mesh,
                                       param_shardings)

FULL_EXPERTS = ["depth", "normal", "seg_coco", "edge", "obj_detection",
                "ocr_detection"]


def _abstract_params(prismer_model: str):
    cfg = build_prismer_config({
        "experts": FULL_EXPERTS, "image_resolution": 480,
        "prismer_model": prismer_model, "freeze": "freeze_vision",
        "dtype": "bfloat16"})
    model = Prismer(cfg)
    res = cfg.vision.label_resolution
    r = cfg.vision.image_resolution
    experts = {}
    for exp, ch in cfg.vision.experts:
        if exp == "rgb":
            experts[exp] = jax.ShapeDtypeStruct((2, r, r, ch), jnp.float32)
        elif exp == "obj_detection":
            experts[exp] = {
                "label": jax.ShapeDtypeStruct((2, res, res, ch), jnp.float32),
                "instance": jax.ShapeDtypeStruct((2, res, res, 1), jnp.int32),
            }
        else:
            experts[exp] = jax.ShapeDtypeStruct((2, res, res, ch),
                                                jnp.float32)
    ids = jax.ShapeDtypeStruct((2, 30), jnp.int32)
    mask = jax.ShapeDtypeStruct((2, 30), jnp.int32)
    variables = jax.eval_shape(
        lambda e, i, m: model.init(
            {"params": jax.random.key(0), "instance": jax.random.key(1)},
            e, i, m),
        experts, ids, mask)
    return cfg, variables["params"]


def _axes(spec_entry):
    if spec_entry is None:
        return ()
    return spec_entry if isinstance(spec_entry, tuple) else (spec_entry,)


def _check_divisibility(params, shardings, mesh):
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree.leaves(shardings)
    for (path, leaf), sh in zip(flat_p, flat_s):
        spec = sh.spec
        for d, entry in enumerate(spec):
            div = int(np.prod([mesh.shape[a] for a in _axes(entry)],
                              dtype=np.int64))
            if div > 1:
                assert leaf.shape[d] % div == 0, \
                    f"{jax.tree_util.keystr(path)} dim {d} " \
                    f"{leaf.shape} not divisible by {div}"


def _footprint_ratio(params, shardings):
    total = 0
    per_device = 0
    for leaf, sh in zip(jax.tree.leaves(params), jax.tree.leaves(shardings)):
        n = int(np.prod(leaf.shape, dtype=np.int64)) if leaf.shape else 1
        total += n
        per_device += int(np.prod(sh.shard_shape(leaf.shape),
                                  dtype=np.int64)) if leaf.shape else 1
    return per_device / total


@pytest.mark.parametrize("prismer_model", ["prismer_base", "prismer_large"])
def test_fsdp_shards_every_large_tensor(prismer_model):
    cfg, params = _abstract_params(prismer_model)
    mesh = make_mesh(n_data=8, n_model=1)
    shardings = param_shardings(params, mesh, fsdp=True)

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree.leaves(shardings)
    unsharded_big = []
    for (path, leaf), sh in zip(flat_p, flat_s):
        size = int(np.prod(leaf.shape, dtype=np.int64)) if leaf.shape else 1
        if size >= _FSDP_MIN_SIZE and all(e is None for e in sh.spec):
            unsharded_big.append((jax.tree_util.keystr(path), leaf.shape))
    assert not unsharded_big, \
        f"large tensors silently replicated under ZeRO-3: {unsharded_big}"

    _check_divisibility(params, shardings, mesh)
    # ZeRO-3 per-device footprint ~1/8 (small replicated leaves add slack)
    ratio = _footprint_ratio(params, shardings)
    assert ratio < 0.15, f"per-device param footprint {ratio:.3f} of total"


@pytest.mark.parametrize("prismer_model", ["prismer_base", "prismer_large"])
def test_tp_plus_fsdp_2d_mesh_real_shapes(prismer_model):
    cfg, params = _abstract_params(prismer_model)
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = param_shardings(params, mesh, fsdp=True, tp=True)
    _check_divisibility(params, shardings, mesh)

    # the transformer matmul kernels must actually ride the 'model' axis
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree.leaves(shardings)
    n_model_sharded = 0
    for (path, leaf), sh in zip(flat_p, flat_s):
        if any("model" in _axes(e) for e in sh.spec):
            n_model_sharded += 1
    # >= qkv+out per attention + 2 MLP kernels per block, vit + decoder
    min_expected = (cfg.vision.layers + cfg.decoder.num_hidden_layers) * 4
    assert n_model_sharded >= min_expected, n_model_sharded

    ratio = _footprint_ratio(params, shardings)
    assert ratio < 0.25, f"per-device param footprint {ratio:.3f} of total"
