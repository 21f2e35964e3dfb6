"""Training-infrastructure tests: schedules vs reference formulas, freeze
partitions, a full train step (loss decreases), and the 8-device data-
parallel + FSDP sharded step on the virtual CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.config import PrismerConfig
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       param_shardings, shard_batch,
                                       shard_params)
from prismer_tpu.train import (TrainState, build_train_step, freeze_labels,
                               make_optimizer)
from prismer_tpu.train import schedules
from prismer_tpu.train.optim import FROZEN, TRAIN, count_params
from tests.test_models import make_expert_inputs, tiny_decoder, tiny_vision


def ref_cosine(step, max_steps, init_lr, min_lr):
    return (init_lr - min_lr) * 0.5 * (1. + math.cos(math.pi * step / max_steps)) + min_lr


def ref_warmup(step, max_step, init_lr, max_lr):
    return min(max_lr, init_lr + (max_lr - init_lr) * step / max_step)


def test_cosine_schedule_matches_reference_formula():
    fn = schedules.cosine_schedule(5e-5, 0.0, 1000)
    for s in (0, 1, 250, 999, 1000):
        assert abs(float(fn(s)) - ref_cosine(s, 1000, 5e-5, 0.0)) < 1e-10


def test_warmup_schedule_matches_reference_formula():
    fn = schedules.warmup_schedule(1e-6, 3e-4, 2000)
    for s in (0, 100, 1999, 2000, 5000):
        assert abs(float(fn(s)) - ref_warmup(s, 2000, 1e-6, 3e-4)) < 1e-10


def test_step_schedule():
    fn = schedules.step_schedule(1e-4, 1e-6, 0.5)
    assert abs(float(fn(0)) - 1e-4) < 1e-9
    assert abs(float(fn(3)) - 1.25e-5) < 1e-9
    assert abs(float(fn(20)) - 1e-6) < 1e-9


@pytest.fixture(scope="module")
def tiny_setup():
    rng = np.random.default_rng(0)
    vis = tiny_vision(experts=(("rgb", 3), ("depth", 1)))
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 128, (2, 6)).astype(np.int32))
    mask = jnp.ones((2, 6), dtype=jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    targets = np.asarray(ids).copy()
    targets[:, :2] = -100
    batch = {"experts": inputs, "input_ids": ids, "attention_mask": mask,
             "targets": jnp.asarray(targets)}
    return model, cfg, variables, batch


def test_freeze_labels_partition(tiny_setup):
    model, cfg, variables, _ = tiny_setup
    params = variables["params"]

    labels = freeze_labels(params, "freeze_vision")
    enc = labels["expert_encoder"]
    assert enc["resblocks_0"]["attn"]["q_proj"]["kernel"] == FROZEN
    assert enc["resblocks_0"]["mlp"]["c_fc"]["kernel"] == FROZEN
    assert enc["resblocks_0"]["ln_1"]["scale"] == FROZEN
    assert enc["resblocks_0"]["adaptor"]["down_proj"]["kernel"] == TRAIN
    assert enc["conv1_rgb"]["kernel"] == TRAIN
    assert enc["positional_embedding"] == TRAIN
    assert enc["ln_pre"]["scale"] == TRAIN
    assert jax.tree.all(jax.tree.map(lambda l: l == TRAIN,
                                     labels["text_decoder"]))

    labels = freeze_labels(params, "freeze_lang")
    dec = labels["text_decoder"]
    assert dec["layers_0"]["self_attn"]["query"]["kernel"] == FROZEN
    assert dec["layers_0"]["mlp"]["intermediate"]["kernel"] == FROZEN
    assert dec["layers_0"]["cross_attn"]["query"]["kernel"] == TRAIN
    assert dec["layers_0"]["cross_out"]["dense"]["kernel"] == TRAIN
    assert dec["layers_0"]["adaptor"]["up_proj"]["kernel"] == TRAIN
    assert dec["output_layer"]["self_attn"]["query"]["kernel"] == TRAIN
    assert dec["embeddings"]["word_embeddings"] == TRAIN
    assert dec["lm_head"]["dense"]["kernel"] == TRAIN

    counts = count_params(params, labels)
    assert 0 < counts["trainable"] < counts["total"]


def test_train_step_decreases_loss_and_respects_freeze(tiny_setup):
    model, cfg, variables, batch = tiny_setup
    params = variables["params"]
    labels = freeze_labels(params, "freeze_vision")
    tx = make_optimizer(lambda s: 1e-3, 0.01, params, "freeze_vision")
    state = TrainState.create(params, tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    step_fn = build_train_step(model, tx, freeze_tree=labels, donate=False)

    frozen_before = np.asarray(
        state.params["expert_encoder"]["resblocks_0"]["attn"]["q_proj"]["kernel"])
    train_before = np.asarray(
        state.params["text_decoder"]["lm_head"]["dense"]["kernel"])

    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    frozen_after = np.asarray(
        state.params["expert_encoder"]["resblocks_0"]["attn"]["q_proj"]["kernel"])
    train_after = np.asarray(
        state.params["text_decoder"]["lm_head"]["dense"]["kernel"])
    np.testing.assert_array_equal(frozen_before, frozen_after)
    assert np.abs(train_after - train_before).max() > 0


@pytest.mark.parametrize("fsdp", [False, True])
def test_sharded_train_step_8_devices(tiny_setup, fsdp):
    """Data-parallel (and ZeRO-3 FSDP) step over the virtual 8-device mesh."""
    model, cfg, variables, _ = tiny_setup
    mesh = make_mesh()
    assert mesh.shape["data"] == 8

    rng = np.random.default_rng(7)
    vis = model.cfg.vision
    inputs = make_expert_inputs(rng, vis, batch=8)
    ids = jnp.asarray(rng.integers(4, 128, (8, 6)).astype(np.int32))
    mask = jnp.ones((8, 6), dtype=jnp.int32)
    targets = np.asarray(ids).copy()
    targets[:, :2] = -100
    batch = {"experts": inputs, "input_ids": ids, "attention_mask": mask,
             "targets": jnp.asarray(targets)}

    params = shard_params(variables["params"], mesh, fsdp=fsdp,
                          min_size=1024)
    tx = make_optimizer(lambda s: 1e-3, 0.01, params, "none")
    state = TrainState.create(params, tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(2))
    batch = shard_batch(batch, mesh)
    step_fn = build_train_step(model, tx, donate=False)
    state2, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    if fsdp:
        # at least one large param is actually sharded across 'data'
        shardings = param_shardings(variables["params"], mesh, fsdp=True,
                                    min_size=1024)
        specs = [s.spec for s in jax.tree.leaves(shardings)]
        assert any("data" in str(s) for s in specs)


def test_tensor_parallel_sharding(tiny_setup):
    """Optional Megatron-style TP on the 'model' axis (2-D mesh 4x2):
    column/row kernel shardings produce the same numbers as replicated."""
    model, cfg, variables, batch = tiny_setup
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}

    shardings = param_shardings(variables["params"], mesh, tp=True,
                                min_size=1024)
    specs = [str(s.spec) for s in jax.tree.leaves(shardings)]
    assert any("model" in s for s in specs)

    params_tp = shard_params(variables["params"], mesh, tp=True,
                             min_size=1024)
    # combined TP + FSDP placement also works
    params_2d = shard_params(variables["params"], mesh, tp=True, fsdp=True,
                             min_size=1024)

    stats = variables.get("batch_stats", {})

    @jax.jit
    def fwd(p, batch):
        return model.apply({"params": p, "batch_stats": stats},
                           batch["experts"], batch["input_ids"],
                           batch["attention_mask"])

    # batch must shard over 'data' (4) — tiny_setup batch is 2; tile it
    batch4 = jax.tree.map(
        lambda x: jnp.concatenate([x, x]) if hasattr(x, "ndim") else x,
        batch)
    from prismer_tpu.parallel.mesh import shard_batch
    batch_sh = shard_batch(batch4, mesh)

    want = fwd(variables["params"], batch4)
    got_tp = fwd(params_tp, batch_sh)
    got_2d = fwd(params_2d, batch_sh)
    np.testing.assert_allclose(np.asarray(got_tp), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_2d), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
