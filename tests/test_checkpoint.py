"""Checkpoint/resume tests (orbax): full TrainState round trip, metadata
(epoch / best-metric gating state), and resume-exactness — the reference's
accelerate.save_state + epoch.pt + cider.pt flow (train_caption.py:162-176)
collapsed into one atomic checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.train import TrainState, build_train_step, make_optimizer
from prismer_tpu.train.checkpoint import (restore_checkpoint,
                                          save_checkpoint, save_params_npz)
from tests.test_models import make_expert_inputs, tiny_decoder, tiny_vision


@pytest.fixture(scope="module")
def setup():
    from prismer_tpu.config import PrismerConfig
    from prismer_tpu.models.prismer import Prismer
    rng = np.random.default_rng(0)
    vis = tiny_vision()
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
    return model, variables, batch


def test_checkpoint_roundtrip_and_resume(tmp_path, setup):
    model, variables, batch = setup
    tx = make_optimizer(lambda s: 1e-3, 0.01, variables["params"], "none")
    state = TrainState.create(variables["params"], tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(3))
    step_fn = build_train_step(model, tx, donate=False)

    state, _ = step_fn(state, batch)
    state, _ = step_fn(state, batch)
    save_checkpoint(str(tmp_path / "ckpt"), state,
                    {"epoch": 1, "best_cider": 97.5})

    # continue training from the live state
    cont, m_live = step_fn(state, batch)

    # restore into a FRESH state and take the same step
    fresh = TrainState.create(variables["params"], tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(99))
    restored, meta = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    assert meta["epoch"] == 1
    assert abs(meta["best_cider"] - 97.5) < 1e-9
    assert int(restored.step) == 2

    resumed, m_resumed = step_fn(restored, batch)
    np.testing.assert_allclose(float(m_resumed["loss"]),
                               float(m_live["loss"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        cont.params, resumed.params)


def test_params_npz_export(tmp_path, setup):
    _, variables, _ = setup
    path = str(tmp_path / "params.npz")
    save_params_npz(path, variables["params"])
    flat = np.load(path)
    assert len(flat.files) == len(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0])


def test_params_npz_roundtrip(tmp_path):
    """save_params_npz <-> load_params_npz inverse (the converter CLI's
    interchange format, used by e.g. the CLIP text-tower weights)."""
    import numpy as np
    from prismer_tpu.train.checkpoint import (load_params_npz,
                                              save_params_npz)
    tree = {"params": {"block_0": {"ln": {"scale": np.arange(4.0)},
                                   "kernel": np.ones((2, 3))},
                       "embedding": np.full((5,), 7.0)}}
    path = str(tmp_path / "t.npz")
    save_params_npz(path, tree)
    got = load_params_npz(path)
    assert sorted(got["params"]) == ["block_0", "embedding"]
    np.testing.assert_array_equal(got["params"]["block_0"]["ln"]["scale"],
                                  np.arange(4.0))
    np.testing.assert_array_equal(got["params"]["block_0"]["kernel"],
                                  np.ones((2, 3)))
