"""Pretrained-loading round trip: npz export -> driver load_pretrained, and
the on-the-fly reference pytorch_model.bin conversion path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.cli import common
from prismer_tpu.config import PrismerConfig
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.train.checkpoint import save_params_npz
from tests.test_models import make_expert_inputs, tiny_decoder, tiny_vision


def test_npz_roundtrip_through_driver(tmp_path, rng):
    vis = tiny_vision(experts=(("rgb", 3), ("depth", 1)))
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    variables = common.init_model_variables(model, cfg, seed=0)

    # mutate, export, reload into a fresh init
    trained = jax.tree.map(lambda x: x + 1.0, variables["params"])
    path = str(tmp_path / "params.npz")
    save_params_npz(path, trained)

    fresh = common.init_model_variables(model, cfg, seed=7)
    loaded = common.load_pretrained(path, cfg, fresh)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        loaded["params"], trained)


def test_npz_rejects_mismatched_file(tmp_path, rng):
    vis = tiny_vision()
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    variables = common.init_model_variables(model, cfg, seed=0)
    np.savez(tmp_path / "bogus.npz", foo=np.zeros(3))
    with pytest.raises(ValueError):
        common.load_pretrained(str(tmp_path / "bogus.npz"), cfg, variables)
