"""CLIP text encoder tests: causal masking, EOT pooling, converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.experts.clip_text import CLIPTextEncoder, convert_clip_text


@pytest.fixture(scope="module")
def tiny():
    model = CLIPTextEncoder(vocab_size=64, width=32, layers=2, heads=4,
                            context=16)
    ids = np.zeros((2, 16), np.int32)
    ids[0, :5] = [1, 10, 11, 12, 63]   # 63 = max -> EOT position 4
    ids[1, :3] = [1, 20, 63]
    variables = model.init(jax.random.key(0), jnp.asarray(ids))
    return model, variables, ids


def test_eot_pooling_ignores_trailing_padding(tiny):
    model, variables, ids = tiny
    out1 = model.apply(variables, jnp.asarray(ids))
    # changing tokens AFTER the EOT position must not change the features
    ids2 = ids.copy()
    ids2[0, 6:] = 33
    out2 = model.apply(variables, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-5)


def test_causality(tiny):
    model, variables, ids = tiny
    out1 = np.asarray(model.apply(variables, jnp.asarray(ids)))
    # changing a token after sample 1's EOT doesn't affect sample 1
    ids2 = ids.copy()
    ids2[1, 10] = 40
    out2 = np.asarray(model.apply(variables, jnp.asarray(ids2)))
    np.testing.assert_allclose(out1[1], out2[1], atol=1e-5)


def test_converter_structure(tiny):
    import torch
    model, variables, ids = tiny
    w = 32
    sd = {
        "token_embedding.weight": torch.zeros(64, w),
        "positional_embedding": torch.zeros(16, w),
        "text_projection": torch.zeros(w, w),
        "ln_final.weight": torch.ones(w), "ln_final.bias": torch.zeros(w),
    }
    for i in range(2):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.attn.in_proj_weight": torch.zeros(3 * w, w),
            f"{p}.attn.in_proj_bias": torch.zeros(3 * w),
            f"{p}.attn.out_proj.weight": torch.zeros(w, w),
            f"{p}.attn.out_proj.bias": torch.zeros(w),
            f"{p}.ln_1.weight": torch.ones(w), f"{p}.ln_1.bias": torch.zeros(w),
            f"{p}.ln_2.weight": torch.ones(w), f"{p}.ln_2.bias": torch.zeros(w),
            f"{p}.mlp.c_fc.weight": torch.zeros(4 * w, w),
            f"{p}.mlp.c_fc.bias": torch.zeros(4 * w),
            f"{p}.mlp.c_proj.weight": torch.zeros(w, 4 * w),
            f"{p}.mlp.c_proj.bias": torch.zeros(w),
        })
    tree = convert_clip_text(sd)
    from prismer_tpu.convert.torch_to_jax import merge_params
    merged = merge_params(variables["params"], tree["params"])
    assert merged["token_embedding"].shape == (64, 32)
