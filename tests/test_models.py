"""Model-level tests: shapes, KV-cache consistency, freeze-mode wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.config import (PrismerConfig, TextDecoderConfig,
                                VisionEncoderConfig, build_prismer_config,
                                tiny_test_config)
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.models.roberta import RobertaCausalDecoder
from prismer_tpu.models.vit import VisionTransformer


def tiny_vision(experts=(("rgb", 3),), res=64, latents=8):
    return VisionEncoderConfig(
        name="ViT-Tiny-Test", image_resolution=res, label_resolution=64,
        patch_size=16, width=64, layers=2, heads=4, experts=experts,
        resampler_layers=2, resampler_heads=4, resampler_latents=latents)


def tiny_decoder():
    return TextDecoderConfig(
        vocab_size=128, hidden_size=64, vision_hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def make_expert_inputs(rng, cfg: VisionEncoderConfig, batch=2):
    res = cfg.label_resolution
    out = {}
    for exp, ch in cfg.experts:
        if exp == "rgb":
            r = cfg.image_resolution
            out[exp] = jnp.asarray(
                rng.standard_normal((batch, r, r, ch)).astype(np.float32))
        elif exp == "obj_detection":
            out[exp] = {
                "label": jnp.asarray(
                    rng.standard_normal((batch, res, res, ch)).astype(np.float32)),
                "instance": jnp.asarray(
                    rng.integers(0, 5, (batch, res, res, 1)).astype(np.int32)),
            }
        else:
            out[exp] = jnp.asarray(
                rng.standard_normal((batch, res, res, ch)).astype(np.float32))
    return out


def test_vit_rgb_only_shape(rng):
    cfg = tiny_vision()
    model = VisionTransformer(cfg)
    inputs = make_expert_inputs(rng, cfg)
    params = model.init(jax.random.key(0), inputs)
    out = model.apply(params, inputs)
    assert out.shape == (2, cfg.rgb_tokens, 64)
    assert cfg.rgb_tokens == 16


def test_vit_multimodal_shape(rng):
    experts = (("rgb", 3), ("depth", 1), ("seg", 64), ("obj_detection", 64))
    cfg = tiny_vision(experts=experts)
    model = VisionTransformer(cfg)
    inputs = make_expert_inputs(rng, cfg)
    params = model.init({"params": jax.random.key(0),
                         "instance": jax.random.key(1)}, inputs)
    out = model.apply(params, inputs, rngs={"instance": jax.random.key(2)})
    # 16 rgb tokens + 8 latents
    assert out.shape == (2, 16 + 8, 64)


def test_vit_higher_resolution_rgb(rng):
    """image_resolution 128 -> 64 rgb tokens; labels stay at 64."""
    experts = (("rgb", 3), ("edge", 1))
    cfg = tiny_vision(experts=experts, res=128)
    model = VisionTransformer(cfg)
    inputs = make_expert_inputs(rng, cfg)
    params = model.init(jax.random.key(0), inputs)
    out = model.apply(params, inputs)
    assert out.shape == (2, 64 + 8, 64)


def test_decoder_full_vs_cached_decode(rng):
    """Cached decode must reproduce full-forward logits exactly.

    This is the correctness gate for the KV-cache redesign (the reference
    recomputes the full sequence each step; we must match its numbers)."""
    cfg = tiny_decoder()
    dec = RobertaCausalDecoder(cfg)
    b, prompt_len, total_len, enc_len = 2, 4, 9, 6

    ids = rng.integers(4, cfg.vocab_size, (b, total_len)).astype(np.int32)
    # right-pad the prompt part for sample 1 (VQA-style padded prompt)
    ids[1, 3] = cfg.pad_token_id
    mask = np.ones((b, total_len), dtype=np.int32)
    mask[1, 3] = 0
    enc = rng.standard_normal((b, enc_len, cfg.vision_hidden_size)).astype(np.float32)

    ids_j, mask_j, enc_j = jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(enc)
    params = dec.init(jax.random.key(0), ids_j, mask_j, enc_j)
    full_logits = dec.apply(params, ids_j, mask_j, enc_j)

    # prefill on the prompt
    last, cache = dec.apply(params, ids_j[:, :prompt_len],
                            mask_j[:, :prompt_len], enc_j, total_len,
                            method=RobertaCausalDecoder.init_cache)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(full_logits[:, prompt_len - 1]),
                               atol=2e-4, rtol=1e-4)

    # step through the rest
    nonpad = mask[:, :prompt_len].sum(axis=1)
    for t in range(prompt_len, total_len):
        pos_ids = jnp.asarray(nonpad + (t - prompt_len) + 1 + cfg.pad_token_id)
        key_mask = np.zeros((b, total_len), dtype=np.int32)
        key_mask[:, :prompt_len] = mask[:, :prompt_len]
        key_mask[:, prompt_len:t + 1] = 1
        step_logits, cache = dec.apply(
            params, ids_j[:, t], jnp.asarray(t), pos_ids,
            jnp.asarray(key_mask), cache,
            method=RobertaCausalDecoder.decode_step)
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(full_logits[:, t]),
                                   atol=2e-4, rtol=1e-4)


def test_prismer_end_to_end_logits(rng):
    experts = (("rgb", 3), ("depth", 1))
    vis = tiny_vision(experts=experts)
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 128, (2, 7)).astype(np.int32))
    mask = jnp.ones((2, 7), dtype=jnp.int32)
    params = model.init(jax.random.key(0), inputs, ids, mask)
    logits = model.apply(params, inputs, ids, mask)
    assert logits.shape == (2, 7, 128)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_build_prismer_config_from_task_yaml_schema():
    cfg = build_prismer_config(tiny_test_config(
        experts=["depth", "normal", "seg_coco", "edge", "obj_detection",
                 "ocr_detection"]))
    assert cfg.experts == {"rgb": 3, "depth": 1, "normal": 3, "seg": 64,
                           "edge": 1, "obj_detection": 64,
                           "ocr_detection": 64}
    assert cfg.vision.width == 64
    assert cfg.decoder.hidden_size == 64
    # PrismerZ variant
    cfg_z = build_prismer_config(tiny_test_config(experts="none"))
    assert cfg_z.experts == {"rgb": 3}
    assert not cfg_z.vision.has_experts


def test_bf16_forward_finite(rng):
    vis = tiny_vision()
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="bfloat16")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 128, (2, 5)).astype(np.int32))
    mask = jnp.ones((2, 5), dtype=jnp.int32)
    params = model.init(jax.random.key(0), inputs, ids, mask)
    logits = model.apply(params, inputs, ids, mask)
    assert logits.dtype == jnp.float32  # lm head always returns fp32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_instance_embedding_shared_by_id_across_batch(rng):
    """The obj-detection instance embedding assigns ONE random slot per id,
    shared across the batch, re-rolled per forward (vit.py:141-148)."""
    experts = (("rgb", 3), ("obj_detection", 64))
    cfg = tiny_vision(experts=experts)
    model = VisionTransformer(cfg)
    inputs = make_expert_inputs(rng, cfg)
    # identical label features + instance maps for both samples
    label = inputs["obj_detection"]["label"][0:1]
    inst = inputs["obj_detection"]["instance"][0:1]
    inputs["obj_detection"] = {
        "label": jnp.concatenate([label, label]),
        "instance": jnp.concatenate([inst, inst]),
    }
    inputs["rgb"] = jnp.concatenate([inputs["rgb"][0:1]] * 2)
    params = model.init({"params": jax.random.key(0),
                         "instance": jax.random.key(1)}, inputs)

    out1 = model.apply(params, inputs, rngs={"instance": jax.random.key(5)})
    # identical inputs + same instance key -> identical outputs across batch
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out1[1]),
                               atol=1e-5)
    # a different instance key re-rolls the slots -> different encoding
    out2 = model.apply(params, inputs, rngs={"instance": jax.random.key(6)})
    assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-4
