"""Full reference-checkpoint conversion: a synthetic 'pytorch_model.bin'
with the reference's exact key layout (expert_encoder.* restructured CLIP,
text_decoder.* restructured RoBERTa triplets) converts, merges, and runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prismer_tpu.config import PrismerConfig
from prismer_tpu.convert.torch_to_jax import (convert_prismer_checkpoint,
                                              merge_params)
from prismer_tpu.models.prismer import Prismer
from tests.test_models import make_expert_inputs, tiny_decoder, tiny_vision


def _lin(sd, key, out_d, in_d, g):
    sd[f"{key}.weight"] = torch.tensor(
        g.standard_normal((out_d, in_d)).astype(np.float32))
    sd[f"{key}.bias"] = torch.tensor(
        g.standard_normal(out_d).astype(np.float32))


def _ln(sd, key, d, g):
    sd[f"{key}.weight"] = torch.tensor(
        g.standard_normal(d).astype(np.float32))
    sd[f"{key}.bias"] = torch.tensor(g.standard_normal(d).astype(np.float32))


def _conv(sd, key, o, i, k, g, bias=False):
    sd[f"{key}.weight"] = torch.tensor(
        g.standard_normal((o, i, k, k)).astype(np.float32))
    if bias:
        sd[f"{key}.bias"] = torch.tensor(
            g.standard_normal(o).astype(np.float32))


def _bnp(sd, key, d, g):
    sd[f"{key}.weight"] = torch.tensor(np.abs(g.standard_normal(d)).astype(np.float32))
    sd[f"{key}.bias"] = torch.tensor(g.standard_normal(d).astype(np.float32))
    sd[f"{key}.running_mean"] = torch.tensor(
        g.standard_normal(d).astype(np.float32))
    sd[f"{key}.running_var"] = torch.tensor(
        np.abs(g.standard_normal(d)).astype(np.float32) + 0.5)
    sd[f"{key}.num_batches_tracked"] = torch.tensor(0)


def build_synthetic_reference_checkpoint(cfg: PrismerConfig, g):
    """Reference 'pytorch_model.bin' layout for the tiny config."""
    sd = {}
    w = cfg.vision.width
    # encoder
    sd["expert_encoder.positional_embedding"] = torch.tensor(
        g.standard_normal((cfg.vision.rgb_tokens, w)).astype(np.float32))
    _ln(sd, "expert_encoder.ln_pre", w, g)
    _ln(sd, "expert_encoder.ln_post", w, g)
    _conv(sd, "expert_encoder.conv1.rgb", w, 3, cfg.vision.patch_size, g)
    if "obj_detection" in cfg.experts:
        sd["expert_encoder.instance_embedding"] = torch.tensor(
            g.standard_normal((128, w)).astype(np.float32))
    # label stems (Sequential indices 1,4,7,10 conv / 2,5,8,11 bn / 13 proj)
    widths = (w // 8, w // 4, w // 2, w)
    for exp, ch in cfg.vision.experts:
        if exp == "rgb":
            continue
        p = f"expert_encoder.conv1.{exp}"
        prev = ch
        for j, (ci, bi) in enumerate(zip((1, 4, 7, 10), (2, 5, 8, 11))):
            _conv(sd, f"{p}.{ci}", widths[j], prev, 3, g)
            _bnp(sd, f"{p}.{bi}", widths[j], g)
            prev = widths[j]
        _conv(sd, f"{p}.13", w, w, 1, g)
    for i in range(cfg.vision.layers):
        p = f"expert_encoder.transformer.resblocks.{i}"
        sd[f"{p}.0.attn.in_proj_weight"] = torch.tensor(
            g.standard_normal((3 * w, w)).astype(np.float32))
        sd[f"{p}.0.attn.in_proj_bias"] = torch.tensor(
            g.standard_normal(3 * w).astype(np.float32))
        _lin(sd, f"{p}.0.attn.out_proj", w, w, g)
        _ln(sd, f"{p}.0.ln_1", w, g)
        _ln(sd, f"{p}.0.ln_2", w, g)
        _lin(sd, f"{p}.0.mlp.c_fc", 4 * w, w, g)
        _lin(sd, f"{p}.0.mlp.c_proj", w, 4 * w, g)
        _lin(sd, f"{p}.1.adaptor.down_proj", w, w, g)
        _lin(sd, f"{p}.1.adaptor.up_proj", w, w, g)
        _ln(sd, f"{p}.1.adaptor_ln", w, g)
    if cfg.vision.has_experts:
        sd["expert_encoder.resampler.latents"] = torch.tensor(
            g.standard_normal((cfg.vision.resampler_latents, w))
            .astype(np.float32))
        for i in range(cfg.vision.resampler_layers):
            p = f"expert_encoder.resampler.perceiver_blocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = torch.tensor(
                g.standard_normal((3 * w, w)).astype(np.float32))
            sd[f"{p}.attn.in_proj_bias"] = torch.tensor(
                g.standard_normal(3 * w).astype(np.float32))
            _lin(sd, f"{p}.attn.out_proj", w, w, g)
            for nm in ("ln_1", "ln_2", "ln_ff"):
                _ln(sd, f"{p}.{nm}", w, g)
            _lin(sd, f"{p}.mlp.c_fc", 4 * w, w, g)
            _lin(sd, f"{p}.mlp.c_proj", w, 4 * w, g)
    # decoder
    c = cfg.decoder
    d = c.hidden_size
    emb = "text_decoder.roberta.embeddings"
    for nm, rows in (("word_embeddings", c.vocab_size),
                     ("position_embeddings", c.max_position_embeddings),
                     ("token_type_embeddings", c.type_vocab_size)):
        sd[f"{emb}.{nm}.weight"] = torch.tensor(
            g.standard_normal((rows, d)).astype(np.float32))
    _ln(sd, f"{emb}.LayerNorm", d, g)
    for i in range(c.num_hidden_layers):
        p = f"text_decoder.roberta.encoder.layer.{i}"
        for nm in ("query", "key", "value"):
            _lin(sd, f"{p}.0.attention.self.{nm}", d, d, g)
            _lin(sd, f"{p}.1.self.{nm}", d,
                 d if nm == "query" else c.vision_hidden_size, g)
        _lin(sd, f"{p}.0.attention.output.dense", d, d, g)
        _ln(sd, f"{p}.0.attention.output.LayerNorm", d, g)
        _lin(sd, f"{p}.0.intermediate.dense", c.intermediate_size, d, g)
        _lin(sd, f"{p}.0.output.dense", d, c.intermediate_size, g)
        _ln(sd, f"{p}.0.output.LayerNorm", d, g)
        _lin(sd, f"{p}.1.output.dense", d, d, g)
        _ln(sd, f"{p}.1.output.LayerNorm", d, g)
        _lin(sd, f"{p}.2.adaptor.down_proj", d, d, g)
        _lin(sd, f"{p}.2.adaptor.up_proj", d, d, g)
        _ln(sd, f"{p}.2.adaptor_ln", d, g)
    p = "text_decoder.roberta.encoder.output_layer"
    for nm in ("query", "key", "value"):
        _lin(sd, f"{p}.attention.self.{nm}", d, d, g)
    _lin(sd, f"{p}.attention.output.dense", d, d, g)
    _ln(sd, f"{p}.attention.output.LayerNorm", d, g)
    _lin(sd, f"{p}.intermediate.dense", c.intermediate_size, d, g)
    _lin(sd, f"{p}.output.dense", d, c.intermediate_size, g)
    _ln(sd, f"{p}.output.LayerNorm", d, g)
    _lin(sd, "text_decoder.lm_head.dense", d, d, g)
    _ln(sd, "text_decoder.lm_head.layer_norm", d, g)
    sd["text_decoder.lm_head.bias"] = torch.tensor(
        g.standard_normal(c.vocab_size).astype(np.float32))
    return sd


def test_full_checkpoint_converts_and_runs(rng):
    vis = tiny_vision(experts=(("rgb", 3), ("depth", 1), ("seg", 64),
                               ("obj_detection", 64)))
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    g = np.random.default_rng(11)
    sd = build_synthetic_reference_checkpoint(cfg, g)

    tree = convert_prismer_checkpoint(sd, cfg)
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 128, (2, 5)).astype(np.int32))
    mask = jnp.ones((2, 5), dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "instance": jax.random.key(1)},
        inputs, ids, mask)

    params = merge_params(variables["params"], tree["params"])
    stats = merge_params(variables["batch_stats"],
                         tree["batch_stats"])

    # value-mapping spot checks (transposes, packed qkv split)
    w = np.asarray(sd["expert_encoder.transformer.resblocks.0.0.attn"
                      ".in_proj_weight"])
    np.testing.assert_allclose(
        np.asarray(params["expert_encoder"]["resblocks_0"]["attn"]
                   ["q_proj"]["kernel"]),
        w[: cfg.vision.width].T)
    np.testing.assert_allclose(
        np.asarray(params["text_decoder"]["layers_0"]["cross_attn"]["key"]
                   ["kernel"]),
        np.asarray(sd["text_decoder.roberta.encoder.layer.0.1.self.key"
                      ".weight"]).T)
    np.testing.assert_allclose(
        np.asarray(stats["expert_encoder"]["conv1_seg"]["bn_0"]["mean"]),
        np.asarray(sd["expert_encoder.conv1.seg.2.running_mean"]))

    logits = model.apply(
        {"params": params, "batch_stats": stats}, inputs, ids, mask,
        rngs={"instance": jax.random.key(2)})
    assert logits.shape == (2, 5, 128)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_positional_embedding_reinterpolated_on_load(rng):
    """Fine-tune at a higher resolution re-interpolates the pretrain
    positional embedding (train_caption.py:96-100)."""
    vis = tiny_vision(res=128)  # 64 rgb tokens
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    g = np.random.default_rng(3)
    # checkpoint trained at 64px -> 16 tokens
    vis64 = tiny_vision(res=64)
    cfg64 = PrismerConfig(vision=vis64, decoder=tiny_decoder(),
                          prismer_model="prismer_tiny", dtype="float32")
    sd = build_synthetic_reference_checkpoint(cfg64, g)
    tree = convert_prismer_checkpoint(sd, cfg)
    assert tree["params"]["expert_encoder"]["positional_embedding"].shape \
        == (64, vis.width)
