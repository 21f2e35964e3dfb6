"""Checkpoint-converter tests.

Numerical parity pins: HF RobertaLayer / RobertaEmbeddings / LM head vs our
decoder modules with converted weights; a torch-built conv stem vs our
LabelStem; plus structural round-trips of the full reference checkpoint
layout on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

import transformers
from transformers.models.roberta import modeling_roberta

from prismer_tpu.config import PrismerConfig, VisionEncoderConfig
from prismer_tpu.convert import torch_to_jax as cv
from prismer_tpu.models.roberta import (Embeddings, DecoderLayer, LMHead,
                                        RobertaCausalDecoder,
                                        decoder_mask_bias,
                                        create_position_ids)
from tests.test_models import tiny_decoder, tiny_vision, make_expert_inputs


def hf_tiny_config():
    c = tiny_decoder()
    return transformers.RobertaConfig(
        attn_implementation="eager",
        vocab_size=c.vocab_size, hidden_size=c.hidden_size,
        num_hidden_layers=c.num_hidden_layers,
        num_attention_heads=c.num_attention_heads,
        intermediate_size=c.intermediate_size, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=c.max_position_embeddings,
        type_vocab_size=1, pad_token_id=1, layer_norm_eps=1e-5)


def test_decoder_layer_matches_hf_roberta_layer(rng):
    """Our DecoderLayer(with_cross=False) == HF RobertaLayer numerically."""
    torch.manual_seed(0)
    hf_layer = modeling_roberta.RobertaLayer(hf_tiny_config()).eval()
    sd = {f"L.{k}": v for k, v in hf_layer.state_dict().items()}

    cfg = tiny_decoder()
    x = rng.standard_normal((2, 6, cfg.hidden_size)).astype(np.float32)
    mask = np.ones((2, 6), dtype=np.int64)
    mask[1, 4:] = 0
    bias = np.asarray(decoder_mask_bias(jnp.asarray(mask)))

    with torch.no_grad():
        want = hf_layer(torch.tensor(x),
                        attention_mask=torch.tensor(bias))[0].numpy()

    params = cv._decoder_layer_common(sd, "L")
    ours = DecoderLayer(cfg, with_cross=False)
    # ours takes the (B, L) mask and applies causal+padding internally —
    # identical semantics to the HF extended bias computed above
    got = ours.apply({"params": jax.tree.map(jnp.asarray, params)},
                     jnp.asarray(x), jnp.asarray(mask), None)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_embeddings_match_hf(rng):
    torch.manual_seed(1)
    hf_emb = modeling_roberta.RobertaEmbeddings(hf_tiny_config()).eval()
    cfg = tiny_decoder()
    ids = rng.integers(4, cfg.vocab_size, (2, 7)).astype(np.int64)
    ids[0, 5:] = cfg.pad_token_id
    mask = (ids != cfg.pad_token_id).astype(np.int32)

    with torch.no_grad():
        want = hf_emb(input_ids=torch.tensor(ids)).numpy()

    sd = hf_emb.state_dict()
    params = {
        "word_embeddings": cv._np(sd["word_embeddings.weight"]),
        "position_embeddings": cv._np(sd["position_embeddings.weight"]),
        "token_type_embeddings": cv._np(sd["token_type_embeddings.weight"]),
        "ln": {"scale": cv._np(sd["LayerNorm.weight"]),
               "bias": cv._np(sd["LayerNorm.bias"])},
    }
    pos_ids = create_position_ids(jnp.asarray(ids), jnp.asarray(mask),
                                  cfg.pad_token_id)
    got = Embeddings(cfg).apply({"params": jax.tree.map(jnp.asarray, params)},
                                jnp.asarray(ids), pos_ids)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_full_mlm_conversion_and_lm_head(rng):
    """Convert a whole HF RobertaForMaskedLM; check LM head + tied weights."""
    torch.manual_seed(2)
    hf = transformers.RobertaForMaskedLM(hf_tiny_config()).eval()
    cfg = tiny_decoder()
    converted = cv.convert_hf_roberta_mlm(hf.state_dict(),
                                          cfg.num_hidden_layers)

    # merge into a fresh init (strict=False semantics)
    dec = RobertaCausalDecoder(cfg)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (2, 5)).astype(np.int32))
    mask = jnp.ones((2, 5), dtype=jnp.int32)
    enc = jnp.asarray(rng.standard_normal((2, 3, cfg.vision_hidden_size))
                      .astype(np.float32))
    variables = dec.init(jax.random.key(0), ids, mask, enc)
    params = cv.merge_params(variables["params"], converted)

    # LM head parity on a fixed hidden state
    h = rng.standard_normal((2, 4, cfg.hidden_size)).astype(np.float32)
    with torch.no_grad():
        want = hf.lm_head(torch.tensor(h)).numpy()
    got = LMHead(cfg).apply(
        {"params": params["lm_head"]}, jnp.asarray(h),
        jnp.asarray(params["embeddings"]["word_embeddings"]))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    # full decoder runs with merged params
    logits = dec.apply({"params": params}, ids, mask, enc)
    assert logits.shape == (2, 5, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def _torch_label_stem(in_ch, width, patch_size, id_map):
    """Reference-spec stem (vit.py:88-120) as a torch fixture."""
    scale = (4 if id_map else 16) / patch_size
    strides = (2, 2, 1, 1) if id_map else (2, 2, 2, 2)
    widths = (width // 8, width // 4, width // 2, width)
    mods = [nn.UpsamplingBilinear2d(scale_factor=scale)]
    prev = in_ch
    for s, f in zip(strides, widths):
        mods += [nn.Conv2d(prev, f, 3, stride=s, padding=1, bias=False),
                 nn.BatchNorm2d(f), nn.ReLU()]
        prev = f
    mods += [nn.Conv2d(width, width, 1, stride=1, padding=0, bias=False)]
    return nn.Sequential(*mods)


@pytest.mark.parametrize("id_map,in_ch", [(True, 64), (False, 1)])
def test_label_stem_matches_torch(rng, id_map, in_ch):
    from prismer_tpu.models.vit import LabelStem
    torch.manual_seed(3)
    width, patch = 32, 16
    stem_t = _torch_label_stem(in_ch, width, patch, id_map).eval()
    # randomize BN stats so the parity test is non-trivial
    for m in stem_t.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    x = rng.standard_normal((2, 48, 48, in_ch)).astype(np.float32)
    with torch.no_grad():
        want = stem_t(torch.tensor(x).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()

    sd = {f"S.{k}": v for k, v in stem_t.state_dict().items()}
    params, stats = cv._convert_label_stem(sd, "S")
    ours = LabelStem(width=width, patch_size=patch, id_map=id_map)
    got = ours.apply({"params": jax.tree.map(jnp.asarray, params),
                      "batch_stats": jax.tree.map(jnp.asarray, stats)},
                     jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def _synthetic_clip_state_dict(cfg: VisionEncoderConfig, grid=7):
    """Random CLIP-visual-format state dict (with CLS token + visual. prefix)."""
    g = np.random.default_rng(7)
    w = cfg.width
    sd = {
        "visual.conv1.weight": g.standard_normal(
            (w, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32),
        "visual.positional_embedding": g.standard_normal(
            (grid * grid + 1, w)).astype(np.float32),
        "visual.ln_pre.weight": np.ones(w, np.float32),
        "visual.ln_pre.bias": np.zeros(w, np.float32),
        "visual.ln_post.weight": np.ones(w, np.float32),
        "visual.ln_post.bias": np.zeros(w, np.float32),
    }
    for i in range(cfg.layers):
        p = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{p}.attn.in_proj_weight": g.standard_normal((3 * w, w)).astype(np.float32),
            f"{p}.attn.in_proj_bias": g.standard_normal(3 * w).astype(np.float32),
            f"{p}.attn.out_proj.weight": g.standard_normal((w, w)).astype(np.float32),
            f"{p}.attn.out_proj.bias": g.standard_normal(w).astype(np.float32),
            f"{p}.ln_1.weight": np.ones(w, np.float32),
            f"{p}.ln_1.bias": np.zeros(w, np.float32),
            f"{p}.ln_2.weight": np.ones(w, np.float32),
            f"{p}.ln_2.bias": np.zeros(w, np.float32),
            f"{p}.mlp.c_fc.weight": g.standard_normal((4 * w, w)).astype(np.float32),
            f"{p}.mlp.c_fc.bias": g.standard_normal(4 * w).astype(np.float32),
            f"{p}.mlp.c_proj.weight": g.standard_normal((w, 4 * w)).astype(np.float32),
            f"{p}.mlp.c_proj.bias": g.standard_normal(w).astype(np.float32),
        })
    return sd


def test_clip_conversion_merges_into_encoder(rng):
    from prismer_tpu.models.vit import VisionTransformer
    vis = tiny_vision(experts=(("rgb", 3), ("depth", 1)))
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    sd = _synthetic_clip_state_dict(vis)
    converted = cv.convert_clip_vision(sd, cfg)
    # CLS dropped and re-interpolated 7x7 -> 4x4
    assert converted["positional_embedding"].shape == (16, vis.width)

    model = VisionTransformer(vis)
    inputs = make_expert_inputs(rng, vis)
    variables = model.init(jax.random.key(0), inputs)
    merged = cv.merge_params(variables["params"], converted)
    out = model.apply({"params": merged,
                       "batch_stats": variables["batch_stats"]}, inputs)
    assert out.shape == (2, 16 + 8, vis.width)
