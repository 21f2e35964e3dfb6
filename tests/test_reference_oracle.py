"""Reference-oracle parity harness (the round-2 north-star de-risk).

Builds the reference's OWN composed torch model (model/modules/vit.py:78-172
+ model/modules/roberta.py:336-406) with random init on CPU — patching out
only the CLIP download (vit.py:179, zero-egress env) — converts its
state_dict through `convert_prismer_checkpoint`, and asserts:

  (i)   encoder outputs match (PrismerZ-BASE rgb-only AND Prismer-BASE with
        depth/normal/edge/seg/ocr experts, full 768-wide / 12-layer size)
  (ii)  full decoder logits match through cross-attention (padded batch)
  (iii) the reference's per-sample summed label-smoothed CE matches ours
  (iv)  generated token sequences from the ACTUAL HF `generate` (num_beams=3)
        match our jitted KV-cached beam search, for caption settings
        (max 20 / min 8, prismer_caption.py:45-50) and VQA settings
        (prompt+10 / prompt+2, length_penalty=-1, right-padded prompts,
        prismer_vqa.py:51-57), with and without an EOS-boosted LM bias so
        the finished-pool bookkeeping is genuinely exercised.

obj_detection is excluded from (i): its instance embedding draws
`random.randint` slots per forward (vit.py:141-148), so the reference is
non-deterministic there; slot-add semantics are pinned separately in
tests/test_models.py.

transformers>=4.50 no longer mixes GenerationMixin into PreTrainedModel, so
the harness subclasses the reference decoder with the mixin — the generate
semantics are unchanged (the deprecation note says exactly this)."""

import json
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prismer_tpu.config import (PrismerConfig, TextDecoderConfig,
                                VisionEncoderConfig, build_prismer_config)
from prismer_tpu.convert import torch_to_jax as cv
from prismer_tpu.convert.torch_to_jax import merge_params
from prismer_tpu.models.generation import beam_search
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.models.roberta import label_smoothed_loss

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not available")


def _reference_modules():
    """Import the reference model modules with the CLIP downloader stubbed."""
    if "clip" not in sys.modules:
        clip_pkg = types.ModuleType("clip")
        clip_mod = types.ModuleType("clip.clip")

        def _no_egress(*a, **k):
            raise RuntimeError("zero-egress environment")

        clip_mod._download = _no_egress
        clip_pkg.clip = clip_mod
        sys.modules["clip"] = clip_pkg
        sys.modules["clip.clip"] = clip_mod
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.modules.roberta import RobertaForCausalLMModified
    from model.modules.vit import VisionTransformer as RefViT
    from transformers.generation import GenerationMixin

    class RefDecoder(RobertaForCausalLMModified, GenerationMixin):
        pass

    return RefViT, RefDecoder


def _composed_sd(ref_vit, ref_dec):
    sd = {f"expert_encoder.{k}": v for k, v in ref_vit.state_dict().items()}
    sd.update({f"text_decoder.{k}": v
               for k, v in ref_dec.state_dict().items()})
    return sd


def _our_variables(model, cfg, params_tree, rng):
    """Init our model (shapes) then overlay every converted leaf."""
    from tests.test_models import make_expert_inputs
    inputs = make_expert_inputs(rng, cfg.vision, batch=1)
    ids = jnp.zeros((1, 4), jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    init = model.init(jax.random.key(0), inputs, ids, mask)
    out = {"params": merge_params(init["params"], params_tree["params"])}
    if "batch_stats" in init:
        stats = init["batch_stats"]
        if params_tree.get("batch_stats"):
            stats = merge_params(stats, params_tree["batch_stats"])
        out["batch_stats"] = stats
    # numpy leaves can't be tracer-indexed inside lax.while_loop decoding
    return jax.tree.map(jnp.asarray, out)


# ---------------------------------------------------------------------------
# full-size BASE composite: encoder / decoder logits / loss
# ---------------------------------------------------------------------------

VARIANTS = {
    "prismerz_base": [],
    "prismer_base": ["depth", "normal", "edge", "seg_coco", "ocr_detection"],
}


@pytest.fixture(scope="module", params=sorted(VARIANTS))
def composed(request):
    RefViT, RefDecoder = _reference_modules()
    experts_yaml = VARIANTS[request.param]

    cfg = build_prismer_config({
        "experts": experts_yaml or "none", "image_resolution": 224,
        "prismer_model": "prismer_base", "freeze": "none",
        "dtype": "float32"})

    torch.manual_seed(0)
    ref_vit = RefViT(input_resolution=224, patch_size=16, width=768,
                     layers=12, heads=12,
                     experts=dict(cfg.vision.experts)).eval()
    entry = json.load(open(f"{REFERENCE}/configs/prismer.json"))["prismer_base"]
    from transformers import RobertaConfig
    ref_dec = RefDecoder(RobertaConfig.from_dict(entry["roberta_model"])).eval()
    # shake the BN running stats away from the (0, 1) init so the label-stem
    # eval-mode normalization is actually exercised
    for m in ref_vit.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.9, 1.1)

    tree = cv.convert_prismer_checkpoint(_composed_sd(ref_vit, ref_dec), cfg)
    model = Prismer(cfg)
    variables = _our_variables(model, cfg, tree, np.random.default_rng(0))
    return ref_vit, ref_dec, model, cfg, variables


def _paired_inputs(cfg, rng, batch=2):
    """(torch CHW dict, jax NHWC dict) with identical values, cfg order."""
    torch_x, jax_x = {}, {}
    for exp, ch in cfg.vision.experts:
        res = (cfg.vision.image_resolution if exp == "rgb"
               else cfg.vision.label_resolution)
        a = rng.standard_normal((batch, ch, res, res)).astype(np.float32)
        torch_x[exp] = torch.tensor(a)
        jax_x[exp] = jnp.asarray(a.transpose(0, 2, 3, 1))
    return torch_x, jax_x


def test_encoder_matches_reference(composed, rng):
    ref_vit, _, model, cfg, variables = composed
    torch_x, jax_x = _paired_inputs(cfg, rng)
    with torch.no_grad():
        want = ref_vit(torch_x).permute(1, 0, 2).numpy()  # (L,B,D)->(B,L,D)
    got = np.asarray(model.apply(variables, jax_x, method=Prismer.encode))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_decoder_logits_and_loss_match_reference(composed, rng):
    ref_vit, ref_dec, model, cfg, variables = composed
    torch_x, jax_x = _paired_inputs(cfg, rng)
    with torch.no_grad():
        enc_t = ref_vit(torch_x).permute(1, 0, 2)

    ids = np.array([[0, 250, 35, 2072, 16, 10, 4, 2],
                    [0, 99, 7, 2, 1, 1, 1, 1]], np.int64)
    mask = (ids != 1).astype(np.int64)
    labels = np.where(ids == 1, -100, ids)
    labels[:, :2] = -100  # prefix masking (prismer_caption.py:25-27)

    with torch.no_grad():
        out = ref_dec(torch.tensor(ids), attention_mask=torch.tensor(mask),
                      encoder_hidden_states=enc_t,
                      labels=torch.tensor(labels), return_dict=True)

    got_logits = np.asarray(model.apply(
        variables, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), jnp.asarray(enc_t.numpy()),
        method=Prismer.decode_logits))
    np.testing.assert_allclose(got_logits, out.logits.numpy(),
                               atol=5e-4, rtol=1e-3)

    got_loss = np.asarray(label_smoothed_loss(
        jnp.asarray(got_logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got_loss, out.loss.numpy(), rtol=2e-5)


# ---------------------------------------------------------------------------
# generate-sequence parity vs actual HF generate (reduced width, full logic)
# ---------------------------------------------------------------------------

GEN = dict(vocab_size=1000, hidden_size=128, vision_hidden_size=128,
           num_hidden_layers=4, num_attention_heads=4,
           intermediate_size=256, max_position_embeddings=514)


def _gen_models(eos_boost: float, seed: int):
    RefViT, RefDecoder = _reference_modules()
    from transformers import RobertaConfig
    rcfg = RobertaConfig(
        bos_token_id=0, eos_token_id=2, pad_token_id=1, type_vocab_size=1,
        hidden_act="gelu", layer_norm_eps=1e-5, is_decoder=True,
        attention_probs_dropout_prob=0.1, hidden_dropout_prob=0.1, **GEN)
    torch.manual_seed(seed)
    ref_dec = RefDecoder(rcfg).eval()
    ref_vit = RefViT(input_resolution=64, patch_size=16, width=128, layers=2,
                     heads=2, experts={"rgb": 3}).eval()
    if eos_boost:
        with torch.no_grad():
            ref_dec.lm_head.bias[2] += eos_boost

    vis = VisionEncoderConfig(
        name="ViT-Gen-Test", image_resolution=64, label_resolution=64,
        patch_size=16, width=128, layers=2, heads=2, experts=(("rgb", 3),))
    dec = TextDecoderConfig(**GEN)
    cfg = PrismerConfig(vision=vis, decoder=dec, prismer_model="prismer_gen",
                        freeze="none", dtype="float32")
    tree = cv.convert_prismer_checkpoint(_composed_sd(ref_vit, ref_dec), cfg)
    model = Prismer(cfg)
    variables = _our_variables(model, cfg, tree,
                               np.random.default_rng(seed))
    return ref_dec, model, variables


def _compare_generate(ref_dec, model, variables, prompt_ids, prompt_mask,
                      enc, *, max_length, min_length, length_penalty):
    with torch.no_grad():
        want = ref_dec.generate(
            input_ids=torch.tensor(prompt_ids.astype(np.int64)),
            attention_mask=torch.tensor(prompt_mask.astype(np.int64)),
            encoder_hidden_states=torch.tensor(enc),
            num_beams=3, max_length=max_length, min_length=min_length,
            length_penalty=length_penalty).numpy()

    got, _ = beam_search(
        model, variables, jnp.asarray(enc),
        jnp.asarray(prompt_ids.astype(np.int32)),
        jnp.asarray(prompt_mask.astype(np.int32)),
        num_beams=3, max_length=max_length, min_length=min_length,
        length_penalty=length_penalty, eos_token_id=2, pad_token_id=1)
    got = np.asarray(got)

    hf_len = want.shape[1]
    np.testing.assert_array_equal(
        got[:, :hf_len], want,
        err_msg=f"ours={got.tolist()} hf={want.tolist()}")
    assert np.all(got[:, hf_len:] == 1), got.tolist()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("eos_boost", [0.0, 4.0])
def test_generate_caption_settings_match_hf(seed, eos_boost, rng):
    ref_dec, model, variables = _gen_models(eos_boost, seed)
    enc = rng.standard_normal((2, 20, 128)).astype(np.float32)
    # fixed-width caption prefix, no padding (prismer_caption.py:37-41)
    prompt = np.array([[0, 250, 35], [0, 99, 35]], np.int64)
    mask = np.ones_like(prompt)
    _compare_generate(ref_dec, model, variables, prompt, mask, enc,
                      max_length=20, min_length=8, length_penalty=1.0)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("eos_boost", [0.0, 4.0])
def test_generate_vqa_settings_match_hf(seed, eos_boost, rng):
    """Right-padded question prompts + length_penalty=-1
    (prismer_vqa.py:51-57)."""
    ref_dec, model, variables = _gen_models(eos_boost, seed)
    enc = rng.standard_normal((2, 20, 128)).astype(np.float32)
    prompt = np.array([[0, 250, 35, 77, 2], [0, 99, 7, 1, 1]], np.int64)
    mask = (prompt != 1).astype(np.int64)
    p = prompt.shape[1]
    _compare_generate(ref_dec, model, variables, prompt, mask, enc,
                      max_length=p + 10, min_length=p + 2,
                      length_penalty=-1.0)


def test_encoder_nondivisible_patch_geometry_matches_reference(rng):
    """ViT-L/14-style geometry: resolution NOT a multiple of patch size.
    torch Conv2d floors (VALID) -> (100//14)^2 = 49 tokens; flax SAME
    padding would give 8x8=64 (the round-1 bug caught by the real-shape
    sharding test). Pins output shape AND values vs the reference ViT."""
    RefViT, _ = _reference_modules()
    torch.manual_seed(3)
    ref_vit = RefViT(input_resolution=100, patch_size=14, width=64,
                     layers=2, heads=2, experts={"rgb": 3}).eval()

    vis = VisionEncoderConfig(
        name="ViT-Geom-Test", image_resolution=100, label_resolution=64,
        patch_size=14, width=64, layers=2, heads=2, experts=(("rgb", 3),))
    geom = dict(GEN, vision_hidden_size=64)
    dec = TextDecoderConfig(**geom)
    cfg = PrismerConfig(vision=vis, decoder=dec, prismer_model="geom",
                        freeze="none", dtype="float32")

    from transformers import RobertaConfig
    ref_dec_cfg = RobertaConfig(
        bos_token_id=0, eos_token_id=2, pad_token_id=1, type_vocab_size=1,
        hidden_act="gelu", layer_norm_eps=1e-5, is_decoder=True, **geom)
    _, RefDecoder = _reference_modules()
    ref_dec = RefDecoder(ref_dec_cfg).eval()

    tree = cv.convert_prismer_checkpoint(_composed_sd(ref_vit, ref_dec), cfg)
    model = Prismer(cfg)
    variables = _our_variables(model, cfg, tree, np.random.default_rng(3))

    a = rng.standard_normal((2, 3, 100, 100)).astype(np.float32)
    with torch.no_grad():
        want = ref_vit({"rgb": torch.tensor(a)}).permute(1, 0, 2).numpy()
    got = np.asarray(model.apply(
        variables, {"rgb": jnp.asarray(a.transpose(0, 2, 3, 1))},
        method=Prismer.encode))
    assert got.shape == want.shape == (2, 49, 64)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
