"""Host-side task-head helpers: prefix/prompt handling, VQA batch building,
caption loss plumbing (prismer_caption.py / prismer_vqa.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.config import PrismerConfig
from prismer_tpu.models import caption as cap
from prismer_tpu.models import vqa
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.tokenizer import synthetic_tokenizer
from tests.test_models import make_expert_inputs, tiny_decoder, tiny_vision


@pytest.fixture(scope="module")
def tok():
    return synthetic_tokenizer()


def test_prefix_prompt_ids_drops_eos(tok):
    ids, mask = cap.prefix_prompt_ids(tok, "a cat", batch=3)
    assert ids.shape[0] == 3
    assert (ids[:, 0] == tok.bos_token_id).all()
    assert tok.eos_token_id not in ids[0]  # </s> removed (caption.py:39)
    assert mask.shape == ids.shape and mask.all()


def test_prefix_length_matches_prompt(tok):
    p_len = cap.prefix_length(tok, "a cat")
    ids, _ = cap.prefix_prompt_ids(tok, "a cat", batch=1)
    assert p_len == ids.shape[1]
    assert cap.prefix_length(tok, "") == 0


def test_caption_targets_mask_pads_and_prefix(tok):
    ids = jnp.asarray([[0, 5, 6, 7, 2, 1, 1]])
    mask = (ids != 1).astype(jnp.int32)
    tgt = cap.caption_targets(ids, mask, prompt_len=2, pad_token_id=1)
    np.testing.assert_array_equal(
        np.asarray(tgt)[0], [-100, -100, 6, 7, 2, -100, -100])


def test_tokenize_answer_list_modes(tok):
    ids_l, mask_l = cap.tokenize_answer_list(tok, ["Cat", "doG"],
                                             lowercase=True)
    ids_c, mask_c = cap.tokenize_answer_list(tok, ["cat", "dog"],
                                             lowercase=False)
    # lowercase path = ' cat</s>'; capitalize path = ' Cat</s>'
    assert (ids_l[:, -1] == tok.eos_token_id).any()  # eos inside (pre-pad)
    assert ids_l.shape[0] == 2 and ids_c.shape[0] == 2
    assert not np.array_equal(ids_l, ids_c)


def test_tokenize_questions_prepends_bos(tok):
    ids, mask = vqa.tokenize_questions(tok, ["is it red?", "why"])
    assert (ids[:, 0] == tok.bos_token_id).all()
    assert mask[:, 0].all()


def test_vqa_training_batch_targets(tok):
    ids, mask, targets = vqa.vqa_training_batch(
        tok, ["is it red?"], ["yes"])
    q_ids, _ = vqa.tokenize_questions(tok, ["is it red?"])
    q_len = q_ids.shape[1]
    # question span fully masked; answer span supervised where non-pad
    assert (targets[:, :q_len] == -100).all()
    ans_region = targets[0, q_len:]
    assert (ans_region[ans_region != -100] ==
            ids[0, q_len:][ans_region != -100]).all()


def test_caption_loss_train_and_eval_paths(rng, tok):
    vis = tiny_vision()
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    experts = make_expert_inputs(rng, vis)
    enc = tok(["a cat sat", "a dog ran"], padding="longest", truncation=True,
              max_length=12)
    ids = jnp.asarray(np.clip(enc.input_ids, 0, 127))
    mask = jnp.asarray(enc.attention_mask)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        experts, ids, mask)

    loss_eval = cap.caption_loss(model, variables, experts, ids, mask,
                                 prompt_len=1, train=False)
    assert np.isfinite(float(loss_eval))

    loss_train, updates = cap.caption_loss(
        model, variables, experts, ids, mask, prompt_len=1, train=True,
        rngs={"dropout": jax.random.key(2)})
    assert np.isfinite(float(loss_train))


def test_prismer_large_config_builds():
    from prismer_tpu.config import build_prismer_config
    cfg = build_prismer_config({
        "experts": "none", "image_resolution": 480,
        "prismer_model": "prismer_large", "freeze": "freeze_vision"})
    assert cfg.vision.width == 1024
    assert cfg.vision.layers == 24
    assert cfg.decoder.hidden_size == 1024
    assert cfg.decoder.num_hidden_layers == 24
    # PrismerZ: rgb tokens only ((480/14)^2 = 34^2)
    assert cfg.vision.num_output_tokens == (480 // 14) ** 2

    cfg_h = build_prismer_config({
        "experts": ["depth"], "image_resolution": 224,
        "prismer_model": "prismer_huge", "freeze": "none"})
    assert cfg_h.vision.width == 1280
    assert cfg_h.decoder.vision_hidden_size == 1280
    assert cfg_h.vision.num_output_tokens == 16 ** 2 + 64


def test_prismer_huge_abstract_init_and_hbm_fit():
    """Pin prismer_huge (ViT-H/14 + roberta-large) at full width without
    allocating: eval_shape traces init + forward, so the 1B-param tree and
    the encoder/decoder geometry are checked on CPU in seconds.

    HBM-fit arithmetic this pins (reference ships huge as a first-class
    size, model/modules/vit.py:28-34): 1.416e9 params = ~2.8 GB bf16
    serving weights; at 480px the ViT-H/14 grid is 34x34=1156 rgb tokens
    (+6x64 expert latents via the resampler), so b8 serving activations
    + KV caches fit a 16 GB chip with >10 GB headroom."""
    from prismer_tpu.config import build_prismer_config

    cfg = build_prismer_config({
        "experts": ["depth", "normal", "seg_coco", "edge",
                    "obj_detection", "ocr_detection"],
        "image_resolution": 480,
        "prismer_model": "prismer_huge",
        "freeze": "freeze_vision",
        "dtype": "bfloat16",
    })
    assert cfg.vision.width == 1280 and cfg.vision.layers == 32
    assert cfg.vision.heads == 16  # Dh=80: equal-array-dim flash blocks

    model = Prismer(cfg)
    batch, seq = 2, 8
    rng = np.random.default_rng(0)
    experts = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        make_expert_inputs(rng, cfg.vision, batch=batch))
    ids = jax.ShapeDtypeStruct((batch, seq), jnp.int32)
    mask = jax.ShapeDtypeStruct((batch, seq), jnp.int32)

    variables = jax.eval_shape(
        lambda e, i, m: Prismer(cfg).init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            e, i, m),
        experts, ids, mask)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(variables["params"]))
    # ViT-H trunk ~632M + six expert stems + 32 encoder adaptors (~105M)
    # + resampler + roberta-large w/ decoder adaptors and the 50k x 1024
    # tied embedding: 1.416B total, ~2.8 GB bf16
    assert n_params == 1_415_938_297, n_params

    logits = jax.eval_shape(
        lambda v, e, i, m: Prismer(cfg).apply(v, e, i, m, train=False),
        variables, experts, ids, mask)
    assert logits.shape == (batch, seq, cfg.decoder.vocab_size)
