"""Weight-path round-trip tests for the expert model bank: a synthetic
checkpoint file on disk (reference filenames + formats, incl. detectron2
raw-pickle .pkl) must come back from load_expert_model as CONVERTED params,
not fresh init — closing the reference's load_expert_model weight semantics
(experts/model_bank.py:26-135). Tiny model variants keep the full layer
counts the converters expect but shrink widths."""

import os
import pickle

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prismer_tpu.experts import model_bank

import synth_sd as synth


@pytest.fixture()
def weights_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PRISMER_EXPERT_WEIGHTS", str(tmp_path))
    return tmp_path


def test_missing_weights_warn_loudly(weights_dir):
    with pytest.warns(UserWarning, match="RANDOM weights"):
        model_bank.load_expert_model("edge", image_size=64)


def test_seg_coco_pkl_roundtrip(weights_dir, monkeypatch):
    from prismer_tpu.experts.segmentation import mask2former as m2f
    from prismer_tpu.experts.segmentation import swin

    class TinyMaskFormer(nn.Module):
        num_classes: int = 133

        @nn.compact
        def __call__(self, x):
            feats = swin.SwinTransformer(embed_dim=8, heads=(1, 2, 4, 8),
                                         window=4, name="backbone")(x)
            mask_features, ms = m2f.PixelDecoder(
                conv_dim=32, mask_dim=32, name="pixel_decoder")(feats)
            classes, masks = m2f.MaskedTransformerDecoder(
                num_queries=10, hidden_dim=32, heads=4,
                num_classes=self.num_classes, mask_dim=32,
                name="predictor")(ms, mask_features)
            return masks

    monkeypatch.setattr(m2f, "MaskFormer", TinyMaskFormer)

    probe = TinyMaskFormer()
    variables = jax.eval_shape(
        lambda k: probe.init(k, jnp.zeros((1, 64, 64, 3), jnp.float32)),
        jax.random.key(0))
    sd = synth.synth_mask2former_sd(variables["params"])
    with open(os.path.join(weights_dir, "model_final_f07440.pkl"), "wb") as f:
        pickle.dump({"model": sd, "__author__": "synthetic"}, f)

    _, loaded, _ = model_bank.load_expert_model("seg_coco", image_size=64)
    p = loaded["params"]
    np.testing.assert_array_equal(
        np.asarray(p["backbone"]["patch_embed"]["kernel"]),
        sd["backbone.patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(p["predictor"]["query_feat"]),
        sd["sem_seg_head.predictor.query_feat.weight"])
    np.testing.assert_array_equal(
        np.asarray(p["predictor"]["cross_8"]["out_proj"]["kernel"]),
        sd["sem_seg_head.predictor.transformer_cross_attention_layers.8"
           ".multihead_attn.out_proj.weight"].T)


def test_unidet_pth_roundtrip(weights_dir, monkeypatch):
    from prismer_tpu.experts.obj_detection import rcnn, resnest

    BLOCKS = (1, 1, 1, 1)

    class TinyUniDet(rcnn.UniDet):
        def setup(self):
            self.backbone = resnest.ResNeSt(blocks=BLOCKS, stem_width=8,
                                            dtype=self.dtype)
            self.fpn = rcnn.FPN(dtype=self.dtype)
            self.rpn = rcnn.RPNHead(dtype=self.dtype)
            self.box_heads = [rcnn.CascadeBoxHead(dtype=self.dtype,
                                                  name=f"box_head_{i}")
                              for i in range(3)]

    monkeypatch.setattr(rcnn, "UniDet", TinyUniDet)
    monkeypatch.setattr(resnest, "RESNEST200_BLOCKS", BLOCKS)

    # shapes via the same multi-method init model_bank itself performs
    fresh = model_bank._init_unidet(TinyUniDet(), 64)
    sd = synth.synth_unidet_sd(fresh["params"], fresh["batch_stats"], BLOCKS)
    torch.save({"model": sd},
               os.path.join(weights_dir,
                            "Unified_learned_OCIM_RS200_6x+2x.pth"))

    _, loaded, _ = model_bank.load_expert_model("obj_detection",
                                                image_size=64)
    p = loaded["params"]
    np.testing.assert_array_equal(
        np.asarray(p["backbone"]["stem_conv1"]["kernel"]),
        sd["backbone.bottom_up.stem.conv1_1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(p["box_head_0"]["cls_score"]["kernel"]),
        sd["roi_heads.box_predictor.0.cls_score.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(loaded["batch_stats"]["backbone"]["stem_bn1"]["mean"]),
        sd["backbone.bottom_up.stem.conv1_1.norm.running_mean"])


def test_charnet_pth_roundtrip(weights_dir):
    from prismer_tpu.experts.ocr_detection.model import CharNet

    probe = CharNet()
    variables = jax.eval_shape(
        lambda k: probe.init(k, jnp.zeros((1, 64, 64, 3), jnp.float32)),
        jax.random.key(0))
    sd = synth.synth_charnet_sd(variables)
    torch.save(sd, os.path.join(weights_dir, "icdar2015_hourglass88.pth"))

    _, loaded, _ = model_bank.load_expert_model("ocr_detection",
                                                image_size=64)
    p = loaded["params"]
    np.testing.assert_array_equal(
        np.asarray(p["backbone"]["pre_conv"]["kernel"]),
        sd["backbone.pre.0.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(p["recog_cls"]["kernel"]),
        sd["char_recognizer.classifier.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(loaded["batch_stats"]["backbone"]["pre_bn"]["mean"]),
        sd["backbone.pre.1.running_mean"])


def test_partial_conversion_coverage_gate():
    """A converted tree covering too few param leaves must be refused (a
    silently partial load of a frozen expert would generate noise labels
    with no signal); near-full coverage proceeds with a warning naming the
    uncovered leaves."""
    leaf = lambda: np.zeros((2, 2), np.float32)
    params = {f"layer_{i}": {"kernel": leaf(), "bias": leaf()}
              for i in range(60)}
    variables = {"params": params}

    partial = {"params": {"layer_0": {"kernel": leaf()}}}
    with pytest.raises(ValueError, match="covers only 1/120 param leaves"):
        model_bank._merge_converted(variables, partial, "edge")

    almost = {"params": {k: dict(v) for k, v in params.items()}}
    del almost["params"]["layer_7"]["bias"]  # 119/120 > 99% covered
    with pytest.warns(UserWarning, match="layer_7/bias"):
        out = model_bank._merge_converted(variables, almost, "edge")
    assert set(out["params"]) == set(params)


def test_drifted_checkpoint_fails_loudly(weights_dir):
    """A real checkpoint file whose key layout drifted (here: every key
    re-prefixed, as a repackaged release might) must raise, not silently
    load random weights."""
    sd = {f"module2.block_{i}.weight": torch.zeros(2, 2) for i in range(4)}
    torch.save(sd, os.path.join(weights_dir, model_bank.WEIGHTS["edge"]))
    with pytest.raises((KeyError, ValueError)):
        model_bank.load_expert_model("edge", image_size=64)
