"""UniDet converter structural test: a synthetic detectron2-layout state
dict (built programmatically by inverting our own param shapes) converts and
merges into a tiny UniDet tree, with value spot checks on the transposes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prismer_tpu.convert.experts import convert_unidet
from prismer_tpu.convert.torch_to_jax import merge_params
from prismer_tpu.experts.obj_detection import rcnn
from prismer_tpu.experts.obj_detection.resnest import ResNeSt

BLOCKS = (1, 1, 1, 1)


class TinyUniDet(rcnn.UniDet):
    def setup(self):
        self.backbone = ResNeSt(blocks=BLOCKS, stem_width=8,
                                dtype=self.dtype)
        self.fpn = rcnn.FPN(dtype=self.dtype)
        self.rpn = rcnn.RPNHead(dtype=self.dtype)
        self.box_heads = [rcnn.CascadeBoxHead(dtype=self.dtype,
                                              name=f"box_head_{i}")
                          for i in range(3)]


def _torch_conv_from(kernel):
    kh, kw, i, o = kernel.shape
    g = np.random.default_rng(abs(hash((kh, kw, i, o))) % (2 ** 31))
    return torch.tensor(g.standard_normal((o, i, kh, kw)).astype(np.float32))


def _fill_d2_conv(sd, prefix, params, bn_params=None):
    sd[f"{prefix}.weight"] = _torch_conv_from(np.asarray(params["kernel"]))
    if "bias" in params:
        sd[f"{prefix}.bias"] = torch.zeros(params["bias"].shape[0])
    if bn_params is not None:
        n = bn_params["scale"].shape[0]
        sd[f"{prefix}.norm.weight"] = torch.ones(n)
        sd[f"{prefix}.norm.bias"] = torch.zeros(n)
        sd[f"{prefix}.norm.running_mean"] = torch.zeros(n)
        sd[f"{prefix}.norm.running_var"] = torch.ones(n)


def test_unidet_converter_structure(rng):
    model = TinyUniDet()
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v1 = model.init(jax.random.key(0), img, method=TinyUniDet.features)
    feats = model.apply(v1, img, method=TinyUniDet.features)
    params = dict(v1["params"])
    stats = dict(v1.get("batch_stats", {}))
    v2 = model.init(jax.random.key(1), feats, method=TinyUniDet.rpn_proposals)
    params.update(v2["params"])
    for stage in range(3):
        v3 = model.init(jax.random.key(2 + stage), feats,
                        jnp.zeros((4, 4), jnp.float32), stage,
                        method=TinyUniDet.cascade_stage)
        params.update(v3["params"])
        stats.update(v3.get("batch_stats", {}))

    # build the synthetic detectron2-layout dict
    sd = {}
    bb = params["backbone"]
    for i in (1, 2, 3):
        _fill_d2_conv(sd, f"backbone.bottom_up.stem.conv1_{i}",
                      bb[f"stem_conv{i}"], bb[f"stem_bn{i}"])
    for s, n in enumerate(BLOCKS):
        for b in range(n):
            blk = bb[f"res{s + 2}_block{b}"]
            q = f"backbone.bottom_up.res{s + 2}.{b}"
            _fill_d2_conv(sd, f"{q}.conv1", blk["conv1"], blk["bn1"])
            _fill_d2_conv(sd, f"{q}.conv2.conv", blk["conv2"]["conv"])
            _fill_d2_conv(sd, f"{q}.conv2.fc1", blk["conv2"]["fc1"])
            _fill_d2_conv(sd, f"{q}.conv2.fc2", blk["conv2"]["fc2"])
            for bn in ("bn0", "bn1"):
                nch = blk["conv2"][bn]["scale"].shape[0]
                sd[f"{q}.conv2.{bn}.weight"] = torch.ones(nch)
                sd[f"{q}.conv2.{bn}.bias"] = torch.zeros(nch)
                sd[f"{q}.conv2.{bn}.running_mean"] = torch.zeros(nch)
                sd[f"{q}.conv2.{bn}.running_var"] = torch.ones(nch)
            _fill_d2_conv(sd, f"{q}.conv3", blk["conv3"], blk["bn3"])
            if "shortcut_conv" in blk:
                _fill_d2_conv(sd, f"{q}.shortcut", blk["shortcut_conv"],
                              blk["shortcut_bn"])
    fp = params["fpn"]
    for lvl, f in ((3, "res3"), (4, "res4"), (5, "res5")):
        _fill_d2_conv(sd, f"backbone.fpn_lateral{lvl}", fp[f"lateral_{f}"],
                      fp[f"lateral_bn_{f}"])
        _fill_d2_conv(sd, f"backbone.fpn_output{lvl}", fp[f"output_p{lvl}"],
                      fp[f"output_bn_p{lvl}"])
    _fill_d2_conv(sd, "backbone.top_block.p6", fp["p6"])
    _fill_d2_conv(sd, "backbone.top_block.p7", fp["p7"])
    rp = params["rpn"]
    _fill_d2_conv(sd, "proposal_generator.rpn_head.conv", rp["conv"])
    _fill_d2_conv(sd, "proposal_generator.rpn_head.objectness_logits",
                  rp["objectness"])
    _fill_d2_conv(sd, "proposal_generator.rpn_head.anchor_deltas",
                  rp["anchor_deltas"])
    for stage in range(3):
        h = params[f"box_head_{stage}"]
        for i in range(4):
            _fill_d2_conv(sd, f"roi_heads.box_head.{stage}.conv{i + 1}",
                          h[f"conv{i}"], h[f"conv_bn{i}"])
        for name, ours in (("fc1", "fc1"), ):
            w = np.asarray(h[ours]["kernel"])
            sd[f"roi_heads.box_head.{stage}.{name}.weight"] = \
                torch.tensor(w.T.copy())
            sd[f"roi_heads.box_head.{stage}.{name}.bias"] = \
                torch.zeros(w.shape[1])
        for name in ("cls_score", "bbox_pred"):
            w = np.asarray(h[name]["kernel"])
            sd[f"roi_heads.box_predictor.{stage}.{name}.weight"] = \
                torch.tensor(w.T.copy())
            sd[f"roi_heads.box_predictor.{stage}.{name}.bias"] = \
                torch.zeros(w.shape[1])

    tree = convert_unidet(sd, blocks=BLOCKS)
    merged_p = merge_params(params, tree["params"])
    merged_s = merge_params(stats, tree["batch_stats"])

    # value spot-check: conv transpose mapping round-trips
    want = np.asarray(sd["backbone.bottom_up.stem.conv1_1.weight"]
                      ).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(merged_p["backbone"]["stem_conv1"]["kernel"]), want)
    np.testing.assert_allclose(
        np.asarray(merged_p["box_head_0"]["cls_score"]["kernel"]),
        np.asarray(params["box_head_0"]["cls_score"]["kernel"]))
