"""UniDet expert tests: split-attention + box transforms + ROIAlign vs torch
fixtures; tiny end-to-end detect."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from prismer_tpu.experts.obj_detection import rcnn
from prismer_tpu.experts.obj_detection.resnest import (SplAtConv,
                                                       avg_pool_torch)


def test_avg_pool_torch_semantics(rng):
    x = rng.standard_normal((1, 9, 9, 3)).astype(np.float32)
    want = F.avg_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 3, 2, 1,
                        count_include_pad=False)
    got = avg_pool_torch(jnp.asarray(x), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(), atol=1e-6)


class TorchSplAt(nn.Module):
    """splat.py:29-92 semantics, radix 2, cardinality 1."""

    def __init__(self, ch):
        super().__init__()
        inter = max(ch * 2 // 4, 32)
        self.conv = nn.Conv2d(ch, ch * 2, 3, padding=1, groups=2, bias=False)
        self.bn0 = nn.BatchNorm2d(ch * 2)
        self.fc1 = nn.Conv2d(ch, inter, 1)
        self.bn1 = nn.BatchNorm2d(inter)
        self.fc2 = nn.Conv2d(inter, ch * 2, 1)
        self.ch = ch

    def forward(self, x):
        x = F.relu(self.bn0(self.conv(x)))
        b = x.shape[0]
        s1, s2 = torch.split(x, self.ch, dim=1)
        gap = F.adaptive_avg_pool2d(s1 + s2, 1)
        gap = F.relu(self.bn1(self.fc1(gap)))
        atten = self.fc2(gap).view(b, 2, self.ch)
        atten = F.softmax(atten, dim=1).view(b, -1, 1, 1)
        a1, a2 = torch.split(atten, self.ch, dim=1)
        return a1 * s1 + a2 * s2


def test_splat_conv_matches_torch(rng):
    torch.manual_seed(0)
    ch = 32
    tm = TorchSplAt(ch).eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.7, 1.3)
    x = rng.standard_normal((2, 8, 8, ch)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    def cv(m):
        out = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
        if m.bias is not None:
            out["bias"] = m.bias.detach().numpy()
        return out

    def bn(m):
        return ({"scale": m.weight.detach().numpy(),
                 "bias": m.bias.detach().numpy()},
                {"mean": m.running_mean.numpy(),
                 "var": m.running_var.numpy()})

    bn0p, bn0s = bn(tm.bn0)
    bn1p, bn1s = bn(tm.bn1)
    variables = {"params": {"conv": cv(tm.conv), "fc1": cv(tm.fc1),
                            "fc2": cv(tm.fc2), "bn0": bn0p, "bn1": bn1p},
                 "batch_stats": {"bn0": bn0s, "bn1": bn1s}}
    mod = SplAtConv(ch)
    got = mod.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)


def test_decode_boxes_identity_and_shift():
    anchors = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 25.]])
    deltas = jnp.zeros((2, 4))
    out = rcnn.decode_boxes(anchors, deltas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(anchors), atol=1e-5)
    # dx = 0.1 shifts center by 0.1 * width
    out = rcnn.decode_boxes(anchors, jnp.asarray([[0.1, 0., 0., 0.]] * 2))
    np.testing.assert_allclose(np.asarray(out[0]), [1, 0, 11, 10], atol=1e-5)


def test_level_anchors_properties():
    a = rcnn.level_anchors(2, 3, stride=8, size=32)
    assert a.shape == (2 * 3 * 3, 4)
    # first cell, ratio=1 anchor is centered at (0, 0) with side 32
    np.testing.assert_allclose(a[1], [-16, -16, 16, 16])
    # second column shifts by stride
    np.testing.assert_allclose(a[4], [8 - 16, -16, 8 + 16, 16])


def test_roi_align_constant_field(rng):
    """A constant feature map pools to the constant (interior boxes)."""
    feat = jnp.full((16, 16, 4), 3.5, jnp.float32)
    boxes = jnp.asarray([[8., 8., 40., 40.], [16., 24., 48., 56.]])
    out = rcnn.roi_align(feat, boxes, stride=8)
    assert out.shape == (2, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 3.5, atol=1e-5)


def test_roi_align_linear_field():
    """Bilinear pooling of a linear ramp reproduces exact bin centers."""
    h = w = 16
    ramp = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
    feat = jnp.asarray(ramp[:, :, None])
    boxes = jnp.asarray([[8., 8., 72., 72.]])  # stride 8 -> grid [1, 9]
    out = np.asarray(rcnn.roi_align(feat, boxes, stride=8))[0, :, :, 0]
    # x bin centers in grid coords: 1 + (i+0.5)*8/7 - 0.5 averaged over 2 samples
    for i in range(7):
        centers = [1 + (i + j / 2 + 0.25) * 8 / 7 - 0.5 for j in range(2)]
        want = np.mean(centers)
        np.testing.assert_allclose(out[0, i], want, rtol=1e-5)


def test_nms_xyxy():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = rcnn.nms_xyxy(boxes, scores, 0.5, 10)
    assert list(keep) == [0, 2]


def test_unidet_tiny_end_to_end(rng):
    """Smaller ResNeSt variant through full detect_single."""
    from prismer_tpu.experts.obj_detection.resnest import ResNeSt

    class TinyUniDet(rcnn.UniDet):
        def setup(self):
            self.backbone = ResNeSt(blocks=(1, 1, 1, 1), stem_width=8,
                                    dtype=self.dtype)
            self.fpn = rcnn.FPN(dtype=self.dtype)
            self.rpn = rcnn.RPNHead(dtype=self.dtype)
            self.box_heads = [rcnn.CascadeBoxHead(dtype=self.dtype,
                                                  name=f"box_head_{i}")
                              for i in range(3)]

    model = TinyUniDet()
    img = jnp.asarray(rng.standard_normal((1, 128, 128, 3)).astype(np.float32))
    feats_shape = model.init(jax.random.key(0), img, method=TinyUniDet.features)
    variables = model.init(
        {"params": jax.random.key(0)}, img, method=TinyUniDet.features)
    # init the remaining heads by tracing them once
    feats = model.apply(variables, img, method=TinyUniDet.features)
    v2 = model.init(jax.random.key(1), feats, method=TinyUniDet.rpn_proposals)
    params = dict(variables["params"])
    params.update(v2["params"])
    stats = dict(variables.get("batch_stats", {}))
    for stage in range(3):
        v3 = model.init(jax.random.key(2 + stage), feats,
                        jnp.zeros((8, 4), jnp.float32), stage,
                        method=TinyUniDet.cascade_stage)
        params.update(v3["params"])
        stats.update(v3.get("batch_stats", {}))
    merged = {"params": params, "batch_stats": stats}

    boxes, scores, classes = rcnn.detect_single(model, merged, img,
                                                (128, 128))
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert len(scores) == len(classes) == len(boxes)
