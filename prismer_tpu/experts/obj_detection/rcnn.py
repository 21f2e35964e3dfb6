"""UniDet unified-detector inference: FPN(P3-P7) + RPN + cascade ROI heads.

Re-implementation of the reference object-detection expert (experts/
obj_detection/unidet/*; configs/Unified_learned_OCIM_RS200_6x+2x.yaml):

  * FPN over res3-5 with SyncBN lateral/output convs, P6/P7 via stride-2
    convs from P5 (backbone/fpn_p5.py:15-33)
  * RPN: shared 3x3 conv + objectness/4-delta heads over P3-P7, 3 anchors
    per level (sizes 32..512 * 2^{0,1/3,2/3} split per level, ratios
    0.5/1/2), pre-NMS top-1000 per level, IoU-0.7 NMS, post-NMS top-1000
  * ROIAlign-v2 (aligned, 2x2 sampling grid) at resolution 7, level
    assignment by the FPN heuristic floor(4 + log2(sqrt(area)/224))
  * 3 cascade stages (IoU 0.5/0.6/0.7 at training; at inference each stage
    re-runs align+head on the previous stage's refined boxes), box head =
    4x conv3x3+BN+relu -> fc 1024, class-agnostic box deltas, 722-way
    sigmoid classifier; final scores = mean of the 3 stages' sigmoids
    (unified_roi_heads.py:97-100)
  * class-wise NMS 0.5, score 1e-4, top-300 detections

Device programs are jittable with static proposal counts; the sequential
greedy NMS runs on host (numpy) between the two device stages — mirroring
the offline generator's batch pattern.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from prismer_tpu.experts.obj_detection.resnest import ResNeSt, _bn

Dtype = Any

NUM_CLASSES = 722
FPN_DIM = 256
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
LEVEL_STRIDES = (8, 16, 32, 64, 128)          # p3..p7
LEVEL_SIZES = (32, 64, 128, 256, 512)
PRE_NMS_TOPK = 1000
POST_NMS_TOPK = 1000
RPN_NMS_IOU = 0.7
DET_SCORE_THRESH = 1e-4
DET_NMS_IOU = 0.5
DET_TOPK = 300
CASCADE_WEIGHTS = ((10., 10., 5., 5.), (20., 20., 10., 10.),
                   (30., 30., 15., 15.))


class FPN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]) -> List[jax.Array]:
        d = self.dtype
        laterals = []
        for i, f in enumerate(("res3", "res4", "res5")):
            x = nn.Conv(FPN_DIM, (1, 1), use_bias=False, dtype=d,
                        name=f"lateral_{f}")(feats[f])
            laterals.append(_bn(f"lateral_bn_{f}")(x).astype(d))
        # top-down with nearest x2 upsampling
        for i in (1, 0):
            up = laterals[i + 1]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
            laterals[i] = laterals[i] + up[:, :laterals[i].shape[1],
                                           :laterals[i].shape[2]]
        outs = []
        for i, f in enumerate(("p3", "p4", "p5")):
            x = nn.Conv(FPN_DIM, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=d, name=f"output_{f}")(laterals[i])
            outs.append(_bn(f"output_bn_{f}")(x).astype(d))
        p6 = nn.Conv(FPN_DIM, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=d, name="p6")(outs[2])
        p7 = nn.Conv(FPN_DIM, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=d, name="p7")(nn.relu(p6))
        return outs + [p6, p7]


class RPNHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jax.Array]):
        d = self.dtype
        conv = nn.Conv(FPN_DIM, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                       name="conv")
        obj = nn.Conv(len(ANCHOR_RATIOS), (1, 1), dtype=d, name="objectness")
        deltas = nn.Conv(4 * len(ANCHOR_RATIOS), (1, 1), dtype=d,
                         name="anchor_deltas")
        logits, boxes = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(obj(t))
            boxes.append(deltas(t))
        return logits, boxes


def level_anchors(h: int, w: int, stride: int, size: int) -> np.ndarray:
    """(h*w*3, 4) xyxy anchors, detectron2 grid convention (centers at
    (x+0.5)*stride? — d2 uses offset 0: centers at x*stride ... it uses
    shifts = arange * stride, anchor centered at shift with box [-w/2, w/2])."""
    anchors = []
    area = float(size * size)
    for ratio in ANCHOR_RATIOS:
        aw = np.sqrt(area / ratio)
        ah = aw * ratio
        anchors.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
    base = np.asarray(anchors, np.float32)  # (3, 4)
    xs = np.arange(w, dtype=np.float32) * stride
    ys = np.arange(h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(xs, ys)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_boxes(anchors: jax.Array, deltas: jax.Array,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 clip: float = float(np.log(1000.0 / 16))) -> jax.Array:
    """detectron2 Box2BoxTransform.apply_deltas."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * widths
    cy = anchors[:, 1] + 0.5 * heights
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      jnp.minimum(deltas[:, 2] / ww, clip),
                      jnp.minimum(deltas[:, 3] / wh, clip))
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - pw / 2, pcy - ph / 2,
                      pcx + pw / 2, pcy + ph / 2], axis=-1)


def roi_align(feat: jax.Array, boxes: jax.Array, stride: int,
              resolution: int = 7, sampling: int = 2) -> jax.Array:
    """ROIAlign-v2 (aligned=True): feat (H, W, C) single image; boxes
    (N, 4) xyxy in image coords. Returns (N, res, res, C)."""
    h, w, c = feat.shape
    n = boxes.shape[0]
    b = boxes / stride - 0.0  # continuous coords on this level's grid
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    # sample grid: resolution*sampling points per dim, bin-centered
    g = resolution * sampling
    steps = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = x1[:, None] + steps[None, :] * bw[:, None] - 0.5   # aligned=True
    ys = y1[:, None] + steps[None, :] * bh[:, None] - 0.5

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = feat.reshape(h * w, c)
        idx = (yi[:, :, None] * w + xi[:, None, :]).reshape(n, -1)
        return flat[idx].reshape(n, g, g, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy0 = (1 - fy)[:, :, None, None]
    wy1 = fy[:, :, None, None]
    wx0 = (1 - fx)[:, None, :, None]
    wx1 = fx[:, None, :, None]
    vals = v00 * wy0 * wx0 + v01 * wy0 * wx1 + v10 * wy1 * wx0 + v11 * wy1 * wx1
    # average the sampling x sampling grid inside each bin
    vals = vals.reshape(n, resolution, sampling, resolution, sampling, c)
    return vals.mean(axis=(2, 4))


def assign_levels(boxes: jax.Array, k_min: int = 3, k_max: int = 5
                  ) -> jax.Array:
    """FPN level assignment (detectron2 assign_boxes_to_levels):
    floor(4 + log2(sqrt(area)/224)), clamped to [k_min, k_max]."""
    area = jnp.maximum((boxes[:, 2] - boxes[:, 0])
                       * (boxes[:, 3] - boxes[:, 1]), 1e-12)
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224 + 1e-8))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32)


class CascadeBoxHead(nn.Module):
    """4x conv3x3+BN+relu -> flatten -> fc1024 -> (sigmoid cls, 4 deltas)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        for i in range(4):
            x = nn.Conv(FPN_DIM, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=d, name=f"conv{i}")(x)
            x = nn.relu(_bn(f"conv_bn{i}")(x).astype(d))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=d, name="fc1")(x))
        cls = nn.Dense(NUM_CLASSES, dtype=d, name="cls_score")(x)
        deltas = nn.Dense(4, dtype=d, name="bbox_pred")(x)
        return cls, deltas


class UniDet(nn.Module):
    """Device-side pieces; orchestration (NMS) happens on host, see
    detect_single()."""

    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = ResNeSt(dtype=self.dtype)
        self.fpn = FPN(dtype=self.dtype)
        self.rpn = RPNHead(dtype=self.dtype)
        self.box_heads = [CascadeBoxHead(dtype=self.dtype,
                                         name=f"box_head_{i}")
                          for i in range(3)]

    def features(self, image: jax.Array) -> List[jax.Array]:
        """image: (1, H, W, 3) normalized. Returns P3..P7 (NHWC)."""
        return self.fpn(self.backbone(image))

    def rpn_proposals(self, feats: List[jax.Array]
                      ) -> Tuple[jax.Array, jax.Array]:
        """Per-level top-k decoded proposals: returns (boxes (L*K, 4),
        scores (L*K,)) — host NMS follows."""
        logits, deltas = self.rpn(feats)
        all_boxes, all_scores = [], []
        for lvl, f in enumerate(feats):
            h, w = f.shape[1], f.shape[2]
            anchors = jnp.asarray(level_anchors(h, w, LEVEL_STRIDES[lvl],
                                                LEVEL_SIZES[lvl]))
            s = logits[lvl].reshape(-1)
            d = deltas[lvl].reshape(-1, 4)
            k = min(PRE_NMS_TOPK, s.shape[0])
            top_s, idx = jax.lax.top_k(s, k)
            boxes = decode_boxes(anchors[idx], d[idx])
            all_boxes.append(boxes)
            all_scores.append(top_s)
        return (jnp.concatenate(all_boxes, axis=0),
                jnp.concatenate(all_scores, axis=0))

    def cascade_stage(self, feats: List[jax.Array], boxes: jax.Array,
                      stage: int) -> Tuple[jax.Array, jax.Array]:
        """One cascade stage on (N, 4) boxes -> (sigmoid scores (N, C),
        refined boxes (N, 4))."""
        levels = assign_levels(boxes)
        pooled = jnp.zeros((boxes.shape[0], 7, 7, FPN_DIM), jnp.float32)
        for lvl in range(3, 6):  # p3..p5 (ROI pooling levels)
            vals = roi_align(feats[lvl - 3][0].astype(jnp.float32), boxes,
                             LEVEL_STRIDES[lvl - 3])
            pooled = jnp.where((levels == lvl)[:, None, None, None], vals,
                               pooled)
        cls, deltas = self.box_heads[stage](pooled)
        refined = decode_boxes(boxes, deltas.astype(jnp.float32),
                               weights=CASCADE_WEIGHTS[stage])
        return jax.nn.sigmoid(cls.astype(jnp.float32)), refined


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float,
             max_keep: int) -> np.ndarray:
    """Host greedy NMS; returns kept indices (score-sorted)."""
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0 and len(keep) < max_keep:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-12)
        order = order[1:][iou <= iou_thresh]
    return np.asarray(keep, np.int64)


def detect_single(model: UniDet, variables, image: jax.Array,
                  image_hw: Tuple[int, int]):
    """Full single-image inference. Returns (boxes (M,4), scores (M,),
    classes (M,)) as numpy. `image`: (1, H, W, 3) pixel-normalized."""
    feats = model.apply(variables, image, method=UniDet.features)
    p_boxes, p_scores = model.apply(variables, feats,
                                    method=UniDet.rpn_proposals)
    b = np.array(p_boxes)
    s = np.array(p_scores)
    h, w = image_hw
    b[:, 0::2] = b[:, 0::2].clip(0, w)
    b[:, 1::2] = b[:, 1::2].clip(0, h)
    keep = nms_xyxy(b, s, RPN_NMS_IOU, POST_NMS_TOPK)
    boxes = np.zeros((POST_NMS_TOPK, 4), np.float32)
    boxes[: len(keep)] = b[keep]
    boxes_j = jnp.asarray(boxes)

    stage_scores = []
    for stage in range(3):
        scores, boxes_j = model.apply(variables, feats, boxes_j, stage,
                                      method=UniDet.cascade_stage)
        stage_scores.append(np.asarray(scores))
    final_scores = np.mean(stage_scores, axis=0)       # (N, C)
    final_boxes = np.array(boxes_j)
    final_boxes[:, 0::2] = final_boxes[:, 0::2].clip(0, w)
    final_boxes[:, 1::2] = final_boxes[:, 1::2].clip(0, h)

    # class-wise NMS
    out_b, out_s, out_c = [], [], []
    cand_r, cand_c = np.nonzero(final_scores > DET_SCORE_THRESH)
    for cls in np.unique(cand_c):
        rows = cand_r[cand_c == cls]
        keep = nms_xyxy(final_boxes[rows], final_scores[rows, cls],
                        DET_NMS_IOU, DET_TOPK)
        out_b.append(final_boxes[rows[keep]])
        out_s.append(final_scores[rows[keep], cls])
        out_c.append(np.full(len(keep), cls, np.int64))
    if not out_b:
        return (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.int64))
    boxes = np.concatenate(out_b)
    scores = np.concatenate(out_s)
    classes = np.concatenate(out_c)
    order = scores.argsort()[::-1][:DET_TOPK]
    return boxes[order], scores[order], classes[order]
