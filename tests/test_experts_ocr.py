"""CharNet OCR expert tests: polygon geometry vs hand-computed truths,
weighted-NMS semantics, hourglass shapes, synthetic-map end-to-end decode."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.experts.ocr_detection.model import CharNet
from prismer_tpu.experts.ocr_detection.postprocess import (
    OrientedTextPostProcessing, clip_polygon, levenshtein, polygon_area,
    quad_iou, rotate_rect, weighted_nms)


def quad(x1, y1, x2, y2):
    return np.array([x1, y1, x2, y1, x2, y2, x1, y2], np.float64)


def test_polygon_area():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float64)
    assert polygon_area(sq) == 16.0
    tri = np.array([[0, 0], [4, 0], [0, 3]], np.float64)
    assert polygon_area(tri) == 6.0


def test_clip_polygon_overlap():
    a = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float64)
    b = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], np.float64)
    inter = clip_polygon(a, b)
    assert abs(polygon_area(inter) - 4.0) < 1e-9
    # winding-independent
    inter2 = clip_polygon(a, b[::-1])
    assert abs(polygon_area(inter2) - 4.0) < 1e-9


def test_quad_iou_hand_computed():
    b1 = np.append(quad(0, 0, 4, 4), 1.0)
    b2 = np.append(quad(2, 2, 6, 6), 1.0)
    want = 4.0 / (16 + 16 - 4)
    assert abs(quad_iou(b1, b2) - want) < 1e-9
    b3 = np.append(quad(10, 10, 12, 12), 1.0)
    assert quad_iou(b1, b3) == 0.0


def test_rotate_rect_90deg():
    pts = rotate_rect(-1, -2, 1, 2, math.pi / 2, 0, 0)
    want = [[2, -1], [2, 1], [-2, 1], [-2, -1]]
    np.testing.assert_allclose(pts, want, atol=1e-9)


def test_weighted_nms_merges_neighbours():
    # two near-identical boxes + one far box; num_neig=1 drops the loner
    boxes = np.stack([
        np.append(quad(0, 0, 10, 10), 0.9),
        np.append(quad(1, 0, 11, 10), 0.7),
        np.append(quad(50, 50, 60, 60), 0.8),
    ]).astype(np.float32)
    pick, new_boxes = weighted_nms(boxes, overlap_thresh=0.15, num_neig=1)
    assert pick == [0]  # loner at idx 2 dropped (no neighbours)
    # merged coords = score-weighted mean of boxes 0 and 1
    w = np.array([0.7, 0.9]).reshape(-1, 1)
    want = (boxes[[1, 0], :8] * w).sum(0) / w.sum()
    np.testing.assert_allclose(new_boxes[0, :8], want, rtol=1e-5)
    assert new_boxes[0, 8] == np.float32(0.9)


def test_weighted_nms_unsuppresses_on_dropped_pick():
    # num_neig=2: box0 has only 1 neighbour -> dropped, neighbour restored
    boxes = np.stack([
        np.append(quad(0, 0, 10, 10), 0.9),
        np.append(quad(0, 0, 10, 10), 0.8),
    ]).astype(np.float32)
    pick, _ = weighted_nms(boxes, overlap_thresh=0.15, num_neig=2)
    assert pick == []


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("", "xyz") == 3


def test_charnet_shapes(rng):
    model = CharNet()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out["word_fg"].shape == (1, 16, 16, 2)
    assert out["word_tblr"].shape == (1, 16, 16, 4)
    assert out["word_orient"].shape == (1, 16, 16, 1)
    assert out["char_cls"].shape == (1, 16, 16, 68)
    np.testing.assert_allclose(np.asarray(out["word_fg"]).sum(-1), 1.0,
                               atol=1e-5)
    assert float(jnp.min(out["word_tblr"])) >= 0.0


def test_postprocess_end_to_end_synthetic():
    """Hand-built maps containing one axis-aligned word of two chars."""
    h = w = 32
    preds = {
        "word_fg": np.zeros((h, w, 2), np.float32),
        "word_tblr": np.zeros((h, w, 4), np.float32),
        "word_orient": np.zeros((h, w, 1), np.float32),
        "char_fg": np.zeros((h, w, 2), np.float32),
        "char_tblr": np.zeros((h, w, 4), np.float32),
        "char_cls": np.zeros((h, w, 68), np.float32),
    }
    # word centered at (8, 8) in feature coords: extent t=b=2, l=4, r=4
    preds["word_fg"][8, 8, 1] = 0.95
    preds["word_tblr"][8, 8] = (2, 2, 4, 4)
    # two chars ('A' cls 10, 'B' cls 11), each fired by TWO pixels mapping
    # to the same box — the NMS neighbour rule (num_neig=1) drops loners
    for x0, cls in ((6, 10), (10, 11)):
        for x, (t, b, l, r) in ((x0, (1.5, 1.5, 1.5, 1.5)),
                                (x0 + 1, (1.5, 1.5, 2.5, 0.5))):
            preds["char_fg"][8, x, 1] = 0.9
            preds["char_tblr"][8, x] = (t, b, l, r)
            preds["char_cls"][8, x, cls] = 0.99
            # word_fg gate for char parsing needs fg>min at char pixels,
            # with word geometry that still maps onto the same word box
            preds["word_fg"][8, x, 1] = 0.95
            preds["word_tblr"][8, x] = (2, 2, x - 4, 12 - x)

    post = OrientedTextPostProcessing(lexicon=None)
    words = post(preds, scale_w=1.0, scale_h=1.0, W=128, H=128)
    assert len(words) == 1
    assert words[0].text == "AB"
    assert words[0].text_score > 0.9


def test_lexicon_correction():
    post = OrientedTextPostProcessing(lexicon=["HELLO", "WORLD"])
    from prismer_tpu.experts.ocr_detection.postprocess import WordInstance
    w = WordInstance(np.zeros(8), 0.9, "HELLQ", 0.85, np.zeros((5, 68)))
    out = post._filter([w])
    assert len(out) == 1 and out[0].text == "HELLO"
    # too-far word is rejected
    w2 = WordInstance(np.zeros(8), 0.9, "ZZZZZ", 0.85, np.zeros((5, 68)))
    assert post._filter([w2]) == []
