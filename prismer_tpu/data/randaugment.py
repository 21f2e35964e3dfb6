"""Label-aware RandAugment (host-side, PIL).

Reproduces the reference's augmentation policy (dataset/randaugment.py):
10 active ops; geometric ops are applied to RGB with BILINEAR resampling and
to every expert label map with NEAREST resampling + per-expert fill value
(0 for dense maps, 255 = background for id maps — randaugment.py:14-15);
photometric ops touch RGB only. Magnitude scaling: v = m/10 * (hi - lo) + lo
with n ops sampled with replacement per image (randaugment.py:253-265).
"""

from __future__ import annotations

import random
from typing import Dict, Optional, Tuple

from PIL import Image, ImageEnhance, ImageOps

# fill values when a geometric op exposes out-of-image area
LABEL_FILL = {"depth": 0, "normal": 0, "edge": 0, "seg_coco": 255,
              "seg_ade": 255, "obj_detection": 255, "ocr_detection": 255}
RGB_FILL = (0, 0, 0)

Pair = Tuple[Image.Image, Optional[Dict[str, Image.Image]]]


def _apply_affine(pair: Pair, coeffs) -> Pair:
    """Shared inverse-affine application: BILINEAR on RGB, NEAREST + fill on
    labels (randaugment.py:19-27)."""
    img, labels = pair
    img = img.transform(img.size, Image.AFFINE, coeffs,
                        resample=Image.BILINEAR, fillcolor=RGB_FILL)
    if labels is not None:
        labels = {
            exp: lab.transform(lab.size, Image.AFFINE, coeffs,
                               resample=Image.NEAREST,
                               fillcolor=LABEL_FILL[exp])
            for exp, lab in labels.items()}
    return img, labels


def _signed(v: float) -> float:
    return -v if random.random() > 0.5 else v


def _shear_x(pair: Pair, v: float) -> Pair:
    return _apply_affine(pair, (1, _signed(v), 0, 0, 1, 0))


def _shear_y(pair: Pair, v: float) -> Pair:
    return _apply_affine(pair, (1, 0, 0, _signed(v), 1, 0))


def _translate_x(pair: Pair, v: float) -> Pair:
    px = _signed(v) * pair[0].size[0]
    return _apply_affine(pair, (1, 0, px, 0, 1, 0))


def _translate_y(pair: Pair, v: float) -> Pair:
    px = _signed(v) * pair[0].size[1]
    return _apply_affine(pair, (1, 0, 0, 0, 1, px))


def _rotate(pair: Pair, v: float) -> Pair:
    deg = _signed(v)
    img, labels = pair
    img = img.rotate(deg, fillcolor=RGB_FILL)
    if labels is not None:
        labels = {exp: lab.rotate(deg, resample=Image.NEAREST,
                                  fillcolor=LABEL_FILL[exp])
                  for exp, lab in labels.items()}
    return img, labels


def _photometric(fn):
    def op(pair: Pair, v: float) -> Pair:
        img, labels = pair
        return fn(img, v), labels
    return op


# (op, lo, hi) — the reference's *active* list (randaugment.py:186-204;
# Invert/Solarize/Posterize/Color are commented out there)
AUGMENT_OPS = [
    (lambda pair, v: pair, 0.0, 1.0),                                # Identity
    (_shear_x, 0.0, 0.3),
    (_shear_y, 0.0, 0.3),
    (_translate_x, 0.0, 0.33),
    (_translate_y, 0.0, 0.33),
    (_rotate, 0.0, 30.0),
    (_photometric(lambda im, v: ImageOps.autocontrast(im)), 0, 1),
    (_photometric(lambda im, v: ImageOps.equalize(im)), 0, 1),
    (_photometric(lambda im, v: ImageEnhance.Brightness(im).enhance(v)), 0.1, 1.9),
    (_photometric(lambda im, v: ImageEnhance.Sharpness(im).enhance(v)), 0.1, 1.9),
]


class RandAugment:
    def __init__(self, n: int = 2, m: int = 5):
        self.n = n
        self.m = m

    def __call__(self, img: Image.Image,
                 labels: Optional[Dict[str, Image.Image]]) -> Pair:
        pair: Pair = (img, labels)
        for op, lo, hi in random.choices(AUGMENT_OPS, k=self.n):
            v = (self.m / 10.0) * (hi - lo) + lo
            pair = op(pair, v)
        return pair
