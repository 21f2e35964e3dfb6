"""Label-aware RandAugment (host-side; PIL for RGB, coordinate maps for labels).

Reproduces the reference's augmentation policy (dataset/randaugment.py):
10 active ops; geometric ops are applied to RGB with BILINEAR resampling and
to every expert label map with NEAREST resampling + per-expert fill value
(0 for dense maps, 255 = background for id maps — randaugment.py:14-15);
photometric ops touch RGB only. Magnitude scaling: v = m/10 * (hi - lo) + lo
with n ops sampled with replacement per image (randaugment.py:253-265).

Two label back-ends with identical output (tests/test_data.py pins them
equal):
  * joint PIL path (`__call__` with labels) — the original formulation,
    kept as the spec;
  * `rgb_and_coeffs` — applies the sampled ops to RGB only and returns the
    label-side affine coefficient list for the vectorized one-gather label
    warp (data/pil_warp.py). RNG draw order is IDENTICAL to the joint path
    (ops via random.choices, then one sign draw per geometric op at
    application time), so both paths consume the same stream.

NOTE (bug-compatible with the reference): Translate magnitudes scale with
the RGB width (reference randaugment.py TranslateX `v * img.size[0]`), and
the resulting PIXEL offset is applied unchanged to the 224px label maps —
a larger relative shift on labels whenever image_resolution > 224.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

from PIL import Image, ImageEnhance, ImageOps

from prismer_tpu.data.pil_warp import Coeffs, rotate_coeffs

# fill values when a geometric op exposes out-of-image area
LABEL_FILL = {"depth": 0, "normal": 0, "edge": 0, "seg_coco": 255,
              "seg_ade": 255, "obj_detection": 255, "ocr_detection": 255}
RGB_FILL = (0, 0, 0)

Pair = Tuple[Image.Image, Optional[Dict[str, Image.Image]]]

# (name, lo, hi) — the reference's *active* list (randaugment.py:186-204;
# Invert/Solarize/Posterize/Color are commented out there)
AUGMENT_OPS = [
    ("identity", 0.0, 1.0),
    ("shear_x", 0.0, 0.3),
    ("shear_y", 0.0, 0.3),
    ("translate_x", 0.0, 0.33),
    ("translate_y", 0.0, 0.33),
    ("rotate", 0.0, 30.0),
    ("autocontrast", 0, 1),
    ("equalize", 0, 1),
    ("brightness", 0.1, 1.9),
    ("sharpness", 0.1, 1.9),
]

GEOMETRIC = {"shear_x", "shear_y", "translate_x", "translate_y", "rotate"}

_PHOTOMETRIC = {
    "autocontrast": lambda im, v: ImageOps.autocontrast(im),
    "equalize": lambda im, v: ImageOps.equalize(im),
    "brightness": lambda im, v: ImageEnhance.Brightness(im).enhance(v),
    "sharpness": lambda im, v: ImageEnhance.Sharpness(im).enhance(v),
}


def _signed(v: float) -> float:
    return -v if random.random() > 0.5 else v


def _geo_coeffs(name: str, v: float, rgb_size: Tuple[int, int]) -> Coeffs:
    """Output->input AFFINE coefficients for a geometric op. The sign draw
    already happened (v may be negative). Translate offsets scale with the
    RGB size (see module note)."""
    if name == "shear_x":
        return (1.0, v, 0.0, 0.0, 1.0, 0.0)
    if name == "shear_y":
        return (1.0, 0.0, 0.0, v, 1.0, 0.0)
    if name == "translate_x":
        return (1.0, 0.0, v * rgb_size[0], 0.0, 1.0, 0.0)
    if name == "translate_y":
        return (1.0, 0.0, 0.0, 0.0, 1.0, v * rgb_size[1])
    raise ValueError(name)


def _apply_rgb_geo(img: Image.Image, name: str, v: float,
                   coeffs: Optional[Coeffs]) -> Image.Image:
    if name == "rotate":
        # PIL rotate default resample is NEAREST — the reference's choice
        return img.rotate(v, fillcolor=RGB_FILL)
    return img.transform(img.size, Image.AFFINE, coeffs,
                         resample=Image.BILINEAR, fillcolor=RGB_FILL)


def _apply_labels_geo(labels: Dict[str, Image.Image], name: str, v: float,
                      coeffs: Optional[Coeffs]) -> Dict[str, Image.Image]:
    if name == "rotate":
        return {exp: lab.rotate(v, resample=Image.NEAREST,
                                fillcolor=LABEL_FILL[exp])
                for exp, lab in labels.items()}
    return {exp: lab.transform(lab.size, Image.AFFINE, coeffs,
                               resample=Image.NEAREST,
                               fillcolor=LABEL_FILL[exp])
            for exp, lab in labels.items()}


class RandAugment:
    def __init__(self, n: int = 2, m: int = 5):
        self.n = n
        self.m = m

    def _run(self, img: Image.Image,
             labels: Optional[Dict[str, Image.Image]],
             coeffs_out: Optional[List[Coeffs]]
             ) -> Pair:
        """Single driver for both back-ends; RNG order: choices, then one
        sign draw per geometric op in application order."""
        for name, lo, hi in random.choices(AUGMENT_OPS, k=self.n):
            v = (self.m / 10.0) * (hi - lo) + lo
            if name == "identity":
                continue
            if name in GEOMETRIC:
                v = _signed(v)
                if name == "rotate":
                    coeffs = None
                else:
                    coeffs = _geo_coeffs(name, v, img.size)
                img = _apply_rgb_geo(img, name, v, coeffs)
                if labels is not None:
                    labels = _apply_labels_geo(labels, name, v, coeffs)
                if coeffs_out is not None:
                    if name == "rotate":
                        # label maps are square LABEL_RESOLUTION images; the
                        # rotate matrix depends only on their size
                        from prismer_tpu.data.transform import LABEL_RESOLUTION
                        coeffs = rotate_coeffs(v, LABEL_RESOLUTION,
                                               LABEL_RESOLUTION)
                    coeffs_out.append(coeffs)
            else:
                img = _PHOTOMETRIC[name](img, v)
        return img, labels

    def __call__(self, img: Image.Image,
                 labels: Optional[Dict[str, Image.Image]]) -> Pair:
        """Joint PIL path (the spec): ops applied to RGB and label images."""
        return self._run(img, labels, None)

    def rgb_and_coeffs(self, img: Image.Image
                       ) -> Tuple[Image.Image, List[Coeffs]]:
        """Vectorized-label path: apply ops to RGB, return label affine
        coefficients (application order) for pil_warp.LabelGather."""
        coeffs: List[Coeffs] = []
        img, _ = self._run(img, None, coeffs)
        return img, coeffs
