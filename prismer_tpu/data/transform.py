"""Joint image + expert-label transform (host side, PIL + numpy).

Replicates dataset/utils.py:23-71 without torchvision:

  * train: RandomResizedCrop params (scale cfg, ratio 3/4..4/3) applied
    identically to RGB and all label maps (utils.py:33-37)
  * RGB resized (bicubic) to image_resolution; labels to FIXED 224x224
    NEAREST (utils.py:40-43)
  * joint horizontal flip p=0.5 (utils.py:46-51), RandAugment(2,5)
  * to arrays: dense labels -> float32 [0,1]; id labels -> uint8 ids — the
    (tensor*255).long() quantization (utils.py:57-63) is exact for uint8 PNG
    sources, which id maps always are
  * RGB normalized with the CLIP pixel stats (utils.py:66-67)

Output is NHWC numpy; id maps stay uint8 — in-painting happens on device
(prismer_tpu/data/device.py).
"""

from __future__ import annotations

import math
import os
import random
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# Ship RGB to the device as uint8 and fold the /255 + CLIP normalization
# into materialize_experts (data/device.py): the host-side float32 convert
# + two elementwise passes cost ~6 ms/record at 480px (measured, 1-core
# host) and quadruple the host->device copy. Identical arithmetic runs as
# one fused f32 expression on device. Opt out: PRISMER_RGB_DEVICE_NORM=0.
RGB_DEVICE_NORM = os.environ.get("PRISMER_RGB_DEVICE_NORM", "1") != "0"

LABEL_RESOLUTION = 224  # fixed (utils.py:43)

ID_EXPERTS = ("seg_coco", "seg_ade", "obj_detection", "ocr_detection")
DENSE_EXPERTS = ("depth", "normal", "edge")

# Vectorized label warp (data/pil_warp.py): the whole label-side geometry
# chain (crop -> 224 NEAREST resize -> flip -> RandAugment affines) becomes
# ONE composed index grid + 7 numpy gathers instead of per-label PIL round
# trips (~23 ms/record -> ~2 ms, the top remaining input-pipeline stage).
# Bit-exact vs the PIL path (tests/test_data.py::test_vectorized_label_*);
# opt out with PRISMER_VEC_LABELS=0.
VEC_LABELS = os.environ.get("PRISMER_VEC_LABELS", "1") != "0"


def random_resized_crop_params(w: int, h: int, scale: Tuple[float, float],
                               ratio: Tuple[float, float] = (3 / 4, 4 / 3)
                               ) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params semantics: 10 attempts of
    (uniform-area, log-uniform-ratio) crops, else center fallback.
    Returns (top, left, crop_h, crop_w)."""
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * random.uniform(*scale)
        aspect = math.exp(random.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = random.randint(0, h - ch)
            left = random.randint(0, w - cw)
            return top, left, ch, cw
    # center-crop fallback
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw = w
        ch = int(round(cw / ratio[0]))
    elif in_ratio > ratio[1]:
        ch = h
        cw = int(round(ch * ratio[1]))
    else:
        cw, ch = w, h
    top = (h - ch) // 2
    left = (w - cw) // 2
    return top, left, ch, cw


class Transform:
    """Callable (PIL image, {expert: PIL label} | None) -> {name: ndarray}."""

    def __init__(self, resize_resolution: int = 384,
                 scale_size: Tuple[float, float] = (0.5, 1.0),
                 train: bool = False):
        from prismer_tpu.data.randaugment import RandAugment
        self.res = resize_resolution
        self.scale_size = tuple(scale_size)
        self.train = train
        self.randaugment = RandAugment(2, 5)

    def __call__(self, image: Image.Image,
                 labels: Optional[Dict[str, Image.Image]]
                 ) -> Dict[str, np.ndarray]:
        # labels must share the RGB geometry for a composed index grid to be
        # valid; mismatched sizes (never produced by the expert generators)
        # take the exact PIL path
        vectorize = (VEC_LABELS and labels is not None
                     and all(l.size == image.size for l in labels.values()))
        if vectorize:
            return self._call_vectorized(image, labels)
        return self._call_pil(image, labels)

    def _call_pil(self, image: Image.Image,
                  labels: Optional[Dict[str, Image.Image]]
                  ) -> Dict[str, np.ndarray]:
        """Original joint-PIL formulation — the behavioral spec the
        vectorized path is pinned against."""
        if self.train:
            w, h = image.size
            top, left, ch, cw = random_resized_crop_params(
                w, h, self.scale_size)
            box = (left, top, left + cw, top + ch)
            image = image.crop(box)
            if labels is not None:
                labels = {e: l.crop(box) for e, l in labels.items()}

        image = image.resize((self.res, self.res), Image.BICUBIC)
        if labels is not None:
            labels = {e: l.resize((LABEL_RESOLUTION, LABEL_RESOLUTION),
                                  Image.NEAREST)
                      for e, l in labels.items()}

        if self.train:
            if random.random() < 0.5:
                image = image.transpose(Image.FLIP_LEFT_RIGHT)
                if labels is not None:
                    labels = {e: l.transpose(Image.FLIP_LEFT_RIGHT)
                              for e, l in labels.items()}
            image, labels = self.randaugment(image, labels)

        label_arrays = (None if labels is None else
                        {e: np.asarray(l) for e, l in labels.items()})
        return self._pack(image, label_arrays)

    def _call_vectorized(self, image: Image.Image,
                         labels: Dict[str, Image.Image]
                         ) -> Dict[str, np.ndarray]:
        """Same record, same RNG stream: RGB through the identical PIL calls,
        labels through one composed nearest-index grid (data/pil_warp.py)."""
        from prismer_tpu.data.pil_warp import LabelGather
        from prismer_tpu.data.randaugment import LABEL_FILL

        src_wh = image.size
        crop = None
        if self.train:
            w, h = image.size
            top, left, ch, cw = random_resized_crop_params(
                w, h, self.scale_size)
            crop = (top, left, ch, cw)
            image = image.crop((left, top, left + cw, top + ch))

        image = image.resize((self.res, self.res), Image.BICUBIC)

        flip = False
        geo_coeffs = []
        if self.train:
            if random.random() < 0.5:
                flip = True
                image = image.transpose(Image.FLIP_LEFT_RIGHT)
            image, geo_coeffs = self.randaugment.rgb_and_coeffs(image)

        gather = LabelGather(src_wh, crop, flip, geo_coeffs,
                             LABEL_RESOLUTION)
        # labels decoded by the native loader / .npy cache carry their
        # backing array (labels.py prismer_np) — gather straight from it
        label_arrays = {}
        for exp, lab in labels.items():
            arr = getattr(lab, "prismer_np", None)
            if arr is None:
                arr = np.asarray(lab)
            label_arrays[exp] = gather(arr, LABEL_FILL[exp])
        return self._pack(image, label_arrays)

    def _pack(self, image: Image.Image,
              label_arrays: Optional[Dict[str, np.ndarray]]
              ) -> Dict[str, np.ndarray]:
        if RGB_DEVICE_NORM:
            rgb = np.asarray(image, np.uint8)
        else:
            rgb = np.asarray(image, np.float32) / 255.0
            rgb = (rgb - CLIP_MEAN) / CLIP_STD
        out: Dict[str, np.ndarray] = {"rgb": rgb}

        if label_arrays is not None:
            for exp, arr in label_arrays.items():
                if exp in DENSE_EXPERTS:
                    a = arr.astype(np.float32) / 255.0
                    if a.ndim == 2:
                        a = a[:, :, None]
                    out[exp] = a
                else:  # id maps stay uint8
                    out[exp] = arr.astype(np.uint8)
        return out


def remap_dense(x: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Per-sample min-max remap of dense maps to [-1, 1]
    (dataset/utils.py:120-121)."""
    lo, hi = x.min(), x.max()
    return 2.0 * (x - lo) / (hi - lo + eps) - 1.0
