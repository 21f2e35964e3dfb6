"""Bit-exact numpy replication of PIL's NEAREST geometry, as COORDINATE MAPS.

The joint label transform (data/transform.py) historically round-tripped all
7 expert label maps through PIL for every geometric stage (crop -> 224x224
NEAREST resize -> flip -> up to n RandAugment affines) — ~23 ms/record of
per-label PIL work on this host, the top input-pipeline stage after the
round-4 decode/normalize wins. All of those stages are nearest-neighbour
gathers, so the whole chain collapses to ONE composed (src_y, src_x, oob)
index grid computed once per record and 7 cheap numpy gathers.

Exactness (pinned by tests/test_data.py::test_vectorized_label_*): Pillow
dispatches NEAREST geometry to two different C kernels (Geometry.c), both
replicated here bit-for-bit:

  * ``affine_fixed`` — general affines (shear, rotate): coefficients are
    16.16 fixed-point (FIX(v) = floor(v*65536 + 0.5)); per-pixel source
    coordinate is an exact integer linear form a2 + y*a1 + x*a0 evaluated
    at pixel centers (the +0.5 folded into the constant BEFORE fixing),
    arithmetic-shifted >> 16, bounds-checked on the resulting int.
  * ``ImagingScaleAffine`` — pure scale/translate (B == 0 and D == 0, which
    includes every ``resize`` and the RandAugment translations): float64
    SEQUENTIAL accumulation xo = C + A*0.5; xo += A per column (NOT a
    closed-form multiply — the accumulated rounding is observable), floored
    to int, bounds-checked on the int. np.add.accumulate performs the same
    sequential left-fold over float64.

``Image.rotate`` lowers to an affine via the matrix built in
PIL.Image.Image.rotate (cos/sin rounded to 15 decimals, center-relative);
``rotate_coeffs`` reproduces that construction.

Reference behavior being replicated: dataset/utils.py:40-51 (fixed 224
NEAREST label resize + joint flip) and dataset/randaugment.py:19-27
(label affines with NEAREST + per-expert fill).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

Coeffs = Tuple[float, float, float, float, float, float]


def _fix(v: float) -> int:
    """Pillow's FIX macro: FLOOR(v * 65536.0 + 0.5)."""
    return int(math.floor(v * 65536.0 + 0.5))


def affine_nearest_grid(coeffs: Sequence[float], out_wh: Tuple[int, int],
                        in_wh: Tuple[int, int]
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(xi, yi, oob) int32/bool grids of shape (h_out, w_out) replicating
    ``img.transform(out_wh, Image.AFFINE, coeffs, NEAREST)`` — which C
    kernel runs depends on the coefficients, exactly as in Pillow."""
    a, b, c, d, e, f = (float(v) for v in coeffs)
    w_out, h_out = out_wh
    w_in, h_in = in_wh
    if b == 0.0 and d == 0.0:
        # ImagingScaleAffine: float64 sequential accumulation, separable
        xo = np.add.accumulate(
            np.concatenate([[c + a * 0.5], np.full(w_out - 1, a)]))
        yo = np.add.accumulate(
            np.concatenate([[f + e * 0.5], np.full(h_out - 1, e)]))
        xi1 = np.floor(xo).astype(np.int64)
        yi1 = np.floor(yo).astype(np.int64)
        oob = ((yi1 < 0) | (yi1 >= h_in))[:, None] | \
              ((xi1 < 0) | (xi1 >= w_in))[None, :]
        xi = np.broadcast_to(np.clip(xi1, 0, w_in - 1)[None, :],
                             (h_out, w_out))
        yi = np.broadcast_to(np.clip(yi1, 0, h_in - 1)[:, None],
                             (h_out, w_out))
        return (np.ascontiguousarray(xi, np.int32),
                np.ascontiguousarray(yi, np.int32), oob)
    # affine_fixed: 16.16 fixed point, exact integer linear form
    a0, a1 = _fix(a), _fix(b)
    a3, a4 = _fix(d), _fix(e)
    a2 = _fix(c + a * 0.5 + b * 0.5)
    a5 = _fix(f + d * 0.5 + e * 0.5)
    ys = np.arange(h_out, dtype=np.int64)[:, None]
    xs = np.arange(w_out, dtype=np.int64)[None, :]
    xi = (a2 + ys * a1 + xs * a0) >> 16
    yi = (a5 + ys * a4 + xs * a3) >> 16
    oob = (xi < 0) | (xi >= w_in) | (yi < 0) | (yi >= h_in)
    return (np.clip(xi, 0, w_in - 1).astype(np.int32),
            np.clip(yi, 0, h_in - 1).astype(np.int32), oob)


def rotate_coeffs(angle: float, w: int, h: int) -> Coeffs:
    """The output->input AFFINE coefficients PIL.Image.rotate(angle,
    expand=False) builds before calling transform (PIL/Image.py rotate)."""
    angle = angle % 360.0
    rotn_center = (w / 2.0, h / 2.0)
    rad = -math.radians(angle)
    m = [round(math.cos(rad), 15), round(math.sin(rad), 15), 0.0,
         round(-math.sin(rad), 15), round(math.cos(rad), 15), 0.0]
    m[2] = m[0] * -rotn_center[0] + m[1] * -rotn_center[1]
    m[5] = m[3] * -rotn_center[0] + m[4] * -rotn_center[1]
    m[2] += rotn_center[0]
    m[5] += rotn_center[1]
    return tuple(m)  # type: ignore[return-value]


def compose_label_grid(src_wh: Tuple[int, int],
                       crop: Tuple[int, int, int, int] | None,
                       flip: bool, geo_coeffs: List[Coeffs],
                       label_resolution: int = 224
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compose the full label chain into one (src_y, src_x, oob) grid.

    Chain (forward order, = data/transform.py Transform.__call__):
      [crop (top, left, ch, cw)] -> resize (label_resolution^2, NEAREST)
      -> [h-flip] -> geo_coeffs[0] -> geo_coeffs[1] -> ...

    Every nearest stage k produces integer source coords into stage k-1's
    output, so composition is a chain of integer gathers — identical values
    to materializing each intermediate image, without materializing any.
    Out-of-bounds at ANY affine stage means that stage's constant fill is
    sampled from there on, so a single accumulated `oob` mask suffices
    (all stages share one per-expert fill value, randaugment.LABEL_FILL).
    """
    r = label_resolution
    w, h = src_wh
    # innermost-first accumulation: walk the chain BACKWARDS from the output
    # grid; (xi, yi) always index the output of the stage currently being
    # peeled, oob accumulates fill hits
    xi = yi = None
    oob = np.zeros((r, r), bool)
    for coeffs in reversed(geo_coeffs):
        gxi, gyi, goob = affine_nearest_grid(coeffs, (r, r), (r, r))
        if xi is None:
            xi, yi, oob = gxi, gyi, goob.copy()
        else:
            oob = oob | goob[yi, xi]
            xi, yi = gxi[yi, xi], gyi[yi, xi]
    if xi is None:
        yi, xi = np.indices((r, r), dtype=np.int32)
    if flip:
        xi = (r - 1) - xi
    if crop is not None:
        top, left, ch, cw = crop
    else:
        top = left = 0
        ch, cw = h, w
    rxi, ryi, roob = affine_nearest_grid(
        (cw / r, 0.0, 0.0, 0.0, ch / r, 0.0), (r, r), (cw, ch))
    # resize grids are separable; index the 2-D forms directly
    assert not roob.any(), "nearest resize never samples out of bounds"
    sx = rxi[yi, xi] + np.int32(left)
    sy = ryi[yi, xi] + np.int32(top)
    return sy, sx, oob
