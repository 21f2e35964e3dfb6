"""Bit-exact numpy replication of PIL's NEAREST geometry, as COORDINATE MAPS.

The joint label transform (data/transform.py) historically round-tripped all
7 expert label maps through PIL for every geometric stage (crop -> 224x224
NEAREST resize -> flip -> up to n RandAugment affines). All of those stages
are nearest-neighbour gathers, so the whole chain collapses to ONE composed
flat index grid computed once per record (`LabelGather`) and 7 cheap numpy
takes — the per-label PIL round trips disappear.

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
    sequential left-fold over float64. This path is SEPARABLE, so chains of
    scale/translate stages compose as 1-D axis maps; `LabelGather` stays in
    the cheap separable representation until a shear/rotate forces 2-D.

``Image.rotate`` lowers to an affine via the matrix built in
PIL.Image.Image.rotate (cos/sin rounded to 15 decimals, center-relative);
``rotate_coeffs`` reproduces that construction.

Out-of-bounds at ANY stage means that stage's constant fill is sampled from
there on; all stages share one per-expert fill value
(randaugment.LABEL_FILL), so a single accumulated mask suffices — baked
into the flat index as a SENTINEL slot past the source array, which each
take serves from a 1-element fill appendix (no per-label boolean masking).

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


def scale_axis_map(a: float, c: float, n_out: int, n_in: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """One axis of ImagingScaleAffine: (int32 source index, oob mask),
    replicating the C kernel's sequential float64 accumulation."""
    xo = np.add.accumulate(
        np.concatenate([[c + a * 0.5], np.full(n_out - 1, a)]))
    xi = np.floor(xo)
    oob = (xi < 0) | (xi >= n_in)
    return np.clip(xi, 0, n_in - 1).astype(np.int32), oob


def affine_fixed_grid(coeffs: Sequence[float], out_wh: Tuple[int, int],
                      in_wh: Tuple[int, int]
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(xi, yi, oob) int32/bool grids of shape (h_out, w_out) replicating
    Pillow's fixed-point affine_fixed NEAREST kernel."""
    a, b, c, d, e, f = (float(v) for v in coeffs)
    w_out, h_out = out_wh
    w_in, h_in = in_wh
    a0, a1 = _fix(a), _fix(b)
    a3, a4 = _fix(d), _fix(e)
    a2 = _fix(c + a * 0.5 + b * 0.5)
    a5 = _fix(f + d * 0.5 + e * 0.5)
    # 16.16 values here stay well inside int32 for label-map sizes; int32
    # + in-place ops keep this ~0.2 ms per grid on the 1-core host
    ys = np.arange(h_out, dtype=np.int32)
    xs = np.arange(w_out, dtype=np.int32)
    xi = np.add.outer(a2 + ys * a1, xs * a0)
    yi = np.add.outer(a5 + ys * a4, xs * a3)
    xi >>= 16
    yi >>= 16
    oob = (xi < 0) | (xi >= w_in)
    oob |= yi < 0
    oob |= yi >= h_in
    return (np.clip(xi, 0, w_in - 1, out=xi),
            np.clip(yi, 0, h_in - 1, out=yi), oob)


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


def _is_separable(coeffs: Coeffs) -> bool:
    return coeffs[1] == 0.0 and coeffs[3] == 0.0


class LabelGather:
    """One composed (output pixel -> source flat index) map for the full
    label chain of a record:

      [crop (top, left, ch, cw)] -> resize (r x r, NEAREST) -> [h-flip]
      -> geo_coeffs[0] -> geo_coeffs[1] -> ...

    Every nearest stage produces integer source coords into the previous
    stage's output, so composition is a chain of integer gathers — the same
    values as materializing each intermediate image, without materializing
    any. Call the instance per label array: ``out = lg(arr, fill)``.
    """

    def __init__(self, src_wh: Tuple[int, int],
                 crop: Tuple[int, int, int, int] | None,
                 flip: bool, geo_coeffs: List[Coeffs],
                 label_resolution: int = 224):
        r = label_resolution
        w, h = src_wh
        self._src_hw = (h, w)

        # walk the chain BACKWARDS from the output grid; (xi, yi) index the
        # output of the stage currently being peeled. Stay separable (1-D
        # axis maps) until a shear/rotate forces the 2-D representation.
        sep = True
        xi = yi = oobx = ooby = None          # separable state
        XI = YI = OOB = None                  # full state
        for coeffs in reversed(geo_coeffs):
            if _is_separable(coeffs):
                a, _, c, _, e, f = (float(v) for v in coeffs)
                gx, gox = scale_axis_map(a, c, r, r)
                gy, goy = scale_axis_map(e, f, r, r)
                if sep:
                    if xi is None:
                        xi, yi, oobx, ooby = gx, gy, gox, goy
                    else:
                        oobx = oobx | gox[xi]
                        ooby = ooby | goy[yi]
                        xi, yi = gx[xi], gy[yi]
                else:
                    OOB |= gox[XI] | goy[YI]
                    XI, YI = gx[XI], gy[YI]
            else:
                gxi, gyi, goob = affine_fixed_grid(coeffs, (r, r), (r, r))
                if sep:
                    if xi is None:
                        XI, YI, OOB = gxi, gyi, goob.copy()
                    else:
                        # outer composition of the separable prefix
                        OOB = (ooby[:, None] | oobx[None, :]
                               | goob[yi][:, xi])
                        XI = gxi[yi][:, xi]
                        YI = gyi[yi][:, xi]
                    sep = False
                else:
                    nXI = gxi[YI, XI]
                    nYI = gyi[YI, XI]
                    OOB |= goob[YI, XI]
                    XI, YI = nXI, nYI

        # flip maps its output column x to input column (r-1) - x
        if flip:
            if sep:
                xi = ((r - 1) - xi if xi is not None
                      else np.arange(r - 1, -1, -1, dtype=np.int32))
            else:
                XI = (r - 1) - XI

        if crop is not None:
            top, left, ch, cw = crop
        else:
            top, left = 0, 0
            ch, cw = h, w
        rx, rox = scale_axis_map(cw / r, 0.0, r, cw)
        ry, roy = scale_axis_map(ch / r, 0.0, r, ch)
        assert not (rox.any() or roy.any()), \
            "nearest resize never samples out of bounds"
        # crop is an integer offset: floor(left + v) == left + floor(v)
        if sep:
            sx = rx[xi] + left if xi is not None else rx + left
            sy = ry[yi] + top if yi is not None else ry + top
            flat = sy.astype(np.intp) * w
            flat = flat[:, None] + sx[None, :]
            has_oob = oobx is not None and bool(oobx.any() or ooby.any())
            if has_oob:
                flat = np.where(ooby[:, None] | oobx[None, :],
                                np.intp(h * w), flat)
        else:
            sx = rx[XI] + left
            sy = ry[YI] + top
            flat = sy.astype(np.intp) * w + sx
            has_oob = bool(OOB.any())
            if has_oob:
                flat = np.where(OOB, np.intp(h * w), flat)
        self._flat = flat
        self._has_oob = has_oob

    def __call__(self, arr: np.ndarray, fill: int) -> np.ndarray:
        """Gather one source label array ((h, w) or (h, w, C)) through the
        composed map; `fill` serves every stage's out-of-bounds samples."""
        h, w = self._src_hw
        assert arr.shape[:2] == (h, w), (arr.shape, (h, w))
        flat_src = arr.reshape(h * w, *arr.shape[2:])
        if self._has_oob:
            sentinel = np.full((1,) + flat_src.shape[1:], fill,
                               dtype=arr.dtype)
            flat_src = np.concatenate([flat_src, sentinel])
        return flat_src[self._flat]


