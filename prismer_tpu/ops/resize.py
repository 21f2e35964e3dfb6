"""Static-shape image resize operators.

The conv stems and data path need three exact resize semantics from the
reference (all shapes static, so each is a precomputed separable linear
operator -> two small matmuls, or a gather for nearest):

  * bilinear align_corners=True — torch nn.UpsamplingBilinear2d
    (model/modules/vit.py:89,106)
  * bicubic align_corners=False — torch F.interpolate(mode='bicubic')
    (model/modules/utils.py:40) — see layers._bicubic_matrix
  * nearest — torch F.interpolate(mode='nearest') for instance maps
    (model/modules/vit.py:142) and label resizes (dataset/utils.py:43)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _linear_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) 1-D linear interpolation matrix with align_corners=True."""
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        mat[0, 0] = 1.0
        return mat.astype(np.float32)
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        mat[i, lo] += 1.0 - frac
        mat[i, hi] += frac
    return mat.astype(np.float32)


def bilinear_resize_align_corners(x: jax.Array, out_h: int, out_w: int,
                                  precision: str = "highest") -> jax.Array:
    """NHWC bilinear resize with align_corners=True (torch UpsamplingBilinear2d).

    precision='highest' gives bit-level torch parity (used for one-time
    operators); hot paths (conv stems over 64-channel label maps) pass
    precision=None to stay on the fast MXU path in the compute dtype."""
    _, h, w, _ = x.shape
    if (h, w) == (out_h, out_w):
        return x
    wh = jnp.asarray(_linear_matrix_align_corners(h, out_h))
    ww = jnp.asarray(_linear_matrix_align_corners(w, out_w))
    if precision == "highest":
        y = jnp.einsum("oh,bhwc->bowc", wh, x.astype(jnp.float32),
                       precision="highest")
        y = jnp.einsum("ow,bhwc->bhoc", ww, y, precision="highest")
        return y.astype(x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh.astype(x.dtype), x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("ow,bhwc->bhoc", ww.astype(x.dtype), y.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') index rule: floor(i * in / out)."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def nearest_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """NHWC nearest-neighbor resize (exact torch 'nearest' semantics)."""
    _, h, w, _ = x.shape
    if (h, w) == (out_h, out_w):
        return x
    hi = jnp.asarray(_nearest_indices(h, out_h))
    wi = jnp.asarray(_nearest_indices(w, out_w))
    return x[:, hi][:, :, wi]
