"""Multi-scale deformable attention (TPU-native).

The reference ships a CUDA extension for this op (Mask2Former pixel decoder;
experts/segmentation/mask2former/modeling/pixel_decoder/ops/src/*.cu, with a
torch `grid_sample` reference at ops/functions/ms_deform_attn_func.py:52-72
and a parity/grad test at ops/test.py). This is the TPU formulation: the
per-query bilinear sampling is expressed as four batched XLA gathers +
weighted sums, fully differentiable, static shapes, no (L, L) tensors.

Semantics (matching the reference spec exactly):
  value               (N, S, H, D)  S = sum_l H_l*W_l
  spatial_shapes      static list of (H_l, W_l)
  sampling_locations  (N, Lq, H, L, P, 2) in [0, 1] (x, y order)
  attention_weights   (N, Lq, H, L, P)
  -> output           (N, Lq, H*D)

Bilinear sampling follows torch grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False): src = loc * size - 0.5, out-of-
bounds corners contribute zero.

Why XLA gathers and not a Pallas kernel: the op is a data-dependent gather
with ~zero arithmetic intensity (4 corner reads + 7 FLOPs per sample).
Mosaic/TPU has no vectorized dynamic gather inside kernels, so a Pallas
version must either loop scalar DMAs (latency-bound, far slower) or express
the gather as one-hot matmuls (a (BQ*P*4, H_l*W_l) one-hot per level —
hundreds of GFLOPs of wasted MXU work and >VMEM one-hot tiles). XLA's
native gather lowering is the memory-bound optimum on this hardware; this
formulation keeps everything fused in one jit program. (SURVEY.md hard-part
#3 anticipated exactly this trade-off.)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample_zero_pad(value_l: jax.Array, x: jax.Array, y: jax.Array
                              ) -> jax.Array:
    """value_l: (B, H, W, D); x/y: (B, Q) continuous pixel coords (already in
    grid_sample's align_corners=False frame). Returns (B, Q, D)."""
    h, w = value_l.shape[1], value_l.shape[2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    def gather(xi, yi):
        inb = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = value_l.reshape(value_l.shape[0], h * w, -1)
        idx = yc * w + xc
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out * inb[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def ms_deform_attn(value: jax.Array,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jax.Array,
                   attention_weights: jax.Array) -> jax.Array:
    """See module docstring. spatial_shapes must be static python ints."""
    n, s, h, d = value.shape
    _, lq, _, nl, p, _ = sampling_locations.shape
    assert nl == len(spatial_shapes)
    assert s == sum(hl * wl for hl, wl in spatial_shapes)

    outputs = []
    start = 0
    for lid, (hl, wl) in enumerate(spatial_shapes):
        val = value[:, start:start + hl * wl]          # (N, HW, H, D)
        start += hl * wl
        # (N, HW, H, D) -> (N*H, hl, wl, D)
        val = val.transpose(0, 2, 1, 3).reshape(n * h, hl, wl, d)

        loc = sampling_locations[:, :, :, lid]          # (N, Lq, H, P, 2)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(n * h, lq * p, 2)
        # grid_sample align_corners=False pixel frame
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        sampled = _bilinear_sample_zero_pad(val, x, y)   # (N*H, Lq*P, D)
        sampled = sampled.reshape(n, h, lq, p, d)
        outputs.append(sampled)

    stacked = jnp.stack(outputs, axis=3)                 # (N, H, Lq, L, P, D)
    weights = attention_weights.transpose(0, 2, 1, 3, 4)  # (N, H, Lq, L, P)
    out = jnp.einsum("nhqlpd,nhqlp->nqhd", stacked, weights)
    return out.reshape(n, lq, h * d)
