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

Two formulations exist, settled BY MEASUREMENT (SURVEY.md hard-part #3;
tools/bench_deform_attn.py on the real chip, Mask2Former shapes — 3 levels
60/30/15 at 480px, Lq=S=4725, 8 heads, dim 32, 4 points):

    batch 1:  XLA gather 13.38 ms/call   Pallas one-hot  8.37 ms  (1.60x)
    batch 4:  XLA gather 53.00 ms/call   Pallas one-hot 23.35 ms  (2.27x)

The Pallas one-hot-matmul kernel (deform_attn_pallas.py) builds the sparse
sampling matrix blockwise on the VPU and feeds the MXU — "wasted" dense
FLOPs, but coalesced and compute-shaped, while XLA's gather of ~1.8M random
rows is latency-bound. `ms_deform_attn_auto` therefore dispatches to the
Pallas kernel on TPU; this XLA-gather formulation remains the CPU/test path
and the differentiable path (parity + grad tests vs the torch grid_sample
spec in tests/test_deform_attn.py; the experts run frozen, so the forward
is all the pipeline needs).
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


def ms_deform_attn_auto(value: jax.Array,
                        spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations: jax.Array,
                        attention_weights: jax.Array) -> jax.Array:
    """Measured dispatch (see module docstring): Pallas one-hot kernel on
    TPU (1.6-2.3x faster at Mask2Former shapes), XLA gather elsewhere."""
    if jax.default_backend() == "tpu":
        from prismer_tpu.experts.ops.deform_attn_pallas import \
            ms_deform_attn_onehot
        return ms_deform_attn_onehot(value, spatial_shapes,
                                     sampling_locations, attention_weights)
    return ms_deform_attn(value, spatial_shapes, sampling_locations,
                          attention_weights)
