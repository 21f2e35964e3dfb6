"""Pallas one-hot-matmul formulation of multi-scale deformable attention.

The alternative to the XLA-gather formulation in deform_attn.py (reference
CUDA kernel: ops/src/ms_deform_im2col_cuda.cuh:38-61; numerical spec:
ops/functions/ms_deform_attn_func.py:52-72). TPUs have no vectorized
dynamic gather inside kernels, but they have an enormous MXU — so instead
of gathering 4 corners per (query, head, level, point), this kernel
materializes the *sparse sampling matrix* blockwise and turns the whole op
into dense matmuls:

    out[q, :] = sum_c  W[q, c] * value[c, :]          (per batch*head, level)

where W (Lq x H_l*W_l) holds the bilinear-corner weights x attention
weights (at most P*4 = 16 nonzeros per row). W is never materialized in
HBM: each (QT x CT) tile is built on the VPU from the prefetched corner
indices/weights (16 compare+select ops per element) and immediately
consumed by the MXU against a (CT x D) value tile.

Arithmetic: Lq*HW*(16 VPU select + 2*D MXU flops) per batch*head*level —
"wasted" work by CUDA standards, but it runs at MXU/VPU rate with fully
coalesced memory traffic, while an XLA gather of 1.8M random 128-byte rows
is latency/scatter-bound. bench (tools/bench_deform_attn.py) decides which
formulation the pixel decoder uses; numbers recorded in deform_attn.py.

Forward-only: the Prismer pipeline runs Mask2Former frozen, inference-only
(experts are offline label generators). Training parity of the op's
gradient is covered by the XLA formulation (tests/test_deform_attn.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P4 = 16  # points (4) x bilinear corners (4)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _onehot_matmul_kernel(idx_ref, w_ref, val_ref, out_ref, *, qt, ct, p4):
    """One (batch*head, q-tile, c-tile) step: build the W tile, matmul."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    c0 = pl.program_id(2) * ct
    idx = idx_ref[0]                      # (QT, P4) int32 flat cell ids
    wts = w_ref[0]                        # (QT, P4) float32
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (qt, ct), 1)

    acc = jnp.zeros((qt, ct), jnp.float32)
    for j in range(p4):
        rel = idx[:, j][:, None] - c0                      # (QT, 1)
        acc += jnp.where(rel == iota_c, wts[:, j][:, None], 0.0)

    out_ref[0] += jnp.dot(acc, val_ref[0].astype(jnp.float32),
                          preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def _level_corners(args, shape):
    """Elementwise corner-index/weight prep for one level (pure XLA).

    args: (loc_x, loc_y, attn) each (BH, Lq, P) for this level.
    Returns idx (BH, Lq, P*4) int32, w (BH, Lq, P*4) float32."""
    hl, wl = shape
    loc_x, loc_y, attn = args
    x = loc_x * wl - 0.5
    y = loc_y * hl - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    idxs, wts = [], []
    for cx, cy, cw in ((x0, y0, (1 - dx) * (1 - dy)),
                       (x0 + 1, y0, dx * (1 - dy)),
                       (x0, y0 + 1, (1 - dx) * dy),
                       (x0 + 1, y0 + 1, dx * dy)):
        inb = (cx >= 0) & (cx < wl) & (cy >= 0) & (cy < hl)
        xi = jnp.clip(cx, 0, wl - 1).astype(jnp.int32)
        yi = jnp.clip(cy, 0, hl - 1).astype(jnp.int32)
        idxs.append(yi * wl + xi)
        wts.append(jnp.where(inb, cw * attn, 0.0))
    idx = jnp.stack(idxs, axis=-1)        # (BH, Lq, P, 4)
    w = jnp.stack(wts, axis=-1)
    bh, lq = idx.shape[:2]
    return (idx.reshape(bh, lq, -1),
            w.reshape(bh, lq, -1).astype(jnp.float32))


def ms_deform_attn_onehot(value: jax.Array,
                          spatial_shapes: Sequence[Tuple[int, int]],
                          sampling_locations: jax.Array,
                          attention_weights: jax.Array,
                          *, q_tile: int = 256, c_tile: int = 512,
                          interpret: bool = False) -> jax.Array:
    """Same contract as deform_attn.ms_deform_attn (value (N,S,H,D), locs
    (N,Lq,H,L,P,2) in [0,1], weights (N,Lq,H,L,P) -> (N,Lq,H*D))."""
    n, s, h, d = value.shape
    _, lq, _, nl, p, _ = sampling_locations.shape
    assert p * 4 == P4 and nl == len(spatial_shapes)
    bh = n * h
    qt = q_tile
    lqp = _round_up(lq, qt)

    # (N, Lq, H, ...) -> (BH, Lq, ...)
    loc = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        bh, lq, nl, p, 2)
    attn = attention_weights.transpose(0, 2, 1, 3, 4).reshape(bh, lq, nl, p)

    out = jnp.zeros((bh, lqp, d), jnp.float32)
    start = 0
    for lid, (hl, wl) in enumerate(spatial_shapes):
        hw = hl * wl
        ct = min(c_tile, _round_up(hw, 128))
        hwp = _round_up(hw, ct)
        val = value[:, start:start + hw]                 # (N, HW, H, D)
        start += hw
        val = val.transpose(0, 2, 1, 3).reshape(bh, hw, d)
        val = jnp.pad(val, ((0, 0), (0, hwp - hw), (0, 0)))

        idx, w = _level_corners(
            (loc[:, :, lid, :, 0], loc[:, :, lid, :, 1], attn[:, :, lid]),
            (hl, wl))
        idx = jnp.pad(idx, ((0, 0), (0, lqp - lq), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, lqp - lq), (0, 0)))

        grid = (bh, lqp // qt, hwp // ct)
        level_out = pl.pallas_call(
            functools.partial(_onehot_matmul_kernel, qt=qt, ct=ct, p4=P4),
            out_shape=jax.ShapeDtypeStruct((bh, lqp, d), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, qt, P4), lambda b, q, c: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qt, P4), lambda b, q, c: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct, d), lambda b, q, c: (b, c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, qt, d), lambda b, q, c: (b, q, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(idx, w, val)
        out = out + level_out

    out = out[:, :lq].reshape(n, h, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(n, lq, h * d).astype(value.dtype)
