"""Pallas TPU kernel for beam-grouped cross-attention at decode time —
MEASURED AND NOT ADOPTED (kept as the documented experiment).

During cached beam decode every step attends a handful of query rows (the
beams of one sample, Q = num_beams * token_count <= ~16) against the fixed
per-sample encoder keys/values (L ~ 964-1220 tokens) — the dominant HBM
traffic of the decode loop (12 layers re-read the full cross-K/V cache every
step; the reference recomputes them outright, model/modules/roberta.py:358-406).

Measured on the v5e chip, Prismer-BASE b32 beam-3 decode (16 steps, honest
anti-hoisting timing; tools/profile_pipeline.py):

  XLA einsum path (natural K layout)        decode  97 ms
  this kernel, grid (B*H) = 384 programs    decode 191 ms
  this kernel, grid (B,) heads unrolled     decode 177 ms
  XLA einsum path, K stored pre-transposed  (adopted — models/roberta.py
                                             attend_grouped)

The kernel loses because it runs 12 layers x 16 steps = 192 pallas_call
invocations inside the decode while_loop and the per-invocation overhead
dwarfs its VMEM-resident softmax win at these shapes; the real XLA-path cost
was the per-step HBM re-transpose of K, which the (B, H, Dh, L) cache layout
removes for free. A future fused whole-step kernel (13 layers in one
invocation, weights streamed block-wise) is the only Pallas formulation that
could amortize the invocation cost.

Inference-only (the training path uses full-sequence flash attention), so no
custom VJP is defined.

ROUND-2 RETRY (grouped_cross_attention_t): tools/bench_pallas_overhead.py
measured pallas per-invocation overhead as ~ZERO in a lax.scan, refuting
this module's original loss theory — and the original kernel cast operands
to fp32 before every dot (the MXU's ~4x slower fp32 mode, the same bug
fixed in ops/flash_attention.py). The retry kernel takes the cache-native
layouts (kt pre-transposed (B, H, Dh, L), v natural), computes on bf16
operands with fp32 accumulation, and is selectable in the decode loop via
PRISMER_DECODE_CROSS=pallas (models/roberta.py attend_grouped).

RETRY VERDICT (end-to-end b32 A/B, honest timing, 2026-08-17): 126.7 img/s
with the kernel vs 171.0 with the XLA einsum path. The standalone
microbenchmark (tools/bench_grouped_cross.py, 12 layers x 16 steps in a
plain scan, operands passed directly — no while_loop, no loop-carried
slices) pins the cause: the XLA einsum chain streams the 18.2 GB of
cross-KV at 352 GB/s (51.7 ms) while this kernel manages 87 GB/s
(209.1 ms). Granularity probe (samples_per_block=4: 76 GB/s, =8:
75 GB/s, vmem limit raised) KILLED the DMA-granularity hypothesis — the
block size doesn't matter. The arithmetic fingers serialized tiny-matmul
LATENCY instead: the unrolled per-head (8,64)x(64,1024) dots cost
~1.5 us each in issue latency; 12 heads x 2 dots x 32 samples
~ 1.2 ms/layer-call ~ exactly the measured gap. XLA wins because its
einsum lowers to one large BATCHED matmul over (B, H). Not call overhead
(measured ~0), not fusion breakage, not DMA block size.

FUSED WHOLE-STEP KERNEL — round-3 design constraints (sized, not built):
b32 decode is 74.9 ms of the 194.7 ms pipeline (tools/profile_pipeline.py
post flash/top-k fixes); per-step floor = cross-KV 1.14 GB + weights
~0.29 GB -> ~1.9 ms/step vs ~4.7 measured, i.e. up to ~45 ms to win.
Measured budget (2026-08-17 ablation, tools/profile_decode_parts.py):
the 13 decode_attend layer bodies are 72.1 ms of the b32 pipeline
(nolayers share) vs the ~30 ms traffic floor — ~40 ms winnable.
The naive grid (layer, sample) is COMPUTE-bound, not BW-bound: with only
qp=8 query rows every dense matmul runs at ~6% MXU efficiency, putting
the kernel floor ABOVE the XLA path (~5-8 ms/step). A winning kernel
must (a) batch all 96 decode rows through the dense/MLP matmuls (one
grid step per layer, hidden in VMEM scratch), (b) NEVER loop tiny
per-head dots — the granularity probe proved per-head (8,64)x(64,1024)
matmuls are issue-latency-bound (~75-87 GB/s at every DMA block size vs
XLA's batched-einsum 352 GB/s); in-kernel attention must batch heads
into one wide matmul, e.g. q laid out (h*qp, dh) against kt (dh, h*l)
computing all head pairs (12x redundant FLOPs, which are free here) and
masking the block-diagonal in the fp32 score tile before the softmax —
and (c) handle the T<=30 self-attention with lane-masked select updates
(dynamic column update on the minor dim is not supported by Mosaic).
The bar: beat XLA's 352 GB/s effective streaming plus eliminate the
~20 ms of non-traffic layer-body overhead (72.1 ms bodies - ~52 ms
standalone traffic time).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _grouped_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                    valid_len: int, heads: int):
    """One program per SAMPLE; all heads unrolled in-kernel. A per-(sample,
    head) grid (B*H programs) measured 2x SLOWER than the XLA path — the
    per-grid-step pipeline overhead dwarfs the 256 KB of useful K/V DMA.
    Per-sample programs move ~3 MB each, which amortizes it."""
    lp = k_ref.shape[2]
    for h in range(heads):  # static unroll
        q = q_ref[0, h].astype(jnp.float32)              # (Qp, Dh)
        k = k_ref[0, h].astype(jnp.float32)              # (Lp, Dh)
        v = v_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if valid_len < lp:  # static padding mask
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols < valid_len, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def grouped_decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                             interpret: Optional[bool] = None) -> jax.Array:
    """q: (B, H, Q, Dh) with small Q; k/v: (B, H, L, Dh). Exact softmax over
    the full (unmasked) key length. Returns (B, H, Q, Dh) in q.dtype."""
    b, h, nq, dh = q.shape
    l = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    qp = max(8, -(-nq // 8) * 8)
    lp = -(-l // 128) * 128
    if qp != nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, qp - nq), (0, 0)))
    if lp != l:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lp - l), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lp - l), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_grouped_kernel, scale=1.0 / np.sqrt(dh),
                          valid_len=l, heads=h),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, qp, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lp, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lp, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, qp, dh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, qp, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * qp * lp * dh,
            bytes_accessed=(k.size + v.size) * k.dtype.itemsize,
            transcendentals=b * h * qp * lp,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :nq, :]


def _grouped_t_kernel(q_ref, kt_ref, v_ref, o_ref, *, scale: float,
                      valid_len: int, heads: int, samples: int = 1):
    """One program per `samples` samples, heads unrolled; bf16 operands,
    fp32 accum and softmax statistics (the flash-attention precision
    recipe). samples>1 enlarges each program's DMA block (the measured
    per-sample ~3 MB granularity sustains only 87 GB/s)."""
    lp = kt_ref.shape[3]
    for si in range(samples):
        for h in range(heads):
            q = q_ref[si, h]                             # (Qp, Dh) bf16
            kt = kt_ref[si, h]                           # (Dh, Lp) bf16
            v = v_ref[si, h]                             # (Lp, Dh) bf16
            s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if valid_len < lp:
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(cols < valid_len, s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2((s - m) * 1.4426950408889634)   # fp32 stats
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[si, h] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def grouped_cross_attention_t(q: jax.Array, kt: jax.Array, v: jax.Array,
                              interpret: Optional[bool] = None,
                              samples_per_block: int = 1) -> jax.Array:
    """q: (B, H, Q, Dh) with small Q (beams * token_count); kt: (B, H, Dh, L)
    PRE-TRANSPOSED cache layout; v: (B, H, L, Dh). Exact softmax over the
    full key length. Returns (B, H, Q, Dh) in q.dtype.

    samples_per_block > 1 (must divide B) processes several samples per
    grid program — larger DMA blocks per the round-3 granularity
    hypothesis (see module docstring)."""
    b, h, nq, dh = q.shape
    l = kt.shape[3]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    sb = samples_per_block
    assert b % sb == 0, (b, sb)

    qp = max(8, -(-nq // 8) * 8)
    lp = -(-l // 128) * 128
    if qp != nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, qp - nq), (0, 0)))
    if lp != l:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, lp - l)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lp - l), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_grouped_t_kernel, scale=1.0 / np.sqrt(dh),
                          valid_len=l, heads=h, samples=sb),
        grid=(b // sb,),
        # multi-sample blocks exceed the default ~16 MB scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if sb > 1 else None,
        in_specs=[
            pl.BlockSpec((sb, h, qp, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, h, dh, lp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, h, lp, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sb, h, qp, dh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, qp, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * qp * lp * dh,
            bytes_accessed=(kt.size + v.size) * kt.dtype.itemsize,
            transcendentals=b * h * qp * lp,
        ),
        interpret=interpret,
    )(q, kt, v)
    return out[:, :, :nq, :]
