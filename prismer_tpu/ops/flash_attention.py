"""Pallas TPU flash attention (fused, online-softmax, fp32 accumulators).

The hot op of the whole model: encoder self-attention over ~964 tokens x
12-32 layers (vit.py:52-59), perceiver cross-attention over ~1240 expert
tokens (resampler.py:30-34), and decoder self/cross attention
(roberta.py:95-126). XLA's unfused path materializes (B, H, L, L) score
tensors in HBM; this kernel keeps them in VMEM with the standard
flash-attention recurrence:

  per q-block, loop over k-blocks:
    s = q @ k^T * scale (+ mask)
    m' = max(m, rowmax(s));  p = exp(s - m')
    l  = l * exp(m - m') + rowsum(p)
    acc = acc * exp(m - m') + p @ v

Numerics match the model contract: softmax statistics and accumulation in
fp32 regardless of input dtype (the fp32-softmax island of
roberta.py:118-121), output cast back to the input dtype.

Differentiable via custom_vjp with PALLAS kernels on both sides: the
forward saves the per-row logsumexp; the backward is the standard two-kernel
flash recurrence (Dao et al.) — a dq kernel (grid over q-blocks, loop over
k-blocks) and a dk/dv kernel (grid over k-blocks, loop over q-blocks), both
recomputing p = exp(s - lse) in VMEM from the saved statistics. Input
gradients flow through attention in EVERY freeze mode (adaptors/stems sit
below frozen attention), so the backward is on the training hot path — the
round-1 XLA-recompute backward materialized (B, H, L, L) score tensors in
HBM per layer per step; this one never does.

Masking supports key-padding masks and causal masking without ever
materializing (L, L) bias tensors in HBM.

TPU precision note: matmuls run on NATIVE-dtype operands (bf16 in the bf16
model) with fp32 accumulation and fp32 softmax statistics — the standard
flash-attention recipe, and the same multiply precision as the reference's
fp16 AMP path. (An earlier revision cast operands to fp32 before every dot;
that forced the MXU into its ~4x slower fp32 mode and made encoder attention
compute-bound at 2.83 ms/layer — 45 ms of the b32 encode. With fp32 INPUTS
the dots still run in full fp32.)
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  key_mask: Optional[jax.Array] = None,
                  causal: bool = False) -> jax.Array:
    """XLA reference: q,k,v (B,H,L,D); key_mask (B,Lk) 1=valid."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :].astype(bool), s, NEG_INF)
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        mask = jnp.tril(jnp.ones((lq, lk), bool), k=lk - lq)
        s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


_LOG2E = 1.4426950408889634


def _exp(x):
    """exp via exp2 — the VPU's native exponent base. The softmax is the
    kernel's bottleneck (L^2 transcendentals per head vs L*D^2/head matmul
    FLOPs at Dh=64), so the exponent's op count matters."""
    return jnp.exp2(x * _LOG2E)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                  *, scale: float, block_k: int, causal: bool,
                  valid_lk: int = 0):
    """One (batch*head, q-block) program. k/v live fully in VMEM.

    Matmuls run on NATIVE-dtype operands (bf16 in the bf16 model) with fp32
    accumulation; softmax statistics stay fp32 (the model's fp32 softmax
    island, roberta.py:118-121) — bf16 multiplies match the reference's
    fp16-AMP matmul precision.

    mask_ref may be None (mask-free fast path, non-causal only): no mask
    tensor is loaded or applied; the final PARTIAL k-block, if any, is
    handled outside the main loop with a static iota mask over the k-padding
    (valid_lk = true key length). The where-pass over the (BQ, BK) scores is
    pure VPU work on the kernel's critical path, and the encoder's
    self-attention has no padding to mask."""
    lk = k_ref.shape[1]
    n_kb = lk // block_k

    qi = pl.program_id(1)

    # the leading block dim groups `gh` (batch*head) rows per program —
    # amortizes per-grid-step overhead (swept, _block_sizes docstring)
    for g in range(q_ref.shape[0]):
        q = q_ref[g]                           # (BQ, D) native dtype
        bq = q.shape[0]
        q_start = qi * bq

        def make_body(masked: bool, static_tail: bool, g=g, q=q,
                      q_start=q_start, bq=bq):
            def body(kb, carry):
                acc, m, l = carry  # acc (BQ, D); m/l (BQ, 1) — 2D layout
                ks = kb * block_k
                kblk = k_ref[g, pl.ds(ks, block_k), :]
                vblk = v_ref[g, pl.ds(ks, block_k), :]
                s = jax.lax.dot_general(
                    q, kblk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale

                if masked:
                    kmask = mask_ref[g, :, pl.ds(ks, block_k)] > 0  # (1, BK)
                    s = jnp.where(kmask, s, NEG_INF)
                if static_tail:
                    cols = ks + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, block_k), 1)
                    s = jnp.where(cols < valid_lk, s, NEG_INF)
                if causal:
                    rows = q_start + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, block_k), 0)
                    cols = ks + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, block_k), 1)
                    s = jnp.where(cols <= rows, s, NEG_INF)

                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                alpha = _exp(m - m_new)
                p = _exp(s - m_new)                       # fp32 stats
                l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
                acc_new = acc * alpha + jax.lax.dot_general(
                    p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc_new, m_new, l_new
            return body

        acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)

        if mask_ref is None:
            n_full = valid_lk // block_k
            carry = jax.lax.fori_loop(0, n_full, make_body(False, False),
                                      (acc0, m0, l0))
            if valid_lk % block_k:
                carry = make_body(False, True)(n_full, carry)
            acc, m, l = carry
        elif causal:
            last = jnp.minimum(n_kb, pl.cdiv(q_start + bq, block_k))
            acc, m, l = jax.lax.fori_loop(0, last, make_body(True, False),
                                          (acc0, m0, l0))
        else:
            acc, m, l = jax.lax.fori_loop(0, n_kb, make_body(True, False),
                                          (acc0, m0, l0))

        o_ref[g] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse = m + jnp.log(jnp.maximum(l, 1e-30))          # (BQ, 1)
        lse_ref[g] = jnp.broadcast_to(lse, (bq, 8))


def _block_sizes(lq: int, lk: int, block_q: Optional[int] = None,
                 block_k: Optional[int] = None):
    """Block policy, swept on the v5e at the encoder's hot shape
    (32x12x964x64 bf16, tools/bench_flash_attn.py --blocks):

        bq x bk   968x1024  512x512  256x512  512x1024  256x256
        ms/call       3.77     4.16     4.61      6.28     6.20

    Whole-Q x whole-K wins decisively: one program per (batch, head), K/V
    read exactly once, and a SINGLE k-iteration needs no online-softmax
    rescale (no alpha pass over the accumulator). (An earlier revision
    accidentally ran 256x256 — callers passed their own 256 defaults over
    this function's — costing 2.4 ms/layer x 12 encoder layers.)

    When K does not fit one block (lk_p > 1024), pick the k-block from
    {512, 256, 128} minimizing padding (larger wins ties): the resampler's
    ~1240-token keys pad to 1280 with bk=256 (3%) vs 1536 with bk=512 (24%).
    """
    bq = min(block_q or 1024, max(8, -(-lq // 8) * 8))
    lk_p = max(128, -(-lk // 128) * 128)
    if block_k is not None:
        bk = min(block_k, lk_p)
    elif lk_p <= 1024:
        bk = lk_p
    else:
        bk = min((b for b in (512, 256, 128)),
                 key=lambda b: ((-lk % b), -b))
    return bq, bk


def _bwd_block_sizes(lq: int, lk: int, block_q: Optional[int] = None,
                     block_k: Optional[int] = None):
    """Backward-specific block policy, swept on the v5e at the encoder's
    hot train shape (16x12x964x64 bf16, tools/bench_flash_bwd.py,
    fwd+bwd ms/step, 2026-08-19 session):

        bq x bk   968x1024  1024x1024  1024x512  512x512  256x1024  XLA
        ms/step      7.989      6.205     4.726    6.392     4.882  13.197

    Two findings diverge from the forward policy (whole-Q x whole-K):
      1. A 968-row q block (8-aligned but not MXU-tile-aligned) loses 22%
         to padding q up to the full 1024 tile, despite 6% wasted rows —
         the dkv kernel's dot_generals want tile-aligned contraction dims.
      2. bk=512 beats whole-K 1024: the dq kernel re-reads K/V per q-block
         anyway, and halving the k block halves the (BQ, BK) score/ds
         intermediates that the backward materializes twice (p and ds),
         relieving VMEM pressure on the critical path.

    Policy: round big q up to the 1024 tile (lq > 512); split k in half
    when the 128-padded K length is a multiple of 512 above 512. Shapes
    outside the measured regime fall back to the forward policy."""
    if block_q is None:
        bq8 = max(8, -(-lq // 8) * 8)
        block_q = 1024 if 512 < bq8 else None
    if block_k is None:
        lk_p = max(128, -(-lk // 128) * 128)
        if lk_p > 512 and lk_p % 512 == 0:
            block_k = 512
    return _block_sizes(lq, lk, block_q, block_k)


def _pad_inputs(q, k, v, key_mask, block_q, block_k):
    """Pad seq lengths to block multiples; flatten (B,H) -> BH."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    pq = -lq % block_q
    pk = -lk % block_k
    if key_mask is None:
        key_mask = jnp.ones((b, lk), jnp.int32)
    key_mask = key_mask.astype(jnp.int32)
    if pq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pk)))
    lq_p, lk_p = lq + pq, lk + pk
    qf = q.reshape(b * h, lq_p, d)
    kf = k.reshape(b * h, lk_p, d)
    vf = v.reshape(b * h, lk_p, d)
    # (B*H, 1, LK): TPU block shapes constrain the last two dims, so give the
    # mask a unit row dim that the block can match exactly
    maskf = jnp.repeat(key_mask, h, axis=0)[:, None, :]
    return qf, kf, vf, maskf, lq_p, lk_p


def _maskfree_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref, **kw)


def _flash_forward(q, k, v, key_mask, causal,
                   block_q: Optional[int] = None,
                   block_k: Optional[int] = None,
                   bh_block: Optional[int] = None,
                   interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q, block_k = _block_sizes(lq, lk, block_q, block_k)
    mask_free = key_mask is None and not causal
    qf, kf, vf, maskf, lq_p, lk_p = _pad_inputs(q, k, v, key_mask,
                                                block_q, block_k)

    if bh_block is None:
        import os
        # two (batch, head) rows per program: 3.856 -> 3.704 ms/call at the
        # encoder's 32x12x964x64 shape (swept 1/2/4/8 via
        # tools/bench_flash_attn.py --bh; >=4 fails to compile), and
        # end-to-end encode 104.91 -> 104.08 ms/iter at b32
        # (tools/profile_pipeline.py --stages encode A/B). Grid-step
        # overhead amortization; block VMEM stays ~1 MB.
        bh_block = int(os.environ.get("PRISMER_FLASH_BH", "2"))
    gh = bh_block if (b * h) % bh_block == 0 else 1

    grid = ((b * h) // gh, lq_p // block_q)
    if mask_free:
        kernel = functools.partial(
            _maskfree_kernel, scale=1.0 / np.sqrt(d), block_k=block_k,
            causal=False, valid_lk=lk)
        inputs = (qf, kf, vf)
    else:
        kernel = functools.partial(
            _flash_kernel, scale=1.0 / np.sqrt(d), block_k=block_k,
            causal=causal)
        inputs = (qf, kf, vf, maskf)

    in_specs = [
        pl.BlockSpec((gh, block_q, d), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gh, lk_p, d), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gh, lk_p, d), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not mask_free:
        in_specs.append(
            pl.BlockSpec((gh, 1, lk_p), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM))

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((gh, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, block_q, 8), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lq_p, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
        interpret=interpret,
    )(*inputs)

    out = out.reshape(b, h, lq_p, d)[:, :, :lq, :]
    return out, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, *, scale: float, block_k: int,
                   causal: bool):
    q = q_ref[0]                               # (BQ, D) native dtype
    do = do_ref[0]
    lk = k_ref.shape[1]
    bq = q.shape[0]
    n_kb = lk // block_k
    q_start = pl.program_id(1) * bq
    lse = lse_ref[0][:, 0:1]                   # (BQ, 1) from the 8-lane tile
    delta = delta_ref[0][:, 0:1]

    def body(kb, dq):
        ks = kb * block_k
        kblk = k_ref[0, pl.ds(ks, block_k), :]
        vblk = v_ref[0, pl.ds(ks, block_k), :]
        s = jax.lax.dot_general(q, kblk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        kmask = mask_ref[0, :, pl.ds(ks, block_k)] > 0
        s = jnp.where(kmask, s, NEG_INF)
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            cols = ks + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(cols <= rows, s, NEG_INF)
        p = _exp(s - lse)                                  # (BQ, BK) fp32
        dp = jax.lax.dot_general(do, vblk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(kblk.dtype), kblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    last = (jnp.minimum(n_kb, pl.cdiv(q_start + bq, block_k))
            if causal else n_kb)
    dq = jax.lax.fori_loop(0, last, body, dq0)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, *, scale: float,
                    block_q: int, causal: bool):
    kblk = k_ref[0]                            # (BK, D) native dtype
    vblk = v_ref[0]
    kmask = mask_ref[0]                        # (1, BK)
    lq = q_ref.shape[1]
    bk = kblk.shape[0]
    n_qb = lq // block_q
    ks = pl.program_id(1) * bk

    def body(qb, carry):
        dk, dv = carry
        qs = qb * block_q
        q = q_ref[0, pl.ds(qs, block_q), :]
        do = do_ref[0, pl.ds(qs, block_q), :]
        lse = lse_ref[0, pl.ds(qs, block_q), :][:, 0:1]
        delta = delta_ref[0, pl.ds(qs, block_q), :][:, 0:1]
        s = jax.lax.dot_general(q, kblk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(kmask > 0, s, NEG_INF)
        if causal:
            rows = qs + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), 0)
            cols = ks + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), 1)
            s = jnp.where(cols <= rows, s, NEG_INF)
        p = _exp(s - lse)                                  # (BQ, BK) fp32
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (BK, D)
        dp = jax.lax.dot_general(do, vblk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        return dk, dv

    z = jnp.zeros((bk, kblk.shape[1]), jnp.float32)
    first = (jnp.maximum(ks // block_q, 0) if causal else 0)
    dk, dv = jax.lax.fori_loop(first if causal else 0, n_qb, body, (z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, key_mask, causal, lse, o, do,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # backward-specific block overrides for sweeps (trace-time env, same
    # convention as PRISMER_FLASH_BH; tools/bench_flash_bwd.py); the
    # swept default policy lives in _bwd_block_sizes
    if block_q is None and os.environ.get("PRISMER_FLASH_BWD_BQ"):
        block_q = int(os.environ["PRISMER_FLASH_BWD_BQ"])
    if block_k is None and os.environ.get("PRISMER_FLASH_BWD_BK"):
        block_k = int(os.environ["PRISMER_FLASH_BWD_BK"])
    block_q, block_k = _bwd_block_sizes(lq, lk, block_q, block_k)
    qf, kf, vf, maskf, lq_p, lk_p = _pad_inputs(q, k, v, key_mask,
                                                block_q, block_k)
    dof = jnp.pad(do, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0))
                  ).reshape(b * h, lq_p, d)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_p - lq))
                    ).reshape(b * h, lq_p)
    delta = jnp.broadcast_to(delta[..., None], (b * h, lq_p, 8))
    # lse comes padded to the FORWARD's q-block multiple; re-fit when a
    # backward override picks a different block_q (pad rows carry do=0 and
    # delta=0, so their lse value is inert in both kernels)
    if lse.shape[1] > lq_p:
        lse = lse[:, :lq_p]
    elif lse.shape[1] < lq_p:
        lse = jnp.pad(lse, ((0, 0), (0, lq_p - lse.shape[1]), (0, 0)))

    scale = 1.0 / np.sqrt(d)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k,
                          causal=causal),
        grid=(b * h, lq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk_p), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 8), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 8), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q,
                          causal=causal),
        grid=(b * h, lk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, lq_p, d), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, ki: (bh, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq_p, d), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq_p, 8), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq_p, 8), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, lk_p, d), v.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, maskf, dof, lse, delta)

    dq = dq.reshape(b, h, lq_p, d)[:, :, :lq, :]
    dk = dk.reshape(b, h, lk_p, d)[:, :, :lk, :]
    dv = dv.reshape(b, h, lk_p, d)[:, :, :lk, :]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, key_mask=None, causal: bool = False):
    """Fused attention; q,k,v (B,H,L,D), key_mask (B,Lk) 1=valid."""
    return _flash_forward(q, k, v, key_mask, causal)[0]


def _fwd(q, k, v, key_mask, causal):
    o, lse = _flash_forward(q, k, v, key_mask, causal)
    return o, (q, k, v, key_mask, o, lse)


def _bwd(causal, res, g):
    q, k, v, key_mask, o, lse = res
    dq, dk, dv = _flash_backward(q, k, v, key_mask, causal, lse, o, g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# packed-layout (head-on-lanes) forward — the encoder/resampler hot path
# ---------------------------------------------------------------------------
#
# The (B, H, L, Dh) API above forces the caller to head-split the QKV
# projection outputs: on TPU, XLA materializes each (B, L, H*Dh) ->
# (B, H, L, Dh) transpose as a layout copy + normalization copy, and the
# wrapper then pads L to block multiples — at the b32 encoder shape that is
# ~7 GB of HBM writes per encode (measured: tools/trace_breakdown.py
# attributes ~18 ms of `copy` + ~10 ms of `pad` to the 104 ms encode;
# tools/dump_encode_hlo.py lists the instructions).
#
# This variant consumes the projections' NATIVE layout (B, L, H*Dh)
# directly. Head h lives on lanes [h*Dh, (h+1)*Dh). Blocks slice lanes in
# groups of G = lcm(Dh, 128)/Dh heads so every block boundary is
# 128-aligned (G=2 at Dh=64, G=4 at Dh=96); the per-head 64/96-offset
# splits happen on VMEM-resident vectors inside the kernel. L dims are
# NEVER padded: the whole-Q x whole-K blocks are declared equal to the
# array dims (Mosaic's exception to the (8,128)-divisibility rule) and
# reductions run on logical shapes. Mask-free non-causal only — exactly
# the encoder self-attention (vit.py) and resampler cross-attention
# (resampler.py) shapes; everything else falls back to the transposing
# path via `packed_attention`.


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                   dh: int, scale: float, slice_mode: str = "select"):
    """One (batch, lane-group) program; whole Q, whole K in VMEM.

    q_ref (1, LQ, G*dh), k_ref/v_ref (1, LK, G*dh), o_ref like q_ref,
    lse_ref (1, LQ, G*8). Single k-iteration (whole-K): no online-softmax
    rescale, like the swept whole-K policy of `_flash_kernel`.

    slice_mode picks how a head's dh lanes are split out of the G*dh-lane
    block: 'ds' = strided VMEM lane slice (offset-carrying vectors force
    Mosaic relayouts at non-128 offsets); 'select' = one-hot selector
    matmul (exact copy on the MXU, offset-0 result)."""
    g_heads = q_ref.shape[-1] // dh
    lanes = q_ref.shape[-1]

    def head_slice(ref, g):
        if slice_mode == "ds" or g * dh % 128 == 0:
            return ref[0, :, pl.ds(g * dh, dh)]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (lanes, dh), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (lanes, dh), 1)
               + g * dh).astype(ref.dtype)
        return jax.lax.dot_general(
            ref[0], sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(ref.dtype)

    outs, lses = [], []
    for g in range(g_heads):
        q = head_slice(q_ref, g)                    # (LQ, dh) native dtype
        k = head_slice(k_ref, g)                    # (LK, dh)
        v = head_slice(v_ref, g)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (LQ, LK) fp32
        m = jnp.max(s, axis=1, keepdims=True)
        p = _exp(s - m)                                   # fp32 stats
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
        lse = m + jnp.log(jnp.maximum(l, 1e-30))          # (LQ, 1)
        lses.append(jnp.broadcast_to(lse, (lse.shape[0], 8)))
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0] = jnp.concatenate(lses, axis=-1)


def _head_group(dh: int) -> int:
    g = 1
    while (g * dh) % 128:
        g += 1
    return g


def packed_eligible(num_heads: int, lq: int, lk: int, width: int) -> bool:
    """Mask-free shapes the packed kernel handles: 128-alignable head
    groups and whole-K VMEM residency (k + v + fp32 scores per program)."""
    if width % num_heads:
        return False
    dh = width // num_heads
    g = _head_group(dh)
    if num_heads % g:
        return False
    vmem = (lq + 2 * lk) * g * dh * 2 + lq * lk * 6  # q/k/v bf16 + s/p
    return vmem < 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_packed(q, k, v, num_heads: int):
    """Mask-free attention on packed (B, L, H*Dh) operands (no head
    transposes, no length padding). Use `packed_attention` for the
    eligibility-checked entry point."""
    return _packed_forward(q, k, v, num_heads)[0]


def _packed_forward(q, k, v, num_heads: int,
                    interpret: Optional[bool] = None,
                    slice_mode: Optional[str] = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if slice_mode is None:
        import os
        # 'ds' measured 5.19 vs 'select' 5.55 ms/call at the encoder shape
        # (tools/bench_packed_flash.py): the offset-carrying relayout is
        # cheaper than the selector matmuls here
        slice_mode = os.environ.get("PRISMER_PACKED_SLICE", "ds")
    b, lq, width = q.shape
    lk = k.shape[1]
    dh = width // num_heads
    assert dh * num_heads == width
    g = _head_group(dh)
    assert num_heads % g == 0, (
        f"num_heads={num_heads} not divisible by lane group {g} (dh={dh}); "
        "gate calls with packed_eligible / use packed_attention")
    n_groups = num_heads // g
    lanes = g * dh

    kernel = functools.partial(_packed_kernel, dh=dh,
                               scale=1.0 / np.sqrt(dh),
                               slice_mode=slice_mode)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * n_groups,),
        in_specs=[
            pl.BlockSpec((1, lq, lanes),
                         lambda i: (i // n_groups, 0, i % n_groups),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, lanes),
                         lambda i: (i // n_groups, 0, i % n_groups),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, lanes),
                         lambda i: (i // n_groups, 0, i % n_groups),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, lq, lanes),
                         lambda i: (i // n_groups, 0, i % n_groups),
                         memory_space=pltpu.VMEM),
            # lse gets its own leading (batch, group) axis: a lane block
            # must be 128-divisible OR equal the array's lane dim, and
            # G*8 (16 at Dh=64) only satisfies the latter
            pl.BlockSpec((1, lq, g * 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, width), q.dtype),
            jax.ShapeDtypeStruct((b * n_groups, lq, g * 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * lq * lk * dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * num_heads * lq * lk,
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _packed_fwd(q, k, v, num_heads):
    o, lse = _packed_forward(q, k, v, num_heads)
    return o, (q, k, v, o, lse)


def _packed_bwd(num_heads, res, g):
    """Train-path backward: transpose to (B, H, L, Dh) and reuse the
    Pallas backward kernels. The transposes this reintroduces run only
    under jax.grad — the serving forward never pays them."""
    q, k, v, o, lse = res
    b, lq, width = q.shape
    dh = width // num_heads

    def split(t):
        bl = t.shape[1]
        return t.reshape(b, bl, num_heads, dh).transpose(0, 2, 1, 3)

    q4, k4, v4, o4, g4 = split(q), split(k), split(v), split(o), split(g)
    block_q, _ = _block_sizes(lq, k.shape[1])
    lq_p = lq + (-lq % block_q)
    # (B*NG, LQ, G*8) -> (B*H, lq_p, 8), padded rows zero (their do/q are
    # zero in the backward kernels, so any finite lse is inert)
    grp = _head_group(dh)
    lse4 = lse.reshape(b, num_heads // grp, lq, grp, 8)
    lse4 = lse4.transpose(0, 1, 3, 2, 4).reshape(b, num_heads, lq, 8)
    lse4 = jnp.pad(lse4, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    lse4 = lse4.reshape(b * num_heads, lq_p, 8)
    dq4, dk4, dv4 = _flash_backward(q4, k4, v4, None, False, lse4, o4, g4)

    def merge(t):
        return t.transpose(0, 2, 1, 3).reshape(b, t.shape[2], width)

    return merge(dq4), merge(dk4), merge(dv4)


flash_attention_packed.defvjp(_packed_fwd, _packed_bwd)


def packed_attention(q, k, v, num_heads: int, key_mask=None,
                     causal: bool = False):
    """Attention on packed (B, L, H*Dh) operands. Routes mask-free shapes
    through the transpose-free packed kernel; everything else (masks,
    causal, VMEM-exceeding keys) through the standard head-split path."""
    if key_mask is None and not causal and packed_eligible(
            num_heads, q.shape[1], k.shape[1], q.shape[2]):
        return flash_attention_packed(q, k, v, num_heads)
    b, lq, width = q.shape
    dh = width // num_heads

    def split(t):
        return t.reshape(b, t.shape[1], num_heads, dh).transpose(0, 2, 1, 3)

    out = flash_attention(split(q), split(k), split(v), key_mask, causal)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, width)
