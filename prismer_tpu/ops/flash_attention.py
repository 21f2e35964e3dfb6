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

Differentiable via custom_vjp: forward = Pallas kernel; backward recomputes
with the XLA reference (correct, and training backprops through frozen
attention only via adaptors, so the recompute cost is acceptable for now).

Masking supports key-padding masks and causal masking without ever
materializing (L, L) bias tensors in HBM.
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


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  *, scale: float, block_k: int, causal: bool):
    """One (batch*head, q-block) program. k/v live fully in VMEM."""
    q = q_ref[0].astype(jnp.float32)          # (BQ, D)
    lk = k_ref.shape[1]
    bq = q.shape[0]
    n_kb = lk // block_k

    qi = pl.program_id(1)
    q_start = qi * bq

    def body(kb, carry):
        acc, m, l = carry  # acc (BQ, D); m/l (BQ, 1) — 2D for TPU layout
        ks = kb * block_k
        kblk = k_ref[0, pl.ds(ks, block_k), :].astype(jnp.float32)
        vblk = v_ref[0, pl.ds(ks, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, BK)

        kmask = mask_ref[0, :, pl.ds(ks, block_k)] > 0    # (1, BK)
        s = jnp.where(kmask, s, NEG_INF)
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            cols = ks + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(cols <= rows, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)

    if causal:
        # only k-blocks up to the diagonal contribute
        last = jnp.minimum(n_kb, pl.cdiv(q_start + bq, block_k))
        acc, m, l = jax.lax.fori_loop(0, last, body, (acc0, m0, l0))
    else:
        acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, key_mask, causal,
                   block_q: int = 256, block_k: int = 256,
                   interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q = min(block_q, max(8, -(-lq // 8) * 8))
    block_k = min(block_k, max(128, -(-lk // 128) * 128))

    # pad sequence lengths to block multiples (padded keys masked off;
    # padded queries produce garbage rows that are sliced away)
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

    grid = (b * h, lq_p // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=1.0 / np.sqrt(d), block_k=block_k,
        causal=causal)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk_p), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
        interpret=interpret,
    )(qf, kf, vf, maskf)

    out = out.reshape(b, h, lq_p, d)
    return out[:, :, :lq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, key_mask=None, causal: bool = False):
    """Fused attention; q,k,v (B,H,L,D), key_mask (B,Lk) 1=valid."""
    return _flash_forward(q, k, v, key_mask, causal)


def _fwd(q, k, v, key_mask, causal):
    return _flash_forward(q, k, v, key_mask, causal), (q, k, v, key_mask)


def _bwd(causal, res, g):
    q, k, v, key_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: mha_reference(q_, k_, v_, key_mask,
                                                      causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
