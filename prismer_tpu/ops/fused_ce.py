"""Fused LM-head + label-smoothed cross-entropy: logits never touch HBM.

Training and VQA rank pass-2 are the last consumers of materialized
(B, L, V) fp32 logits: the XLA path computes
    logits = h @ emb.T + bias            (models/roberta.py LMHead)
    per_sample = label_smoothed_loss(logits, targets)
which at Prismer-BASE train shapes writes + re-reads ~190 MB of fp32
logits per step (and the backward materializes a same-sized dlogits), and
at VQA rank pass-2 materializes (B*k_test, L, V) — ~51 MB/image at
k_test=16 (reference spec /root/reference/model/prismer_vqa.py:102-113,
loss /root/reference/model/modules/roberta.py:383-387).

Here the tied-embedding matrix streams through a vocab-block grid and the
loss reduces on-chip to three (N, 1) per-token statistics:

    m, lse  — online (flash-style) max / log-sum-exp over vocab blocks
    sumx    — sum of logits over the true vocab (the smoothing term)
    xlab    — the logit at the label (a one-hot lane reduction per block)

so per_tok = (1-s)*(lse - xlab) + s*(lse - sumx/V) exactly as the XLA
reference (torch CrossEntropyLoss(label_smoothing=0.1) semantics). The
backward is a custom_vjp kernel that recomputes each logits block from the
saved lse (p = exp(x - lse)) and contracts
    dx = g_valid * (p - s/V) - (1-s) * g_valid * onehot(label)
into dh (+= dx @ emb), demb (dx^T @ h, written blockwise) and dbias —
dx never exists in HBM either.

Vocab padding is handled IN-KERNEL by lane/sublane masks on the last
block (Pallas drops out-of-bounds writes and we `where`-mask every
out-of-bounds read before use), so the (V, D) embedding table is consumed
in its natural parameter layout with zero relayout/pad traffic per step.

Numerics vs the XLA path: the logits matmul runs the same default-precision
MXU contraction as the XLA einsum; the only deltas are the block order of
the log-sum-exp (online rescaling vs global max) and the sum order of the
smoothing mean — both last-ulp fp32 effects (parity tests pin loss and
grads to fp32 tolerance; exact on the CPU interpreter).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MININF = float("-inf")

# Trace-time flag, same convention as roberta._FUSED_DECODE: 'auto' enables
# the kernel on TPU backends only (the CPU interpreter is much slower than
# plain XLA at real vocab sizes); tests force it with set_fused_ce.
_FUSED_CE: str = {"1": "on", "0": "off"}.get(
    os.environ.get("PRISMER_FUSED_CE", "auto"),
    os.environ.get("PRISMER_FUSED_CE", "auto"))


def set_fused_ce(mode: str) -> None:
    """'on' | 'off' | 'auto' — must be set before the loss program is traced."""
    global _FUSED_CE
    assert mode in ("on", "off", "auto"), mode
    _FUSED_CE = mode


def use_fused_ce(train: bool = False) -> bool:
    """auto: kernel on TPU for TRAINING only; XLA for forward-only surfaces
    (VQA rank pass-2, eval loss). Both verdicts are same-session idle-host
    A/Bs (2026-08-19):
      * train b16/480px freeze_vision: CE-on 59.5 vs CE-off 59.0 img/s —
        parity-to-slightly-better on time, and the (B, L, V) fp32 logits
        never hit HBM in either direction of the backward.
      * VQA rank p50: CE-on 10.58 vs CE-off 6.77 ms/image — the vocab-
        blocked kernel LOSES 56% on the forward-only pass, where XLA's one
        big (B*k*L, D)x(D, V) MXU matmul + fused reduce beats VMEM-resident
        blocking and the (B*k, L, V) materialization is transient anyway.
    (The first train A/B that 'measured' a 32% loss was void: the harness
    passed PRISMER_FUSED_CE=1/0 before the 1/0 aliases existed, so BOTH
    sides ran the XLA path, and the spread was host-CPU contention from
    concurrent pytest runs on this 1-core host.)
    PRISMER_FUSED_CE=on/off still forces both surfaces together."""
    if _FUSED_CE == "auto":
        return train and jax.default_backend() == "tpu"
    return _FUSED_CE == "on"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _row_layout(n: int) -> Tuple[int, int]:
    """(nb, npad): row-block size (multiple of 8) and padded row count."""
    nb = min(512, _ceil_to(max(n, 1), 8))
    return nb, _ceil_to(max(n, 1), nb)


# Backward keeps all rows + the f32 dh accumulator resident in VMEM; cap
# the padded row count so h + dh_acc + the (N, vb) block temporaries stay
# well under the measured ~28 MB budget (ops/lm_topk.py runs ~25 MB).
_BWD_VB = 512


def _bwd_resident_rows(d: int, itemsize: int) -> int:
    budget = 22 * 1024 * 1024
    fixed = _BWD_VB * d * (4 + itemsize)          # demb out + emb block
    per_row = d * (4 + 2 * itemsize) + _BWD_VB * 4 * 3
    return max(0, (budget - fixed) // per_row)


def _fwd_kernel(h_ref, emb_ref, bias_ref, lab_ref, xlab_ref, sumx_ref,
                lse_ref, m_s, s_s, sx_s, xl_s, *, v: int, vb: int, nvb: int):
    j, r = pl.program_id(0), pl.program_id(1)
    nb = h_ref.shape[0]
    blk = jax.lax.dot_general(h_ref[:], emb_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    blk = blk + bias_ref[:]
    gcol = jax.lax.broadcasted_iota(jnp.int32, (nb, vb), 1) + j * vb
    lanev = gcol < v                      # masks the OOB tail of the last block
    bm = jnp.max(jnp.where(lanev, blk, _MININF), axis=1, keepdims=True)
    xl_c = jnp.sum(jnp.where(gcol == lab_ref[:], blk, 0.0), axis=1,
                   keepdims=True)
    sx_c = jnp.sum(jnp.where(lanev, blk, 0.0), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        m_s[r] = bm
        s_s[r] = jnp.sum(jnp.where(lanev, jnp.exp(blk - bm), 0.0), axis=1,
                         keepdims=True)
        sx_s[r] = sx_c
        xl_s[r] = xl_c

    @pl.when(j > 0)
    def _accum():
        m_old = m_s[r]
        mn = jnp.maximum(m_old, bm)
        s_s[r] = s_s[r] * jnp.exp(m_old - mn) + jnp.sum(
            jnp.where(lanev, jnp.exp(blk - mn), 0.0), axis=1, keepdims=True)
        m_s[r] = mn
        sx_s[r] = sx_s[r] + sx_c
        xl_s[r] = xl_s[r] + xl_c

    @pl.when(j == nvb - 1)
    def _out():
        xlab_ref[:] = xl_s[r]
        sumx_ref[:] = sx_s[r]
        lse_ref[:] = m_s[r] + jnp.log(s_s[r])


def _ce_stats(h2: jax.Array, emb: jax.Array, bias2: jax.Array,
              lab: jax.Array, *, interpret: bool
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(xlab, sumx, lse), each (N,) f32, for logits = h2 @ emb.T + bias."""
    n, d = h2.shape
    v = emb.shape[0]
    vb = 1024 if v >= 1024 else _ceil_to(v, 128)
    nvb = -(-v // vb)
    nb, npad = _row_layout(n)
    r = npad // nb
    hp = jnp.pad(h2, ((0, npad - n), (0, 0)))
    labp = jnp.pad(lab.reshape(n, 1), ((0, npad - n), (0, 0)))
    kern = functools.partial(_fwd_kernel, v=v, vb=vb, nvb=nvb)
    out = pl.pallas_call(
        kern,
        grid=(nvb, r),
        in_specs=[
            pl.BlockSpec((nb, d), lambda j, rr: (rr, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vb, d), lambda j, rr: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vb), lambda j, rr: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda j, rr: (rr, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, 1), lambda j, rr: (rr, 0),
                         memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((npad, 1), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((r, nb, 1), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * d * v,
            bytes_accessed=emb.size * emb.dtype.itemsize
            + r * npad * d * h2.dtype.itemsize,
            transcendentals=npad * v,
        ),
        interpret=interpret,
    )(hp, emb, bias2, labp)
    xlab, sumx, lse = (o[:n, 0] for o in out)
    return xlab, sumx, lse


def _bwd_kernel(h_ref, emb_ref, bias_ref, lab_ref, gv_ref, lse_ref,
                dh_ref, demb_ref, dbias_ref, dh_acc, *, v: int, vb: int,
                nvb: int, smoothing: float):
    j = pl.program_id(0)
    n = h_ref.shape[0]
    h32 = h_ref[:].astype(jnp.float32)
    blk = jax.lax.dot_general(h_ref[:], emb_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    blk = blk + bias_ref[:]
    gcol = jax.lax.broadcasted_iota(jnp.int32, (n, vb), 1) + j * vb
    lanev = gcol < v
    p = jnp.exp(blk - lse_ref[:])
    dx = gv_ref[:] * (p - smoothing / v)
    dx = dx - jnp.where(gcol == lab_ref[:], (1.0 - smoothing) * gv_ref[:],
                        0.0)
    dx = jnp.where(lanev, dx, 0.0)                    # (N, vb) f32
    demb_ref[:] = jax.lax.dot_general(
        dx, h32, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbias_ref[:] = jnp.sum(dx, axis=0, keepdims=True)
    # zero the out-of-bounds tail rows of the last emb block: their buffer
    # garbage can be NaN, and 0 * NaN from the masked dx lanes would poison
    # the dh contraction
    rowv = (jax.lax.broadcasted_iota(jnp.int32, emb_ref.shape, 0)
            + j * vb) < v
    emb32 = jnp.where(rowv, emb_ref[:].astype(jnp.float32), 0.0)
    contrib = jax.lax.dot_general(
        dx, emb32, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        dh_acc[:] = contrib

    @pl.when(j > 0)
    def _accum():
        dh_acc[:] = dh_acc[:] + contrib

    @pl.when(j == nvb - 1)
    def _out():
        dh_ref[:] = dh_acc[:].astype(dh_ref.dtype)


def _ce_grads_kernel(h2, emb, bias2, lab, gv, lse, *, smoothing: float,
                     interpret: bool):
    n, d = h2.shape
    v = emb.shape[0]
    vb = _BWD_VB if v >= _BWD_VB else _ceil_to(v, 128)
    nvb = -(-v // vb)
    npad = _ceil_to(max(n, 1), 8)
    hp = jnp.pad(h2, ((0, npad - n), (0, 0)))
    labp = jnp.pad(lab.reshape(n, 1), ((0, npad - n), (0, 0)))
    gvp = jnp.pad(gv.reshape(n, 1), ((0, npad - n), (0, 0)))
    lsep = jnp.pad(lse.reshape(n, 1), ((0, npad - n), (0, 0)))
    kern = functools.partial(_bwd_kernel, v=v, vb=vb, nvb=nvb,
                             smoothing=smoothing)
    dh, demb, dbias = pl.pallas_call(
        kern,
        grid=(nvb,),
        in_specs=[
            pl.BlockSpec((npad, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vb, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((npad, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vb, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vb), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, d), h2.dtype),
            jax.ShapeDtypeStruct((v, d), jnp.float32),
            jax.ShapeDtypeStruct((1, v), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((npad, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * npad * d * v,
            bytes_accessed=2 * emb.size * emb.dtype.itemsize
            + npad * d * (2 * h2.dtype.itemsize + 4),
            transcendentals=npad * v,
        ),
        interpret=interpret,
    )(hp, emb, bias2, labp, gvp, lsep)
    return dh[:n], demb, dbias[0]


def _ce_grads_xla(h2, emb, bias2, lab, gv, *, smoothing: float):
    """Materializing fallback for row counts beyond the resident-VMEM cap."""
    n, d = h2.shape
    v = emb.shape[0]
    logits = jax.lax.dot_general(
        h2, emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias2
    p = jax.nn.softmax(logits, axis=-1)
    dx = gv[:, None] * (p - smoothing / v)
    onehot = jax.nn.one_hot(lab, v, dtype=jnp.float32)
    dx = dx - (1.0 - smoothing) * gv[:, None] * onehot
    dh = jnp.dot(dx, emb.astype(jnp.float32),
                 preferred_element_type=jnp.float32).astype(h2.dtype)
    demb = jax.lax.dot_general(dx, h2.astype(jnp.float32),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return dh, demb, jnp.sum(dx, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _per_token_loss(h2, emb, bias, lab, valid, smoothing, interpret):
    out, _ = _per_token_fwd(h2, emb, bias, lab, valid, smoothing, interpret)
    return out


def _per_token_fwd(h2, emb, bias, lab, valid, smoothing, interpret):
    v = emb.shape[0]
    bias2 = bias.astype(jnp.float32).reshape(1, v)
    xlab, sumx, lse = _ce_stats(h2, emb, bias2, lab, interpret=interpret)
    nll = lse - xlab
    smooth = lse - sumx / v
    per_tok = valid * ((1.0 - smoothing) * nll + smoothing * smooth)
    return per_tok, (h2, emb, bias, lab, valid, lse)


def _per_token_bwd(smoothing, interpret, res, g):
    h2, emb, bias, lab, valid, lse = res
    v = emb.shape[0]
    bias2 = bias.astype(jnp.float32).reshape(1, v)
    gv = (g * valid).astype(jnp.float32)
    npad = _ceil_to(max(h2.shape[0], 1), 8)
    if npad <= _bwd_resident_rows(h2.shape[1], h2.dtype.itemsize):
        dh, demb, dbias = _ce_grads_kernel(
            h2, emb, bias2, lab, gv, lse, smoothing=smoothing,
            interpret=interpret)
    else:
        dh, demb, dbias = _ce_grads_xla(h2, emb, bias2, lab, gv,
                                        smoothing=smoothing)
    return (dh.astype(h2.dtype), demb.astype(emb.dtype),
            dbias.astype(bias.dtype),
            np.zeros(lab.shape, jax.dtypes.float0),
            jnp.zeros_like(valid))


_per_token_loss.defvjp(_per_token_fwd, _per_token_bwd)


def fused_label_smoothed_loss(h: jax.Array, emb: jax.Array, bias: jax.Array,
                              labels: jax.Array, smoothing: float = 0.1,
                              interpret: Optional[bool] = None) -> jax.Array:
    """Per-sample summed label-smoothed CE of the tied-embedding LM head,
    without materializing logits.

    h (B, L, D): LM-head FEATURES (LMHead.features output) in compute dtype;
    emb (V, D): tied word embeddings in compute dtype (natural param layout,
    no transpose/pad needed); bias (V,): fp32 LM bias; labels (B, L) with
    -100 ignores. Returns (B,) f32 — numerically equivalent to
    roberta.label_smoothed_loss(h @ emb.T + bias, labels) and differentiable
    wrt h, emb, bias via on-chip recompute (custom_vjp)."""
    b, l, d = h.shape
    if l < 2:
        return jnp.zeros((b,), jnp.float32)
    n = b * (l - 1)
    h2 = h[:, :-1, :].reshape(n, d)
    lab2 = labels[:, 1:].reshape(n)
    valid = lab2 != -100
    lab_safe = jnp.where(valid, lab2, 0).astype(jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    per_tok = _per_token_loss(h2, emb, bias, lab_safe,
                              valid.astype(jnp.float32), float(smoothing),
                              bool(interpret))
    return per_tok.reshape(b, l - 1).sum(axis=1)
