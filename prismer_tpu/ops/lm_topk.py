"""Fused LM-head + beam top-2K candidate selection in ONE pallas kernel.

Replaces, per decode step, the XLA sequence
    logits = h @ emb_t + bias                     (models/roberta.py LMHead)
    vals, beam, tok = lazy_top_candidates(logits) (models/generation.py)
which profiles at ~0.6 ms/step at Prismer-BASE b24 (LM head 4.3 ms +
top-k 4.5 ms over the generate, tools/profile_decode_parts.py) even though
its HBM floor is ~0.1 ms: the selection rounds are ~70 tiny ops per step
whose latency dominates, and the (B, K, V) fp32 logits round-trip HBM three
times (write + two fused reads) plus ride the while-loop carry.

Here the (D, Vp) tied-embedding matrix is streamed once per step through a
vocab-block grid, the logits blocks stay RESIDENT in VMEM scratch, and the
final grid step runs the entire exact top-2K selection on-chip:

  * per-block maxima in f-space (f(x) = alive + ((x - m) - lse), monotone,
    so f(blockmax) is each block's exact candidate max — same argument as
    generation.lazy_top_candidates);
  * (N, nvb) row-space maxima transpose to the (B, K*nvb) sample-major
    layout with 0/1 selector matmuls (exact copies — sublane->lane regroup
    is an unsupported Mosaic shape cast, and per-row dynamic slices cannot
    be proven 8-aligned);
  * each of the 2K rounds gathers its winning (beam, block) row as a
    selector matmul over the resident scratch (never the gather unit), and
    argmax is max + lowest-equal-lane (bit-exact lax.top_k tie order:
    lowest flat candidate index first, k-major).

Selection math is elementwise-identical to lazy_top_candidates (same op
order alive + ((x - m) - lse)); the only numeric deltas vs the XLA path are
the MXU contraction of the logits themselves and the block order of the
log-sum-exp accumulation, both last-ulp effects (parity tests pin indices
exactly and values to fp32 tolerance).

Reference path being replaced: HF beam_search's log_softmax + score add +
top-2K over the materialized (B, K*V) candidate matrix, called from
model/modules/roberta.py:358-406 via generate().
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e7   # generation.NEG_INF — the finite EOS/min-length sentinel
_MININF = float("-inf")

# VMEM envelope, in feature rows (N = B*beams). The logits scratch plus the
# selection-phase temporaries scale linearly with N: n=96 (b32 x 3 beams)
# compiles and runs on-chip, n=144 (b48) is a measured Mosaic VMEM OOM
# (165.27M of 128M, probe_b48 round 4). Above the limit the public wrapper
# splits the batch into sample-aligned chunks — samples are independent, so
# chunking is EXACT; the only cost is re-streaming the (D, Vp) embedding
# once per extra chunk (~78 MB ~= 0.1 ms at HBM speed).
_ROW_LIMIT = int(os.environ.get("PRISMER_LM_TOPK_ROWS", "96"))


def pad_layout(v: int, max_blocks: int = 8) -> Tuple[int, int, int]:
    """(vb, nvb, vp): lane-aligned vocab block size, block count, padded
    width. nvb <= max_blocks so the (B, K*nvb) block-maxima matrix fits the
    128-lane selection row (K <= 8 beams)."""
    lanes = -(-v // 128)                      # 128-lane units
    nvb = min(max_blocks, lanes)
    per = -(-lanes // nvb)
    vb = per * 128
    nvb = -(-v // vb)
    return vb, nvb, nvb * vb


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _sdot(a, b):
    """f32 selector/stat matmul at FULL f32 precision. Mosaic's DEFAULT
    precision runs f32 MXU operands as ONE bf16 pass, silently rounding the
    routed values to ~2^-8 relative — measured on-chip as ~1e-2 candidate
    value drift and rank flips vs the XLA path (tools/check_lm_topk_tpu.py).
    HIGHEST forces the multi-pass f32 algorithm; 0/1 selectors then copy
    exactly. Only the tiny selection-phase dots pay this — the big (N,D)x
    (D,Vb) logits matmul stays one-pass bf16, same as the XLA einsum."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _kernel(h_ref, emb_ref, bias_ref, alive_ref, me_ref, vals_ref, beam_ref,
            tok_ref, logits_s, *, v: int, vb: int, nvb: int, beams: int,
            kk: int, eos_id: int):
    j = pl.program_id(0)
    n, d = h_ref.shape
    b = n // beams
    f32 = jnp.float32

    # ---- matmul phase: one logits block, resident in scratch --------------
    blk = jax.lax.dot_general(h_ref[:], emb_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    logits_s[j] = blk + bias_ref[:]

    # ---- selection phase (after the last block lands) ----------------------
    @pl.when(j == nvb - 1)
    def _select():
        me = me_ref[0, 0] != 0                 # min-length EOS mask flag
        eos_j, eos_l = eos_id // vb, eos_id % vb
        vlast = v - (nvb - 1) * vb             # valid lanes in the last block
        lane = _iota((n, vb), 1)

        def valid(jj, x, fill):
            if jj == nvb - 1 and vlast < vb:
                return jnp.where(lane < vlast, x, fill)
            return x

        # row stats, same reduction tree every call: m = max over blocks'
        # maxima; lse = log of the block-ordered sum of exp(x - m)
        bmax = [jnp.max(valid(jj, logits_s[jj], _MININF), axis=1,
                        keepdims=True) for jj in range(nvb)]
        m = functools.reduce(jnp.maximum, bmax)              # (N, 1)
        s = None
        for jj in range(nvb):
            e = valid(jj, jnp.exp(logits_s[jj] - m), 0.0)
            ps = jnp.sum(e, axis=1, keepdims=True)
            s = ps if s is None else s + ps
        ls = jnp.log(s)                                      # (N, 1)
        a = alive_ref[:]                                     # (N, 1) f32

        # per-block f-space maxima, EOS lane excluded while masked
        bmf = []
        for jj in range(nvb):
            x = valid(jj, logits_s[jj], _MININF)
            if jj == eos_j:
                x = jnp.where(me & (lane == eos_l), _MININF, x)
            bx = jnp.max(x, axis=1, keepdims=True)
            bmf.append(a + ((bx - m) - ls))                  # (N, 1)
        eos_f = jnp.where(me, a + NEG_INF, _MININF)          # (N, 1)
        bmf[eos_j] = jnp.maximum(bmf[eos_j], eos_f)

        # (N, nvb-on-lanes) -> (B, K*nvb) sample-major via selector matmuls.
        # Everything routed through a 0/1 matmul must be FINITE (0 * -inf
        # is NaN in the accumulation): unused lanes carry the -1e30
        # sentinel, which no real candidate value can reach.
        NEG_BIG = -1.0e30
        lane128 = _iota((n, 128), 1)
        bm_l = jnp.full((n, 128), 0.0, f32)
        for jj in range(nvb):
            bm_l = jnp.where(lane128 == jj,
                             jnp.maximum(bmf[jj], NEG_BIG), bm_l)
        rowb = _iota((b, n), 0)
        coln = _iota((b, n), 1)
        lane_b = _iota((b, 128), 1)
        # shift matrix: lane l -> lane l + k*nvb for l < nvb
        r128 = _iota((128, 128), 0)
        c128 = _iota((128, 128), 1)
        bmf2 = jnp.full((b, 128), NEG_BIG, f32)
        for k in range(beams):
            sel = (coln == rowb * beams + k).astype(f32)     # (B, N)
            row = _sdot(sel, bm_l)
            sh = ((c128 == r128 + k * nvb) & (r128 < nvb)).astype(f32)
            shifted = _sdot(row, sh)
            in_k = (lane_b >= k * nvb) & (lane_b < (k + 1) * nvb)
            bmf2 = jnp.where(in_k, shifted, bmf2)

        lane_v = _iota((b, vb), 1)
        vals = jnp.zeros((b, 128), f32)
        beam = jnp.zeros((b, 128), jnp.int32)
        tok = jnp.zeros((b, 128), jnp.int32)
        taken = []                                           # [(jstar, istar)]
        for r in range(kk):
            best = jnp.max(bmf2, axis=1, keepdims=True)      # (B, 1)
            jstar = jnp.min(jnp.where(bmf2 == best, lane_b, 128), axis=1,
                            keepdims=True)                   # (B, 1) lowest
            kb, jb = jstar // nvb, jstar % nvb

            # winning (beam, block) row via selector matmuls on the
            # resident scratch — no per-row dynamic slices
            rsel = (coln == rowb * beams + kb).astype(f32)   # (B, N)
            xr = None
            for jj in range(nvb):
                rj = jnp.where(jb == jj, rsel, 0.0)
                px = _sdot(rj, logits_s[jj])
                xr = px if xr is None else xr + px           # (B, Vb)
            a_r = _sdot(rsel, a)
            m_r = _sdot(rsel, m)
            ls_r = _sdot(rsel, ls)
            fb = a_r + ((xr - m_r) - ls_r)                   # (B, Vb)
            if vlast < vb:
                fb = jnp.where((jb == nvb - 1) & (lane_v >= vlast),
                               _MININF, fb)
            fb = jnp.where(me & (jb == eos_j) & (lane_v == eos_l),
                           a_r + NEG_INF, fb)
            for jp, ip in taken:
                fb = jnp.where((jp == jstar) & (lane_v == ip), _MININF, fb)

            vmax = jnp.max(fb, axis=1, keepdims=True)        # (B, 1)
            istar = jnp.min(jnp.where(fb == vmax, lane_v, vb), axis=1,
                            keepdims=True)                   # (B, 1) lowest
            lr = _iota((b, 128), 1) == r
            vals = jnp.where(lr, vmax, vals)
            beam = jnp.where(lr, kb, beam)
            tok = jnp.where(lr, jb * vb + istar, tok)
            taken.append((jstar, istar))

            fb = jnp.where(lane_v == istar, _MININF, fb)
            nbm = jnp.max(fb, axis=1, keepdims=True)
            bmf2 = jnp.where(lane_b == jstar, nbm, bmf2)

        vals_ref[:] = vals
        beam_ref[:] = beam
        tok_ref[:] = tok


def lm_topk(h: jax.Array, emb_tp: jax.Array, bias_p: jax.Array,
            alive_scores: jax.Array, mask_eos: jax.Array, *, vocab: int,
            beams: int, kk: int, eos_token_id: int,
            interpret: bool | None = None
            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused LM head + exact top-kk beam-candidate selection.

    h (N, D) compute-dtype LM-head features (LMHead.features output,
    N = B*beams); emb_tp (D, Vp) pre-transposed tied embeddings, zero-padded
    to the pad_layout width; bias_p (1, Vp) fp32 LM bias (pad lanes
    arbitrary — masked in-kernel); alive_scores (B, beams) fp32;
    mask_eos scalar bool (cur_len < min_length). Returns
    (vals (B, kk) f32, beam (B, kk) i32, token (B, kk) i32) — identical
    selection to generation.lazy_top_candidates over h @ emb + bias.
    """
    n, d = h.shape
    b = n // beams
    assert b * beams == n

    # VMEM envelope: chunk over samples when N exceeds the measured limit
    # (exact — each sample's selection is independent of the rest).
    if n > _ROW_LIMIT and b > 1:
        b_chunk = max(1, _ROW_LIMIT // beams)
        nch = -(-b // b_chunk)
        b_chunk = -(-b // nch)                 # equalize chunk sizes
        outs = []
        for c in range(nch):
            lo, hi = c * b_chunk, min((c + 1) * b_chunk, b)
            outs.append(lm_topk(
                h[lo * beams:hi * beams], emb_tp, bias_p,
                alive_scores[lo:hi], mask_eos, vocab=vocab, beams=beams,
                kk=kk, eos_token_id=eos_token_id, interpret=interpret))
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                     for i in range(3))

    vb, nvb, vp = pad_layout(vocab)
    assert emb_tp.shape == (d, vp) and bias_p.shape == (1, vp), (
        emb_tp.shape, bias_p.shape, (d, vp))
    assert beams * nvb <= 128 and kk <= 128
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    kern = functools.partial(_kernel, v=vocab, vb=vb, nvb=nvb, beams=beams,
                             kk=kk, eos_id=eos_token_id)
    me = mask_eos.astype(jnp.int32).reshape(1, 1)
    alive = alive_scores.astype(jnp.float32).reshape(n, 1)
    out = pl.pallas_call(
        kern,
        grid=(nvb,),
        in_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, vb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nvb, n, vb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * vp + 2 * kk * nvb * b * n * vb,
            bytes_accessed=emb_tp.size * emb_tp.dtype.itemsize
            + n * d * h.dtype.itemsize,
            transcendentals=n * vp,
        ),
        interpret=interpret,
    )(h, emb_tp, bias_p.astype(jnp.float32), alive, me)
    vals, beam, tok = out
    return vals[:, :kk], beam[:, :kk], tok[:, :kk]


def pad_embedding(emb_t: jax.Array, bias: jax.Array, vocab: int
                  ) -> Tuple[jax.Array, jax.Array]:
    """(D, V) pre-transposed embeddings + (V,) LM bias -> kernel-padded
    (D, Vp) / (1, Vp) (pad columns zero; pad bias NEG_INF so even the raw
    padded logits are inert before the in-kernel lane mask)."""
    _, _, vp = pad_layout(vocab)
    emb_tp = jnp.pad(emb_t, ((0, 0), (0, vp - vocab)))
    bias_p = jnp.pad(bias.astype(jnp.float32), (0, vp - vocab),
                     constant_values=NEG_INF)[None, :]
    return emb_tp, bias_p
