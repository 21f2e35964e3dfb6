"""Fused whole-step decode kernel: all decoder layer bodies in ONE pallas_call.

MEASURED AND ADOPTED (TPU default via models/roberta.py use_fused_decode).
Same-session honest A/B at Prismer-BASE b32 beam-3 (2026-08-17,
tools/profile_pipeline.py): decode-only 73.8 -> 69.4 ms, full pipeline
195.0 -> 190.2 ms (+2.5% img/s). Decoder-only slope harness
(tools/check_fused_decode_tpu.py --slope): 2.582 vs 2.786 ms/decode-step
(-7%), +~5 ms one-off cache/weight packing in init_cache (amortized over
the sequence; weight packing is loop-invariant and hoists in serving
loops).

Post-mortem of the r2 sizing (ops/decode_attention.py predicted ~40 ms
winnable): the 72.1 ms "nolayers" ablation OVER-ATTRIBUTED the layer
bodies — standalone, the XLA step bodies cost ~2.65 ms/step (~42 ms), with
the rest of decode-only being top-k (~10 ms), beam bookkeeping + cache
reorders, LM head and embeddings, which this kernel does not touch. Against
the ~1.9 ms/step DMA floor (cross-KV 1.15 GB + weights 0.24 GB + self
cache 0.08 GB at ~800 GB/s) the kernel runs at 2.58 ms/step — within ~25%
of the floor; the XLA path's separate-op streaming reaches ~550 GB/s here,
much better than the 352 GB/s its microbench showed inside the full
pipeline.

Why one invocation per step: the layers are sequentially dependent, so only
a grid that carries the hidden state across layer phases in VMEM scratch
can stream cross-KV + weights + self-cache exactly once per step while
overlapping compute; two per-op Pallas formulations LOST before
(ops/decode_attention.py: per-head tiny dots are issue-latency-bound at
~87 GB/s).

Reference path being replaced: the cache-less HF decode of
model/modules/roberta.py:358-406 (the XLA cached path in
models/roberta.py:decode_step is the numerical spec).

Design (per decode step, grid = (NL, B + 2), iterated layer-major):

  phase j == 0 (head): one (N, D) x (D, 3D) matmul makes q / k_new / v_new
    for all N = B*beams rows; k_new/v_new are kernel outputs (the caller
    writes them into the cache at `index`). Self-attention over the T cached
    columns never touches the MXU per-row: scores come from one broadcasted
    multiply (T, N, D) and a single (T*N, D) x (D, 128) matmul against a 0/1
    head-grouping matrix G[d, h] = [d // Dh == h] (sums each head's Dh lanes);
    probabilities are expanded back over lanes with G^T (exact replication —
    each row of G^T has a single 1). The current token's column is folded in
    separately (the cache column at `index` is stale at kernel time and is
    masked out via bias_tn). fp32 softmax, probabilities rounded to the
    compute dtype after normalization — bit-matching the XLA path's
    softmax(f32).astype(bf16) order. Then self out-proj + LN.
    Also builds the per-sample cross query layout (below).

  phases j in [1, B] (cross, layers with cross-attention only): sample
    s = j - 1. Beam-grouped cross-attention as TWO WIDE MXU matmuls instead
    of per-head dots:
      S = Q_wide (H*8, Dh) @ KD (Dh, H*Lp)      head h's beam rows live in
                                                 row block [8h, 8h+8); only
                                                 the block diagonal of S is
                                                 meaningful (12x redundant
                                                 FLOPs, free — the op is
                                                 bandwidth-bound)
      block-diagonal extract -> (H*8, Lp), fp32 softmax over the true L
      M = P (H*8, Lp) @ VC (Lp, H*Dh)           VC[l, h*Dh+d] = v[h, l, d];
                                                 diagonal (8, Dh) blocks of M
                                                 are the per-head outputs
    The KD / VC blocks (one sample, one layer) are BlockSpec-streamed, so
    Mosaic double-buffers the dominant HBM traffic automatically.

  phase j == B + 1 (tail): cross out-proj + LN + adaptor (squared-ReLU,
    late-LN) + MLP (gelu, W2 pre-chunked to (F/D) x (D, D) blocks so one
    packed (D, P) weight tensor serves every matmul) + LN. Writes the final
    hidden at the last layer.

Weight streaming: all per-layer matmul weights live in ONE packed tensor
w_all (NL, D, P), P = 8D + 2F, BlockSpec-fetched per layer; biases and LN
params in b_all (NL, 17D + F) fp32. Column layout (offsets in units of D):

  w_all: [0,3) qkv | [3,4) self-out | [4,5) cross-q | [5,6) cross-out
         | [6,7) adaptor-down | [7,8) adaptor-up | [8, 8+F/D) mlp-in
         | [8+F/D, 8+2F/D) mlp-out chunks (row block c of the (F, D) kernel)
  b_all: [0,3) qkv | [3,4) self-out | [4,6) ln1 s,b | [6,7) cross-q
         | [7,8) cross-out | [8,10) ln2 s,b | [10,11) ad-down | [11,12) ad-up
         | [12,14) ln-ad s,b | [14,14+F/D) mlp-in | +1 mlp-out | +2 ln3 s,b

Cache layouts (fused mode, built by init_cache):
  self_k / self_v: (NL, T, N, D)      — per-step column write is ONE
                                        contiguous dynamic_update_slice
  cross_kd:        (NLc, B, Dh, H*Lp) — K pre-transposed per head and
                                        concatenated head-major on lanes
  cross_vc:        (NLc, B, Lp, H*Dh) — V concatenated head-major on lanes

Layers without cross-attention (the reference's final output_layer,
roberta.py:210) skip phases via i >= nlc; their packed cross/adaptor weight
slots are zero and their cross block indices are pinned to the previous
block so no HBM fetch happens.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
QP = 8  # beam rows per head block (beams padded up to this)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# weight / cache packing
# ---------------------------------------------------------------------------

def pack_decode_weights(layer_params, output_params, dim: int, mlp_dim: int,
                        dtype) -> Tuple[jax.Array, jax.Array]:
    """Pack per-layer decoder params into (w_all (NL, D, P), b_all (NL, PB)).

    layer_params: list of the flax param dicts of the cross-attention layers
    (keys self_attn/self_out/cross_attn/cross_out/adaptor/mlp); output_params:
    the final no-cross layer. Cross/adaptor slots of the output layer are
    zero-filled (never read — the kernel skips those phases)."""
    d, f = dim, mlp_dim
    nch = f // d
    assert nch * d == f, (d, f)

    def layer_pack(p, with_cross):
        zeros_w = jnp.zeros((d, d), jnp.float32)
        zeros_b = jnp.zeros((d,), jnp.float32)
        ones_b = jnp.ones((d,), jnp.float32)
        sa, so = p["self_attn"], p["self_out"]
        mlp = p["mlp"]
        cols = [sa["query"]["kernel"], sa["key"]["kernel"],
                sa["value"]["kernel"], so["dense"]["kernel"]]
        if with_cross:
            ca, co, ad = p["cross_attn"], p["cross_out"], p["adaptor"]
            cols += [ca["query"]["kernel"], co["dense"]["kernel"],
                     ad["down_proj"]["kernel"], ad["up_proj"]["kernel"]]
        else:
            cols += [zeros_w] * 4
        cols.append(mlp["intermediate"]["kernel"])          # (D, F)
        w2 = mlp["out"]["dense"]["kernel"]                  # (F, D)
        cols += [w2[c * d:(c + 1) * d] for c in range(nch)]
        w = jnp.concatenate([c.astype(jnp.float32) for c in cols], axis=1)

        bs = [sa["query"]["bias"], sa["key"]["bias"], sa["value"]["bias"],
              so["dense"]["bias"], so["ln"]["scale"], so["ln"]["bias"]]
        if with_cross:
            ca, co, ad = p["cross_attn"], p["cross_out"], p["adaptor"]
            bs += [ca["query"]["bias"], co["dense"]["bias"],
                   co["ln"]["scale"], co["ln"]["bias"],
                   ad["down_proj"]["bias"], ad["up_proj"]["bias"],
                   ad["adaptor_ln"]["scale"], ad["adaptor_ln"]["bias"]]
        else:
            bs += [zeros_b, zeros_b, ones_b, zeros_b,
                   zeros_b, zeros_b, ones_b, zeros_b]
        bs += [mlp["intermediate"]["bias"], mlp["out"]["dense"]["bias"],
               mlp["out"]["ln"]["scale"], mlp["out"]["ln"]["bias"]]
        b = jnp.concatenate([x.astype(jnp.float32) for x in bs])
        return w, b

    packed = [layer_pack(p, True) for p in layer_params]
    packed.append(layer_pack(output_params, False))
    w_all = jnp.stack([w for w, _ in packed]).astype(dtype)
    b_all = jnp.stack([b for _, b in packed])
    return w_all, b_all


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-(batch, head) int8 quantization of (B, H, L, Dh) K or V.

    Returns (x_i8 (B, H, L, Dh) int8, scale (B, H) fp32) with
    dequant = x_i8 * scale. The scale is amax/127 over the (L, Dh) block —
    one scalar per head per sample per layer, so the kernel can fold it
    into the tiny per-head query/probability rows instead of rescaling the
    streamed tensors."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3))
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale[:, :, None, None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _scale_lanes(scale: jax.Array) -> jax.Array:
    """(B, H) fp32 scales -> (B, 1, 128) lane-padded kernel layout."""
    b, h = scale.shape
    return jnp.pad(scale, ((0, 0), (0, 128 - h)))[:, None, :]


def quantize_kv_nat(x4: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """quantize_kv for the natural-layout (B, Lp, H, Dh) view (the fused
    init_cache path builds kd/vc straight from the un-head-split
    projections). Same per-(batch, head) amax/127 scheme — zero pad rows
    never move the amax, so values match pad-after-quantize bitwise."""
    amax = jnp.max(jnp.abs(x4.astype(jnp.float32)), axis=(1, 3))
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.round(x4.astype(jnp.float32) / scale[:, None, :, None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


# Kernel cross-cache layouts (built by models/roberta.py init_cache straight
# from the un-head-split projections — V is the vc layout after row padding,
# K takes one transpose):
#   kd (B, Dh, H*Lp)  kd[b, dh, h*Lp + l] = K[b, l, h*Dh + dh]
#   vc (B, Lp, H*Dh)  vc[b, l, :] = V[b, l, :]
# with L zero-padded to lane-aligned Lp (padding keys masked in-kernel via
# the static valid_len). int8 mode adds (B, 1, 128) fp32 per-head scales.


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _erf(x):
    """fp32 erf from exp-only primitives (Mosaic implements neither erf nor
    erfc). Abramowitz & Stegun 7.1.26: |error| <= 1.5e-7 absolute — an order
    below the fused-path parity tolerance and far below bf16 resolution."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ln(x32, scale, bias, eps):
    """fp32 LayerNorm matching models/layers.py fp32_layer_norm."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(hidden0_ref, wh_ref, wt_ref, b_ref, selfk_ref, selfv_ref,
            bias_tn_ref, crossk_ref, crossv_ref, *rest, heads: int, dh: int,
            nlc: int, batch: int, beams: int, valid_len: int, eps: float,
            dtype, manual_dma: bool, nl: int, quant: bool,
            permute: bool = False):
    if quant:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    if permute:
        fb_ref = rest[0]
        rest = rest[1:]
    hidden_out_ref, knew_ref, vnew_ref = rest[:3]
    rest = rest[3:]
    if permute:
        skp_ref, svp_ref = rest[0], rest[1]
        rest = rest[2:]
    h_s, qc_s, co_s, *extra = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    d = h_s.shape[1]
    t = bias_tn_ref.shape[0]
    n = h_s.shape[0]
    lp = crossv_ref.shape[2]
    hp8 = heads * QP
    scale = 1.0 / np.sqrt(dh)
    f32 = jnp.float32

    if manual_dma:
        # wh/wt/selfk/selfv stay in HBM; the kernel streams each layer's
        # blocks into double VMEM buffers with a WHOLE-LAYER fetch window
        # (BlockSpec pipelining is one-grid-step lookahead, which leaves a
        # ~25 MB burst only a single short phase to land — measured as a
        # per-layer stall).
        whb, wtb, skb, svb, sems = extra
        sl = jax.lax.rem(i, 2)
        fams = ((0, wh_ref, whb), (1, wt_ref, wtb),
                (2, selfk_ref, skb), (3, selfv_ref, svb))

        def layer_copy(fam, src, buf, layer, slot):
            return pltpu.make_async_copy(src.at[layer], buf.at[slot],
                                         sems.at[fam, slot])

        @pl.when((i == 0) & (j == 0))
        def _startup():
            for fam, src, buf in fams:
                cp = layer_copy(fam, src, buf, 0, 0)
                cp.start()
                cp.wait()

        @pl.when((j == 1) & (i + 1 < nl))
        def _issue_next():
            nxt = i + 1
            for fam, src, buf in fams:
                layer_copy(fam, src, buf, nxt,
                           jax.lax.rem(nxt, 2)).start()

        @pl.when((j == 0) & (i > 0))
        def _wait_current():
            for fam, src, buf in fams:
                layer_copy(fam, src, buf, i, sl).wait()

        def w_head(lo, hi):
            return whb[sl, :, lo:hi]

        def w_tail(lo, hi):
            return wtb[sl, :, lo:hi]

        def self_k_block():
            return skb[sl]

        def self_v_block():
            return svb[sl]
    else:
        def w_head(lo, hi):
            return wh_ref[0, :, lo:hi]

        def w_tail(lo, hi):
            return wt_ref[0, :, lo:hi]

        def self_k_block():
            return selfk_ref[0]

        def self_v_block():
            return selfv_ref[0]

    def matmul(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def dense(x, w_lo, w_hi, b_lo):
        """x @ w_all[:, w_lo:w_hi] rounded to compute dtype + fp32-row bias
        cast to compute dtype — the flax Dense(dtype=...) arithmetic.
        Columns [0, 5D) live in the head-weight block, the rest in the
        tail-weight block."""
        if w_hi <= 5 * d:
            w = w_head(w_lo, w_hi)
        else:
            w = w_tail(w_lo - 5 * d, w_hi - 5 * d)
        out = matmul(x, w).astype(dtype)
        return out + b_ref[0, 0, b_lo:b_lo + (w_hi - w_lo)].astype(dtype)

    def layer_norm(x, res, s_lo):
        y = _ln(x.astype(f32) + res.astype(f32),
                b_ref[0, 0, s_lo:s_lo + d],
                b_ref[0, 0, s_lo + d:s_lo + 2 * d], eps)
        return y.astype(dtype)

    def head_group_matrix():
        """(D, 128) 0/1 matrix: col h sums lanes [h*Dh, (h+1)*Dh)."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (d, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (d, 128), 1)
        return (rows // dh == cols).astype(dtype)

    def head_expand_matrix():
        """(128, D) 0/1 matrix: row h replicates over lanes [h*Dh, (h+1)*Dh)
        (G^T, built directly — cheaper than transposing G in VMEM)."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, d), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, d), 1)
        return (cols // dh == rows).astype(dtype)

    # ---------------- head phase: self-attention + new K/V ----------------
    @pl.when(j == 0)
    def _head():
        @pl.when(i == 0)
        def _():
            h_s[:] = hidden0_ref[:]

        x = h_s[:]
        qkv = dense(x, 0, 3 * d, 0)
        q, k_new, v_new = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        knew_ref[0] = k_new
        vnew_ref[0] = v_new

        g = head_group_matrix()
        if permute:
            # Fold the per-step beam reorder into the kernel: permute the
            # layer's self K/V tiles (already resident in VMEM for the
            # attention read) with the 0/1 selector P[r, c] =
            # [c == flat_beam[r]] — one small matmul per cached column,
            # exact copies (f32 accumulate of a single 1.0*v term, cast
            # back to the storage dtype) — and write them out as the next
            # step's caches. This removes the separate XLA reorder op,
            # which re-streamed both (NL, T, N, D) caches through HBM at a
            # measured 108-137 GB/s (tools/bench_beam_perm.py).
            fb = fb_ref[:]                                  # (N, 1) int32
            cols_p = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            pmat = (cols_p == fb).astype(dtype)
            kc_raw = self_k_block()
            vc_raw = self_v_block()
            for tt in range(t):
                skp_ref[0, tt] = matmul(pmat, kc_raw[tt]).astype(dtype)
                svp_ref[0, tt] = matmul(pmat, vc_raw[tt]).astype(dtype)
            kc = skp_ref[0]
        else:
            kc = self_k_block()                             # (T, N, D)
        prod = (kc * q[None, :, :]).reshape(t * n, d)
        s = (matmul(prod, g) * scale).reshape(t, n, 128)
        s = s + bias_tn_ref[:][:, :, None]
        s_cur = matmul((k_new * q).reshape(n, d), g) * scale  # (N, 128)
        m = jnp.maximum(jnp.max(s, axis=0), s_cur)          # (N, 128)
        p = jnp.exp(s - m[None])
        p_cur = jnp.exp(s_cur - m)
        den = jnp.sum(p, axis=0) + p_cur
        # normalize in fp32, THEN round to compute dtype (XLA softmax order)
        pn = (p / den[None]).astype(dtype)
        pn_cur = (p_cur / den).astype(dtype)
        gt = head_expand_matrix()                           # (128, D)
        pe = matmul(pn.reshape(t * n, 128), gt).reshape(t, n, d)
        vv = svp_ref[0] if permute else self_v_block()
        att = jnp.sum(pe * vv.astype(f32), axis=0)
        att = att + matmul(pn_cur, gt) * v_new.astype(f32)
        o = dense(att.astype(dtype), 3 * d, 4 * d, 3 * d)
        h_s[:] = layer_norm(o, x, 4 * d)

        # cross queries, re-laid out for Mosaic-clean per-sample access:
        #   rows:  sample s occupies [s*QP, s*QP + beams) — dynamic slices
        #          start at provable multiples of 8 (3*s starts are
        #          rejected); padding rows are EXACT zeros
        #   lanes: head h occupies [h*128, h*128 + Dh) — later per-head
        #          slices are 128-aligned (64-offset lane slices produce
        #          offset-carrying vectors tpu.concatenate cannot take)
        # Both re-layouts are 0/1-selector matmuls (exact copies: one term
        # per output element); vector reshapes (sublane regrouping) are
        # unsupported Mosaic shape casts.
        @pl.when(i < nlc)
        def _():
            qc = dense(h_s[:], 4 * d, 5 * d, 6 * d)
            r = jax.lax.broadcasted_iota(jnp.int32, (d, heads * 128), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (d, heads * 128), 1)
            colpad = ((c // 128 == r // dh)
                      & (c % 128 == r % dh)).astype(dtype)
            rows = jax.lax.broadcasted_iota(jnp.int32, (batch * QP, n), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (batch * QP, n), 1)
            expand = ((cols == (rows // QP) * beams + rows % QP)
                      & (rows % QP < beams)).astype(dtype)
            qp_pad = matmul(qc, colpad).astype(dtype)       # (N, H*128)
            qc_s[:] = matmul(expand, qp_pad).astype(dtype)

    # ---------------- cross phases: one sample per grid step --------------
    @pl.when((i < nlc) & (j >= 1) & (j <= batch))
    def _cross():
        s_idx = j - 1
        row0 = pl.multiple_of(s_idx * QP, QP)
        # Q_wide rows [h*QP, (h+1)*QP): the sample's QP-row strided block,
        # per-head 128-ALIGNED column slices (padding rows are exact zeros)
        q = jnp.concatenate(
            [qc_s[pl.ds(row0, QP), h * 128:h * 128 + dh]
             for h in range(heads)], axis=0)                # (H*QP, Dh)
        kd = crossk_ref[0, 0]                               # (Dh, H*Lp)
        if quant:
            # int8 K: convert to compute dtype and fold the per-head scale
            # into the TINY q rows (row block h <- k_scale[h]) — never an
            # elementwise pass over the streamed tensor. Off-diagonal
            # blocks of s get the wrong scale; they are discarded anyway.
            kd = kd.astype(dtype)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (hp8, 1), 0) // QP
            ksl = ks_ref[0, 0]                              # (1, 128) f32
            kvec = jnp.full((hp8, 1), ksl[0, 0], f32)
            for h in range(1, heads):
                kvec = jnp.where(rowi == h, ksl[0, h], kvec)
            q = (q.astype(f32) * kvec).astype(dtype)
        s = matmul(q, kd) * scale                           # (H*QP, H*Lp) f32
        row_blk = jax.lax.broadcasted_iota(jnp.int32, (hp8, lp), 0) // QP
        sd = s[:, :lp]
        for h in range(1, heads):
            sd = jnp.where(row_blk == h, s[:, h * lp:(h + 1) * lp], sd)
        if valid_len < lp:
            cols = jax.lax.broadcasted_iota(jnp.int32, (hp8, lp), 1)
            sd = jnp.where(cols < valid_len, sd, NEG_INF)
        m = jnp.max(sd, axis=1, keepdims=True)
        p = jnp.exp(sd - m)
        pn = p / jnp.sum(p, axis=1, keepdims=True)
        vc = crossv_ref[0, 0]
        if quant:
            # int8 V: per-head scale folds into the probability rows (row
            # block h of pn only ever multiplies head h's V columns in the
            # block-diagonal extract below)
            vc = vc.astype(dtype)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (hp8, 1), 0) // QP
            vsl = vs_ref[0, 0]                              # (1, 128) f32
            vvec = jnp.full((hp8, 1), vsl[0, 0], f32)
            for h in range(1, heads):
                vvec = jnp.where(rowi == h, vsl[0, h], vvec)
            pn = pn * vvec
        pn = pn.astype(dtype)
        mm = matmul(pn, vc)                                 # (H*QP, H*Dh) f32
        # fold the block diagonal into one full-width (QP, D) row group:
        # sublane slices (8-aligned) + a lane-blocked select chain — no
        # lane-offset slices, then one aligned full-width store
        colb = jax.lax.broadcasted_iota(jnp.int32, (QP, d), 1) // dh
        out_s = mm[0:QP, :]
        for h in range(1, heads):
            out_s = jnp.where(colb == h, mm[h * QP:(h + 1) * QP, :], out_s)
        co_s[pl.ds(row0, QP), :] = out_s.astype(dtype)

    # ---------------- tail phase: cross-out + adaptor + MLP ---------------
    @pl.when(j == batch + 1)
    def _tail():
        @pl.when(i < nlc)
        def _():
            # compact the strided (B*QP, D) cross outputs back to (N, D)
            # with the inverse 0/1 selector (exact copies)
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, batch * QP), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n, batch * QP), 1)
            compact = (cols == (rows // beams) * QP
                       + rows % beams).astype(dtype)
            outc = matmul(compact, co_s[:]).astype(dtype)   # (N, D)
            x = h_s[:]
            o = dense(outc, 5 * d, 6 * d, 7 * d)
            x = layer_norm(o, x, 8 * d)
            a = dense(x, 6 * d, 7 * d, 10 * d)
            r = jnp.maximum(a, 0)
            a = dense((r * r).astype(dtype), 7 * d, 8 * d, 11 * d)
            h_s[:] = layer_norm(a, x, 12 * d)

        x = h_s[:]
        f = (wt_ref.shape[-1] - 3 * d) // 2                 # tail = 3D + 2F
        nch = f // d
        h1 = dense(x, 8 * d, 8 * d + f, 14 * d)
        # exact-erf GELU via the polynomial _erf (Mosaic implements neither
        # erf nor erfc, which jax.nn.gelu(approximate=False) lowers through)
        h32 = h1.astype(f32)
        h1 = (0.5 * h32 * (1.0 + _erf(h32 * (2.0 ** -0.5)))).astype(dtype)
        acc = matmul(h1[:, :d], w_tail(3 * d + f, 4 * d + f))
        for c in range(1, nch):
            acc += matmul(h1[:, c * d:(c + 1) * d],
                          w_tail((3 + c) * d + f, (4 + c) * d + f))
        b_lo = 14 * d + f
        h2 = acc.astype(dtype) + b_ref[0, 0, b_lo:b_lo + d].astype(dtype)
        h_s[:] = layer_norm(h2, x, 15 * d + f)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            hidden_out_ref[:] = h_s[:]


def fused_decode_step(hidden0: jax.Array, w_head: jax.Array,
                      w_tail: jax.Array, b_all: jax.Array,
                      self_k: jax.Array, self_v: jax.Array,
                      bias_tn: jax.Array, cross_kd: jax.Array,
                      cross_vc: jax.Array,
                      cross_ks: Optional[jax.Array] = None,
                      cross_vs: Optional[jax.Array] = None,
                      flat_beam: Optional[jax.Array] = None,
                      *, heads: int, beams: int,
                      valid_len: int, eps: float = 1e-5,
                      interpret: Optional[bool] = None
                      ) -> Tuple[jax.Array, ...]:
    """One whole decode step over all layers.

    hidden0 (N, D) embeddings output; self_k/self_v (NL, T, N, D);
    bias_tn (T, N) fp32 additive self-attn bias (NEG_INF on invalid cache
    columns INCLUDING the not-yet-written current column); cross_kd
    (NLc, B, Dh, H*Lp); cross_vc (NLc, B, Lp, H*Dh); valid_len = true
    encoder length L <= Lp. Returns (hidden_out (N, D), k_new (NL, N, D),
    v_new (NL, N, D)) — the caller writes k_new/v_new into the caches at the
    current column.

    int8 KV mode (PRISMER_KV_QUANT, models/roberta.py): cross_kd/cross_vc
    are int8 with (NLc, B, 1, 128) fp32 per-head scales cross_ks/cross_vs
    (quantize_kv_nat) — halves the dominant per-step HBM
    stream; dequantization folds into the tiny per-head q / probability
    rows in-kernel.

    flat_beam (N,) int32 (optional): beam-reorder fold. When given, the
    kernel permutes each layer's self K/V rows (axis N) by flat_beam BEFORE
    the self-attention read — exactly the beam_search cache reorder — and
    additionally returns the permuted caches (self_k_perm, self_v_perm),
    both (NL, T, N, D). The caller then skips its own reorder op: the
    permutation rides on tiles the kernel already holds in VMEM
    (generation.PRISMER_BEAM_PERM=kernel).
    """
    n, d = hidden0.shape
    nl, t = self_k.shape[0], self_k.shape[1]
    nlc, b = cross_kd.shape[0], cross_kd.shape[1]
    dh = d // heads
    lp = cross_vc.shape[2]
    assert n == b * beams and beams <= QP, (n, b, beams)
    assert cross_kd.shape[3] == heads * lp and cross_vc.shape[3] == d
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = hidden0.dtype
    quant = cross_kd.dtype == jnp.int8
    if quant:
        assert cross_ks is not None and cross_vs is not None, \
            "int8 cross-KV needs the per-head scale tensors"

    def cross_idx(i, j):
        layer = jnp.minimum(i, nlc - 1)
        sample = jnp.where(i < nlc, jnp.clip(j - 1, 0, b - 1), b - 1)
        return layer, sample, 0, 0

    import os
    # manual weight/self-cache streaming DEFAULT ON: same-session slope A/B
    # (tools/check_fused_decode_tpu.py --mode fused --slope, b32) measured
    # 2.316 ms/step manual vs 2.377 BlockSpec (and 2.582 before the
    # head/tail weight split) — the whole-layer fetch window beats the
    # one-step BlockSpec lookahead. PRISMER_FUSED_WDMA=0 keeps the
    # BlockSpec path for A/B.
    manual_dma = os.environ.get("PRISMER_FUSED_WDMA", "1") == "1"
    permute = flat_beam is not None
    kern = functools.partial(
        _kernel, heads=heads, dh=dh, nlc=nlc, batch=b, beams=beams,
        valid_len=valid_len, eps=eps, dtype=dtype, manual_dma=manual_dma,
        nl=nl, quant=quant, permute=permute)

    assert w_head.shape[2] == 5 * d, w_head.shape
    f = (w_tail.shape[2] - 3 * d) // 2
    flops_cross = 2 * 2 * nlc * b * (heads * QP) * dh * heads * lp
    flops_dense = 2 * nl * n * d * (8 * d + 2 * f)
    bytes_acc = ((w_head.size + w_tail.size) * w_head.dtype.itemsize
                 + (cross_kd.size + cross_vc.size) * cross_kd.dtype.itemsize
                 + (self_k.size + self_v.size) * self_k.dtype.itemsize)
    if flat_beam is not None:
        # the permuted-cache outputs add one full write of both self caches
        bytes_acc += (self_k.size + self_v.size) * self_k.dtype.itemsize

    if manual_dma:
        wh_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        wt_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        sk_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        sv_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        dma_scratch = [
            pltpu.VMEM((2, d, 5 * d), dtype),
            pltpu.VMEM((2, d, w_tail.shape[2]), dtype),
            pltpu.VMEM((2, t, n, d), dtype),
            pltpu.VMEM((2, t, n, d), dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
        ]
    else:
        wh_spec = pl.BlockSpec((1, d, 5 * d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        wt_spec = pl.BlockSpec((1, d, w_tail.shape[2]),
                               lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        sk_spec = pl.BlockSpec((1, t, n, d), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        sv_spec = pl.BlockSpec((1, t, n, d), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        dma_scratch = []

    grid = (nl, b + 2)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            wh_spec,
            wt_spec,
            # (NL, 1, PB): a (1, 1, PB) block keeps Mosaic's last-two-dims
            # rule satisfied (a 2-D (1, PB) block would not)
            pl.BlockSpec((1, 1, b_all.shape[1]), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            sk_spec,
            sv_spec,
            pl.BlockSpec((t, n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh, heads * lp), cross_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp, d), cross_idx,
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, 1, 1, 128), cross_idx,
                           memory_space=pltpu.VMEM)] * 2 if quant else [])
          + ([pl.BlockSpec((n, 1), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)] if permute else []),
        out_specs=[
            pl.BlockSpec((n, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, t, n, d), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)] * 2 if permute else []),
        out_shape=[
            jax.ShapeDtypeStruct((n, d), dtype),
            jax.ShapeDtypeStruct((nl, n, d), dtype),
            jax.ShapeDtypeStruct((nl, n, d), dtype),
        ] + ([jax.ShapeDtypeStruct((nl, t, n, d), dtype)] * 2
             if permute else []),
        scratch_shapes=[
            pltpu.VMEM((n, d), dtype),              # hidden
            pltpu.VMEM((b * QP, heads * 128), dtype),  # cross-q, strided +
                                                       # lane-padded
            pltpu.VMEM((b * QP, d), dtype),         # cross-out, strided
        ] + dma_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_cross + flops_dense,
            bytes_accessed=bytes_acc,
            transcendentals=nlc * b * heads * QP * lp + nl * t * n * 128,
        ),
        interpret=interpret,
    )(hidden0, w_head, w_tail, b_all[:, None, :], self_k, self_v, bias_tn,
      cross_kd, cross_vc, *((cross_ks, cross_vs) if quant else ()),
      *((flat_beam.astype(jnp.int32).reshape(n, 1),) if permute else ()))
    return tuple(out)
