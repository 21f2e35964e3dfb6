"""Whole-step beam-search bookkeeping in ONE pallas kernel.

Replaces, per decode step, everything in generation.beam_search's loop body
between candidate selection (lm_topk / lazy_top_candidates) and the decoder
step: EOS retirement (gather + dynamic-update + concat + top_k), alive
continuation (top_k + two gathers + seq append), the done-sample freezes, and
the flat beam permutation — ~30 tiny XLA ops per step whose HBM round-trip
latency (~0.4 ms/step at b24, tools/profile_decode_parts.py) dwarfs their
byte count (everything involved is < 20 KB).

All state stays VMEM-resident for the whole update; beam gathers run as 0/1
selector matmuls at Precision.HIGHEST (token ids < 2^24 are exact in f32;
Mosaic's default f32 matmul is ONE bf16 pass — see ops/lm_topk._sdot), and
the two iterative top-k loops reproduce lax.top_k's tie order exactly
(lowest index first). Sequences are carried (N, T) row-major — the (B, K, T)
view used by the XLA path is the same bytes (free bitcast outside).

Bit parity vs the XLA bookkeeping (generation.beam_bookkeeping) is pinned in
tests/test_beam_update.py, including NEG_INF ties, done-sample freezes and
min-length EOS candidates.

Reference path being replaced: the beam bookkeeping HF beam_search performs
on host between model calls (reference inherits it via generate(),
model/modules/roberta.py:358-406).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e7     # generation.NEG_INF
NEG_PAD = -1.0e30    # padding-lane sentinel: below any real candidate


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _sdot(a, b):
    """Exact f32 selector matmul (see ops/lm_topk._sdot: Mosaic's default
    runs f32 operands as one bf16 pass, which would round token ids)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _extract_lane(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x (B, L), idx (B, 1) int -> (B, 1): x[b, idx[b]] (idx in range)."""
    lane = _iota(x.shape, 1)
    return jnp.sum(jnp.where(lane == idx, x, 0.0), axis=1, keepdims=True)


def _kernel(vals_ref, beam_ref, tok_ref, aseq_ref, ascore_ref, fseq_ref,
            fscore_ref, idx_ref, pen_ref,
            out_aseq, out_ascore, out_fseq, out_fscore, out_tok, out_beam,
            *, beams: int, kk: int, eos_id: int, pad_id: int):
    f32 = jnp.float32
    n, t = aseq_ref.shape
    b = n // beams
    index = idx_ref[0]
    pen = pen_ref[0]

    vals = vals_ref[:]                        # (B, KK) f32
    beam = beam_ref[:].astype(f32)            # (B, KK)
    tok = tok_ref[:]                          # (B, KK) i32
    ascore = ascore_ref[:]                    # (B, K) f32
    fscore = fscore_ref[:]                    # (B, K) f32
    aseq = aseq_ref[:].astype(f32)            # (N, T)
    fseq = fseq_ref[:].astype(f32)            # (N, T)

    # ---- done rule on the OLD state (generation.batch_done) ---------------
    worst_fin = jnp.min(fscore, axis=1, keepdims=True)        # (B, 1)
    best_alive = jnp.max(ascore, axis=1, keepdims=True)       # (B, 1)
    done_b = worst_fin >= best_alive / pen                    # (B, 1) bool

    # ---- EOS retirement ----------------------------------------------------
    lane_kk = _iota((b, kk), 1)
    is_eos = tok == eos_id
    pen_scores = vals / pen
    fin_valid = is_eos & (lane_kk < beams) & jnp.logical_not(done_b)
    cand = jnp.where(fin_valid, pen_scores, NEG_INF)          # (B, KK)

    # merged (B, 3K) candidate scores on a 128-lane canvas, concat order
    # [old finished ; EOS candidates] — disjoint-support shift matmuls
    lane128 = _iota((b, 128), 1)
    r_k, c_k = _iota((beams, 128), 0), _iota((beams, 128), 1)
    r_kk, c_kk = _iota((kk, 128), 0), _iota((kk, 128), 1)
    id_k = (c_k == r_k).astype(f32)                           # (K, 128)
    sh_kk = (c_kk == r_kk + beams).astype(f32)                # (KK, 128)
    merged = _sdot(fscore, id_k) + _sdot(cand, sh_kk)
    merged = jnp.where(lane128 < beams + kk, merged, NEG_PAD)

    # iterative top-K (lax.top_k tie order: lowest index first)
    lane_k = _iota((b, beams), 1)
    new_fscore = jnp.zeros((b, beams), f32)
    fin_lane = jnp.zeros((b, beams), f32)     # selected merged lane per slot
    for r in range(beams):
        best = jnp.max(merged, axis=1, keepdims=True)
        jstar = jnp.min(jnp.where(merged == best, lane128, 128), axis=1,
                        keepdims=True)
        slot = lane_k == r
        new_fscore = jnp.where(slot, best, new_fscore)
        fin_lane = jnp.where(slot, jstar.astype(f32), fin_lane)
        merged = jnp.where(lane128 == jstar, NEG_PAD, merged)

    # per-output-row source: old-finished row b*K + lane, or alive row
    # b*K + top_beam[b, lane-K] with EOS written at `index`
    from_alive = fin_lane >= beams                            # (B, K) bool
    src_beam = jnp.zeros((b, beams), f32)
    for r in range(kk):  # src_beam[b,k'] = beam[b, fin_lane-K] where alive
        src_beam = src_beam + jnp.where(
            from_alive & (fin_lane == beams + r),
            _extract_lane(beam, jnp.full((b, 1), r, jnp.int32)), 0.0)
    fin_src = jnp.where(from_alive, src_beam, fin_lane)       # (B, K)

    # route (B, K) lane data to (N, 1) rows: r -> [r // K, r % K]
    rown_b = _iota((n, b), 0) // beams == _iota((n, b), 1)
    s_nb = rown_b.astype(f32)                                 # (N, B)
    lane_nk = _iota((n, beams), 1)
    rowmod = _iota((n, beams), 0) % beams

    def route_bk(x_bk):
        y = _sdot(s_nb, x_bk)                                 # (N, K)
        return jnp.sum(jnp.where(lane_nk == rowmod, y, 0.0), axis=1,
                       keepdims=True)                         # (N, 1)

    fin_src_n = route_bk(fin_src)                             # (N, 1) f32
    from_alive_n = route_bk(from_alive.astype(f32)) > 0.5     # (N, 1)
    done_n = _sdot(s_nb, done_b.astype(f32)) > 0.5            # (N, 1)

    coln = _iota((n, n), 1)
    base = (_iota((n, n), 0) // beams) * beams                # (N, N)
    src_col = base + fin_src_n.astype(jnp.int32)
    p_fin = (jnp.logical_not(from_alive_n) & (coln == src_col)).astype(f32)
    p_al = (from_alive_n & (coln == src_col)).astype(f32)
    nf_seq = _sdot(p_fin, fseq) + _sdot(p_al, aseq)           # (N, T) f32
    colt = _iota((n, t), 1)
    nf_seq = jnp.where(from_alive_n & (colt == index),
                       jnp.float32(eos_id), nf_seq)

    # ---- alive continuation ------------------------------------------------
    cont = jnp.where(is_eos, NEG_INF, vals)                   # (B, KK)
    cont = _sdot(cont, (c_kk == r_kk).astype(f32))            # (B, 128)
    cont = jnp.where(lane128 < kk, cont, NEG_PAD)
    new_ascore = jnp.zeros((b, beams), f32)
    new_beam = jnp.zeros((b, beams), f32)
    new_tok = jnp.zeros((b, beams), f32)
    tok_f = tok.astype(f32)
    for r in range(beams):
        best = jnp.max(cont, axis=1, keepdims=True)
        istar = jnp.min(jnp.where(cont == best, lane128, 128), axis=1,
                        keepdims=True)
        slot = lane_k == r
        new_ascore = jnp.where(slot, best, new_ascore)
        new_beam = jnp.where(slot, _extract_lane(beam, istar), new_beam)
        new_tok = jnp.where(slot, _extract_lane(tok_f, istar), new_tok)
        cont = jnp.where(lane128 == istar, NEG_PAD, cont)

    beam_n = route_bk(new_beam)                               # (N, 1)
    p_b = (coln == base + beam_n.astype(jnp.int32)).astype(f32)
    na_seq = _sdot(p_b, aseq)                                 # (N, T)
    tok_n = route_bk(new_tok)                                 # (N, 1)
    na_seq = jnp.where(colt == index, tok_n, na_seq)

    # ---- freezes + outputs -------------------------------------------------
    out_aseq[:] = jnp.where(done_n, aseq, na_seq).astype(jnp.int32)
    out_fseq[:] = jnp.where(done_n, fseq, nf_seq).astype(jnp.int32)
    out_ascore[:] = jnp.where(done_b, ascore, new_ascore)
    out_fscore[:] = jnp.where(done_b, fscore, new_fscore)
    out_tok[:] = jnp.where(done_b, jnp.float32(pad_id),
                           new_tok).astype(jnp.int32)
    out_beam[:] = (new_beam + (_iota((b, beams), 0) * beams).astype(f32)
                   ).astype(jnp.int32)


def beam_update(vals: jax.Array, beam: jax.Array, tok: jax.Array,
                alive_seqs: jax.Array, alive_scores: jax.Array,
                finished_seqs: jax.Array, finished_scores: jax.Array,
                index: jax.Array, pen: jax.Array, *, eos_token_id: int,
                pad_token_id: int, interpret: bool | None = None
                ) -> Tuple[jax.Array, ...]:
    """One fused beam-search bookkeeping step.

    vals/beam/tok: (B, 2K) top-candidate triple (lm_topk / lazy output);
    alive_seqs/finished_seqs: (N, T) int32 row-major (N = B*K);
    alive_scores/finished_scores: (B, K) f32; index: scalar i32 write
    position; pen: scalar f32 = cur_len ** length_penalty (computed by the
    caller with the same XLA op as the reference path).

    Returns (new_alive_seqs (N,T), new_alive_scores (B,K),
    new_finished_seqs (N,T), new_finished_scores (B,K), new_tokens (B,K),
    flat_beam (B,K)) — bit-identical to generation.beam_bookkeeping.
    """
    b, kk = vals.shape
    n, t = alive_seqs.shape
    beams = n // b
    assert beams * b == n and kk == 2 * beams
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    kern = functools.partial(_kernel, beams=beams, kk=kk,
                             eos_id=eos_token_id, pad_id=pad_token_id)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((n, t), jnp.int32),
            jax.ShapeDtypeStruct((b, beams), jnp.float32),
            jax.ShapeDtypeStruct((n, t), jnp.int32),
            jax.ShapeDtypeStruct((b, beams), jnp.float32),
            jax.ShapeDtypeStruct((b, beams), jnp.int32),
            jax.ShapeDtypeStruct((b, beams), jnp.int32),
        ],
        interpret=interpret,
    )(vals, beam, tok, alive_seqs, alive_scores, finished_seqs,
      finished_scores, index.reshape(1).astype(jnp.int32),
      pen.reshape(1).astype(jnp.float32))
    return tuple(out)
