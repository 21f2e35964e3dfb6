"""Jit-compiled, KV-cached beam search and rank inference.

Replaces the reference's HF `PreTrainedModel.generate` path, which re-runs
the FULL decoder over the whole sequence every step with no KV cache
(reference: model/modules/roberta.py:358-406 has no past_key_values path;
called from model/prismer_caption.py:45-50 and model/prismer_vqa.py:51-57).
Here decoding is a single `lax.while_loop` over one-token cached steps —
O(T) instead of O(T^2) decoder work — with HF beam-search semantics
replicated so generated text matches the reference checkpoints:

  * beams expand to 2K candidates/step; EOS candidates ranked >= K are
    dropped; EOS candidates within top-K retire to the finished set with
    score = sum_logprob / len(seq)**length_penalty; the top-K non-EOS
    candidates continue.
  * MinLengthLogitsProcessor: EOS is masked while cur_len < min_length.
  * early_stopping=False done-rule: a sample is done when its worst finished
    score can no longer be beaten by best_alive / cur_len**penalty.
  * finalize: still-alive beams join the finished pool for samples that
    never finished.

Rank inference (prismer_caption.py:59-112, prismer_vqa.py:64-113) is a
two-pass jitted function over a static padded answer table.

Everything is batch-first, statically shaped, and usable under jit/pjit.
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from prismer_tpu.models.prismer import Prismer
from prismer_tpu.models.roberta import num_valid_targets

NEG_INF = -1.0e7


class BeamState(NamedTuple):
    index: jax.Array          # scalar int32: current total length / write pos
    alive_seqs: jax.Array     # (B, K, T)
    alive_scores: jax.Array   # (B, K) raw sum-logprob
    logits: jax.Array         # (B, K, V) for position index-1 -> selects token
                              # at index; in lm_topk kernel mode this carries
                              # the (B*K, D) LM-head features instead
    cache: Any                # decoder KV cache, batch dim = B*K
    finished_seqs: jax.Array  # (B, K, T)
    finished_scores: jax.Array  # (B, K) length-penalized, -inf empty
    prompt_nonpad: jax.Array  # (B,) prompt non-pad counts


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


def _unflat(x, b, k):
    return x.reshape((b, k) + x.shape[1:])


def _gather_beams(x: jax.Array, beam_idx: jax.Array) -> jax.Array:
    """x: (B, K, ...), beam_idx: (B, K) -> reorder along beam dim."""
    return jnp.take_along_axis(
        x, beam_idx.reshape(beam_idx.shape + (1,) * (x.ndim - 2)), axis=1)


# Self-cache beam reorder implementation, bound at import (trace-time flag,
# A/B via separate processes): 'matmul' replaces the per-step XLA gather
# over the (NL, T, N, D) caches with a 0/1 selector matmul — the same
# gather->matmul conversion that won 1.6-2.3x in
# experts/ops/deform_attn_pallas.py. 'kernel' (fused decode path only)
# folds the reorder into the fused decode kernel, which already streams
# every self K/V tile through VMEM — the separate reorder op disappears
# entirely (ops/fused_decode.py flat_beam). All modes are exact: one 1.0
# per output row. Same-session b24 e2e A/B (2026-08-18): kernel 180.2 vs
# gather 177.6 vs matmul 176.5 img/s (isolated, the reorder op runs at
# only 108-137 GB/s — tools/bench_beam_perm.py); kernel is the default,
# and the non-fused cache layout always uses the gather.
BEAM_PERM_IMPL = os.environ.get("PRISMER_BEAM_PERM", "kernel")

# LM-head + top-2K candidate selection implementation, bound at import
# (trace-time flag, A/B via separate processes). 'kernel' fuses the
# tied-embedding projection AND the whole lazy top-2K selection into one
# pallas kernel (ops/lm_topk.py): the (B, K, V) fp32 logits never hit HBM
# or the while-loop carry (the state carries the (N, D) LM-head features
# instead), and the ~70 tiny latency-bound selection ops per step collapse
# into the kernel's VMEM-resident rounds. Engages only when the serving
# packed_decode collection provides the padded embedding layout
# (prismer.prepare_serving_variables) on the fused decode path; selection
# is index-identical to the XLA path (values to fp32 ulp).
# ADOPTED as default after the same-session b24 e2e A/B (2026-08-18):
# kernel 231.9 vs xla 180.4 img/s (+28.5%, MFU 0.279 -> 0.359) — the win is
# far larger than the ~9 ms LM-head+top-k attribution because the fp32
# (B, K, V) logits also stop riding the while-loop carry (14.5 MB/step
# read+write at b24). Selection indices are exact vs the XLA path on-chip
# (tools/check_lm_topk_tpu.py; requires the Precision.HIGHEST selector fix).
LM_TOPK_IMPL = os.environ.get("PRISMER_LM_TOPK", "kernel")

# Beam bookkeeping implementation, bound at import (trace-time flag, A/B
# via separate processes). 'kernel' runs the whole between-steps update
# (EOS retirement, continuation top-k, seq appends, done freezes, flat
# beam permutation) as ONE pallas kernel (ops/beam_update.py) instead of
# ~30 tiny latency-bound XLA ops; bit-identical to the XLA path
# (tests/test_beam_update.py pins it, and every beam-search test exercises
# it — interpret-mode on CPU).
BEAM_UPDATE_IMPL = os.environ.get("PRISMER_BEAM_UPDATE", "kernel")


def _permute_cache_rows(x: jax.Array, flat_beam: jax.Array) -> jax.Array:
    """Reorder axis 2 (the N = B*K row axis) of a (NL, T, N, D) cache by
    flat_beam. 'matmul' mode streams the tensor through the MXU instead of
    the gather unit; bit-exact (f32 accumulate of a single 1.0*v term,
    cast back to the storage dtype)."""
    n = x.shape[2]
    if BEAM_PERM_IMPL == "matmul":
        p = (flat_beam[:, None] == jnp.arange(n)[None, :]).astype(x.dtype)
        return jnp.einsum("nm,ltmd->ltnd", p, x)
    return jnp.take(x, flat_beam, axis=2)


def exact_top_k(x: jax.Array, kk: int,
                block: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis, bit-identical to jax.lax.top_k on
    FINITE inputs including tie order (equal values yield the lower index
    first).

    Narrow rows (< 4 blocks): kk sequential argmax passes — k cheap row
    reductions instead of a full top-k sort network.

    Wide rows (the (B, K*V) ~ 150k-wide beam-candidate matrix): two-stage
    block scheme. One full pass builds per-block maxima; each of the kk
    rounds then touches only the (B, n_blocks) maxima and the ONE selected
    block per row (~30x less data than a full-row argmax round; the full-row
    variant measured ~0.6 ms/decode-step at b32). Tie order is preserved:
    the lowest tied block wins the block argmax and the lowest tied lane
    wins within the block, which is exactly the flat lowest index."""
    # Guard the -inf contract mechanically: incoming -inf is clamped to
    # finfo.min (one VPU select, bit-identical results for finite inputs),
    # so a future caller masking with -inf cannot silently produce
    # duplicate indices.
    x = jnp.where(jnp.isneginf(x), jnp.finfo(x.dtype).min, x)
    b, w = x.shape
    rows = jnp.arange(b)
    vals, idxs = [], []

    if w < 4 * block:
        cur = x
        for _ in range(kk):
            i = jnp.argmax(cur, axis=-1)
            vals.append(jnp.take_along_axis(cur, i[:, None], axis=-1)[:, 0])
            idxs.append(i)
            cur = cur.at[rows, i].set(-jnp.inf)
        return (jnp.stack(vals, axis=1),
                jnp.stack(idxs, axis=1).astype(jnp.int32))

    nb = -(-w // block)
    if nb * block != w:
        # padding lanes sit at the highest flat indices, so on exact ties
        # every real lane still wins (lower index first)
        x = jnp.pad(x, ((0, 0), (0, nb * block - w)),
                    constant_values=jnp.finfo(x.dtype).min)
    x3 = x.reshape(b, nb, block)
    bm = jnp.max(x3, axis=2)                                 # (B, nb)
    lane = jnp.arange(block)[None, :]                        # (1, block)
    taken = []                                               # [(jstar, istar)]
    for _ in range(kk):
        jstar = jnp.argmax(bm, axis=1)                       # (B,)
        blk = x3[rows, jstar]                                # (B, block)
        # x3 is NEVER scattered into (a .at[].set on the (B, W) tensor
        # copies the full ~150k-lane candidate matrix every round — ~6
        # full-logit copies per decode step, the dominant top-k cost).
        # Instead, re-mask the lanes already extracted from THIS block out
        # of the fresh gather: O(kk^2) tiny (B, block) selects.
        for jp, ip in taken:
            blk = jnp.where((jp == jstar)[:, None] & (lane == ip[:, None]),
                            -jnp.inf, blk)
        istar = jnp.argmax(blk, axis=1)
        vals.append(jnp.take_along_axis(blk, istar[:, None], axis=1)[:, 0])
        idxs.append(jstar * block + istar)
        taken.append((jstar, istar))
        blk = blk.at[rows, istar].set(-jnp.inf)
        bm = bm.at[rows, jstar].set(jnp.max(blk, axis=1))
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1).astype(jnp.int32)


def lazy_top_candidates(logits: jax.Array, alive_scores: jax.Array, kk: int,
                        eos_token_id: int, mask_eos: jax.Array,
                        block: int = 1024
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact top-kk of the beam-candidate matrix
        cand[b, k, v] = alive_scores[b, k] + log_softmax(logits)[b, k, v]
    (with the EOS lane forced to alive + NEG_INF when `mask_eos`, the
    min-length rule) WITHOUT materializing log-probs or the (B, K*V)
    candidate matrix.

    The materialized pipeline costs ~5 full passes over the (B, K, V) fp32
    logits per decode step (log_softmax write+read, candidate write+read,
    pad copy, block-maxima read). Here the only big-tensor work is two fused
    reads: the log-sum-exp reduce and the per-block maxima of the raw
    logits. Because the per-row transform f(x) = alive + ((x - m) - lse) is
    monotone non-decreasing, f(blockmax(x)) IS each block's exact candidate
    maximum, and all arg-selection happens in f-space on (B, K*nb) maxima +
    one gathered block per round — bit-identical to lax.top_k over the
    materialized matrix, including tie order (lowest flat index first) and
    the elementwise fp32 rounding of cand (same op order as
    alive[:, :, None] + log_softmax(logits)).

    Returns (vals (B, kk), beam (B, kk), token (B, kk)) — the flat-index
    decomposition top_flat // V, top_flat % V done directly.
    """
    b, k, v = logits.shape
    f32 = jnp.float32
    rows = jnp.arange(b)
    lane = jnp.arange(block)[None, :]
    lanes_v = jnp.arange(v)

    # big read 1: log_softmax's internals (same op order: shift by the row
    # max, log of the exp-sum of the shifted values)
    m = jnp.max(logits, axis=-1)                             # (B, K)
    ls = jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1))

    # big read 2: per-block maxima of the raw logits, EOS lane excluded
    # while masked (the select fuses into the read)
    xm = jnp.where(mask_eos & (lanes_v == eos_token_id)[None, None, :],
                   -jnp.inf, logits)
    nfull = v // block
    bmx = jnp.max(xm[..., :nfull * block].reshape(b, k, nfull, block),
                  axis=-1)
    if nfull * block < v:
        bmx = jnp.concatenate(
            [bmx, jnp.max(xm[..., nfull * block:], axis=-1, keepdims=True)],
            axis=-1)
    nb = bmx.shape[-1]

    # f-space block maxima; the masked EOS lane's candidate is exactly
    # alive + NEG_INF (it re-enters its block's max here, so selection is
    # exact even in the degenerate all-below-NEG_INF case)
    bmf = alive_scores[:, :, None] + ((bmx - m[:, :, None])
                                      - ls[:, :, None])     # (B, K, nb)
    eb = eos_token_id // block
    eos_val = jnp.where(mask_eos, alive_scores + NEG_INF, -jnp.inf)
    bmf = bmf.at[:, :, eb].max(eos_val)
    bmf2 = bmf.reshape(b, k * nb)

    vals, beams, toks = [], [], []
    taken = []
    for _ in range(kk):
        jstar = jnp.argmax(bmf2, axis=1)                     # (B,)
        kb, jb = jstar // nb, jstar % nb
        v0 = jb * block
        idx = v0[:, None] + lane                             # (B, block)
        xr = logits[rows[:, None], kb[:, None], jnp.minimum(idx, v - 1)]
        a_r = alive_scores[rows, kb][:, None]
        fb = a_r + ((xr - m[rows, kb][:, None]) - ls[rows, kb][:, None])
        fb = jnp.where(idx < v, fb, -jnp.inf)                # clamped dups
        fb = jnp.where(mask_eos & (idx == eos_token_id), a_r + NEG_INF, fb)
        for jp, ip in taken:                                 # prior rounds
            fb = jnp.where((jp == jstar)[:, None] & (lane == ip[:, None]),
                           -jnp.inf, fb)
        istar = jnp.argmax(fb, axis=1)
        vals.append(jnp.take_along_axis(fb, istar[:, None], axis=1)[:, 0])
        beams.append(kb)
        toks.append(v0 + istar)
        taken.append((jstar, istar))
        fb = fb.at[rows, istar].set(-jnp.inf)
        bmf2 = bmf2.at[rows, jstar].set(jnp.max(fb, axis=1))
    return (jnp.stack(vals, axis=1).astype(f32),
            jnp.stack(beams, axis=1).astype(jnp.int32),
            jnp.stack(toks, axis=1).astype(jnp.int32))


def beam_bookkeeping(top_scores: jax.Array, top_beam: jax.Array,
                     top_token: jax.Array, alive_seqs: jax.Array,
                     alive_scores: jax.Array, finished_seqs: jax.Array,
                     finished_scores: jax.Array, index: jax.Array,
                     pen: jax.Array, *, eos_token_id: int, pad_token_id: int
                     ) -> Tuple[jax.Array, ...]:
    """XLA beam bookkeeping: everything between candidate selection and the
    decoder step. top_*: (B, 2K); alive/finished seqs (B, K, T), scores
    (B, K); index: scalar write position; pen: cur_len ** length_penalty.

    Returns (new_alive_seqs, new_alive_scores, new_finished_seqs,
    new_finished_scores, new_tokens (B, K), flat_beam (B, K)). The pallas
    twin (ops/beam_update.beam_update) is pinned bit-identical to this."""
    b, k, t = alive_seqs.shape
    is_eos = top_token == eos_token_id
    rank = jnp.broadcast_to(jnp.arange(2 * k)[None, :], (b, 2 * k))

    # done rule on the OLD state (generation.batch_done)
    worst_finished = jnp.min(finished_scores, axis=1)
    best_alive = jnp.max(alive_scores, axis=1)
    done_now = worst_finished >= best_alive / pen

    # --- retire EOS candidates within top-K rank -----------------------
    pen_scores = top_scores / pen
    fin_cand_valid = is_eos & (rank < k) & ~done_now[:, None]
    fin_cand_scores = jnp.where(fin_cand_valid, pen_scores, NEG_INF)
    fin_cand_seqs = _gather_beams(alive_seqs, top_beam)     # (B, 2K, T)
    # write the EOS at position index
    fin_cand_seqs = jax.lax.dynamic_update_slice_in_dim(
        fin_cand_seqs,
        jnp.full((b, 2 * k, 1), eos_token_id, jnp.int32),
        index, axis=2)

    merged_scores = jnp.concatenate(
        [finished_scores, fin_cand_scores], axis=1)         # (B, 3K)
    merged_seqs = jnp.concatenate(
        [finished_seqs, fin_cand_seqs], axis=1)             # (B, 3K, T)
    new_fin_scores, fin_idx = jax.lax.top_k(merged_scores, k)
    new_fin_seqs = _gather_beams(merged_seqs, fin_idx)

    # --- continue with top-K non-EOS candidates ------------------------
    cont_scores = jnp.where(is_eos, NEG_INF, top_scores)
    new_alive_scores, cont_idx = jax.lax.top_k(cont_scores, k)  # (B, K)
    new_alive_beam = jnp.take_along_axis(top_beam, cont_idx, axis=1)
    new_tokens = jnp.take_along_axis(top_token, cont_idx, axis=1)

    new_alive_seqs = _gather_beams(alive_seqs, new_alive_beam)
    new_alive_seqs = jax.lax.dynamic_update_slice_in_dim(
        new_alive_seqs, new_tokens[:, :, None].astype(jnp.int32),
        index, axis=2)

    # freeze state for done samples
    keep = done_now[:, None]
    new_alive_scores = jnp.where(keep, alive_scores, new_alive_scores)
    new_alive_seqs = jnp.where(keep[:, :, None], alive_seqs,
                               new_alive_seqs)
    new_fin_scores = jnp.where(keep, finished_scores, new_fin_scores)
    new_fin_seqs = jnp.where(keep[:, :, None], finished_seqs,
                             new_fin_seqs)
    new_tokens = jnp.where(keep, pad_token_id, new_tokens)

    flat_beam = new_alive_beam + jnp.arange(b)[:, None] * k  # (B, K)
    return (new_alive_seqs, new_alive_scores, new_fin_seqs, new_fin_scores,
            new_tokens, flat_beam)


def beam_search(model: Prismer, variables: Dict[str, Any],
                encoder_hidden_states: jax.Array, prompt_ids: jax.Array,
                prompt_mask: jax.Array, *, num_beams: int, max_length: int,
                min_length: int, length_penalty: float = 1.0,
                eos_token_id: int = 2, pad_token_id: int = 1
                ) -> Tuple[jax.Array, jax.Array]:
    """Returns (sequences (B, max_length), scores (B,)).

    `max_length`/`min_length` count TOTAL length including the prompt
    (HF semantics; reference caption: max 20 / min 8 from a ~5-token prefix,
    prismer_caption.py:45-50; VQA: prompt_len+10 / +2 with length_penalty=-1,
    prismer_vqa.py:51-57)."""
    b, p = prompt_ids.shape
    k = num_beams
    t = max_length
    assert p < t, "prompt longer than max_length"

    from prismer_tpu.models.roberta import (use_fused_decode, fused_rows_ok,
                                            fused_dims_ok)
    cfg_ = getattr(model, "cfg", None)  # beam-search test stubs carry none
    dims_ok = fused_dims_ok(cfg_.decoder if cfg_ is not None else None)
    if use_fused_decode() and dims_ok and not fused_rows_ok(b * k):
        # Mosaic 8-row alignment (roberta.fused_rows_ok): rather than fall
        # back to the slower XLA decode path for the whole batch (the round-4
        # prismer_huge b4 perf cliff), pad the BATCH with copies of sample 0
        # until N = B'*K is 8-aligned and slice the outputs back. Every
        # per-sample computation in beam search is independent (per-(B,K)
        # top-k/bookkeeping, per-sample cross-KV, per-row self-attn), so the
        # real rows are bit-identical to the unpadded fused run; the padded
        # rows trace sample 0's trajectory, so they can't extend the
        # while_loop beyond what a real duplicate would.
        bp = b + 1
        while (bp * k) % 8 != 0:
            bp += 1
        pad = bp - b
        rep = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0)
        seqs, scores = beam_search(
            model, variables, rep(encoder_hidden_states), rep(prompt_ids),
            rep(prompt_mask), num_beams=num_beams, max_length=max_length,
            min_length=min_length, length_penalty=length_penalty,
            eos_token_id=eos_token_id, pad_token_id=pad_token_id)
        return seqs[:b], scores[:b]

    packed = {}
    if "packed_decode" in variables:
        packed = variables["packed_decode"].get("text_decoder", {})
    # Mosaic gates (roberta.fused_rows_ok / fused_dims_ok): misaligned B*K
    # row counts or non-128-lane model dims take the XLA paths on TPU for
    # the whole kernel serving stack (misaligned rows on an aligned-dims
    # model are already fixed by the batch padding above)
    rows_ok = fused_rows_ok(b * k) and dims_ok
    use_lm_kernel = (LM_TOPK_IMPL == "kernel" and "emb_tp" in packed
                     and use_fused_decode() and rows_ok)

    # tile the prompt to B*K rows; encoder states stay untiled — cross-attn
    # K/V are projected once per sample inside init_cache (beams=k)
    tile = lambda x: jnp.repeat(x, k, axis=0)
    ids_tiled = tile(prompt_ids)
    mask_tiled = tile(prompt_mask)

    # kernel mode: the loop state carries the (N, D) LM-head FEATURES, not
    # logits — the fused kernel projects + selects in one pass per step
    last_logits, cache = model.apply(
        variables, ids_tiled, mask_tiled, encoder_hidden_states, t, k,
        return_h=use_lm_kernel, method=Prismer.init_cache)
    vocab = (packed["emb_t"].shape[1] if use_lm_kernel
             else last_logits.shape[-1])

    alive_seqs = jnp.full((b, k, t), pad_token_id, dtype=jnp.int32)
    alive_seqs = alive_seqs.at[:, :, :p].set(prompt_ids[:, None, :])
    alive_scores = jnp.tile(
        jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32), (b, 1))

    state = BeamState(
        index=jnp.asarray(p, jnp.int32),
        alive_seqs=alive_seqs,
        alive_scores=alive_scores,
        logits=(last_logits if use_lm_kernel
                else _unflat(last_logits, b, k)),
        cache=cache,
        finished_seqs=jnp.full((b, k, t), pad_token_id, dtype=jnp.int32),
        finished_scores=jnp.full((b, k), NEG_INF, jnp.float32),
        prompt_nonpad=jnp.sum(prompt_mask, axis=1).astype(jnp.int32),
    )

    def batch_done(st: BeamState) -> jax.Array:
        """(B,) early_stopping=False rule."""
        worst_finished = jnp.min(st.finished_scores, axis=1)
        best_alive = jnp.max(st.alive_scores, axis=1)
        cur_len = st.index.astype(jnp.float32)
        best_possible = best_alive / (cur_len ** length_penalty)
        return worst_finished >= best_possible

    def cond(st: BeamState) -> jax.Array:
        return jnp.logical_and(st.index < t,
                               jnp.logical_not(jnp.all(batch_done(st))))

    def body(st: BeamState) -> BeamState:
        # lazy exact top-2K of alive_scores + log_softmax(logits) with the
        # min-length EOS mask — never materializes log-probs or the
        # (B, K*V) candidate matrix (two fused logits reads per step
        # instead of ~5 passes; bit-identical selection)
        if use_lm_kernel:
            from prismer_tpu.ops.lm_topk import lm_topk
            top_scores, top_beam, top_token = lm_topk(
                st.logits, packed["emb_tp"], packed["lm_bias_p"],
                st.alive_scores, st.index < min_length, vocab=vocab,
                beams=k, kk=2 * k, eos_token_id=eos_token_id)
        else:
            top_scores, top_beam, top_token = lazy_top_candidates(
                st.logits, st.alive_scores, 2 * k, eos_token_id,
                st.index < min_length)

        cur_len = st.index.astype(jnp.float32)
        pen = cur_len ** length_penalty
        args = (top_scores, top_beam, top_token)
        if BEAM_UPDATE_IMPL == "kernel" and rows_ok:
            # whole bookkeeping step as ONE pallas kernel — the (B,K,T) /
            # (N,T) views are the same bytes (free bitcast reshapes)
            from prismer_tpu.ops.beam_update import beam_update
            (na_seqs, new_alive_scores, nf_seqs, new_fin_scores, new_tokens,
             flat_bk) = beam_update(
                *args, st.alive_seqs.reshape(b * k, t), st.alive_scores,
                st.finished_seqs.reshape(b * k, t), st.finished_scores,
                st.index, pen, eos_token_id=eos_token_id,
                pad_token_id=pad_token_id)
            new_alive_seqs = na_seqs.reshape(b, k, t)
            new_fin_seqs = nf_seqs.reshape(b, k, t)
        else:
            (new_alive_seqs, new_alive_scores, new_fin_seqs, new_fin_scores,
             new_tokens, flat_bk) = beam_bookkeeping(
                *args, st.alive_seqs, st.alive_scores, st.finished_seqs,
                st.finished_scores, st.index, pen,
                eos_token_id=eos_token_id, pad_token_id=pad_token_id)

        # --- reorder cache and take one decode step ------------------------
        # only the self-attention K/V move with beams; cross K/V rows are
        # identical within a sample's beam group (reordering them would be a
        # multi-hundred-MB no-op every step)
        flat_beam = flat_bk.reshape(-1)                         # (B*K,)
        perm = None
        if "self_k_tn" in st.cache:  # fused layout (NL, T, N, D): N = axis 2
            if BEAM_PERM_IMPL == "kernel":
                # fold the reorder into the fused decode kernel, which
                # already holds every (T, N, D) tile in VMEM for the
                # attention read (ops/fused_decode.py flat_beam)
                cache = st.cache
                perm = flat_beam
            else:
                cache = dict(
                    st.cache,
                    self_k_tn=_permute_cache_rows(st.cache["self_k_tn"],
                                                  flat_beam),
                    self_v_tn=_permute_cache_rows(st.cache["self_v_tn"],
                                                  flat_beam))
        else:
            cache = dict(
                st.cache,
                self_kt=jnp.take(st.cache["self_kt"], flat_beam, axis=1),
                self_v=jnp.take(st.cache["self_v"], flat_beam, axis=1))

        pos_ids = (st.prompt_nonpad[:, None] + (st.index - p) + 1
                   + pad_token_id)  # (B, 1) broadcast over beams
        pos_ids = jnp.broadcast_to(pos_ids, (b, k)).reshape(-1)

        positions = jnp.arange(t)[None, :]
        key_mask_b = jnp.where(
            positions < p,
            jnp.pad(prompt_mask, ((0, 0), (0, t - p))),
            (positions <= st.index).astype(prompt_mask.dtype))  # (B, T)
        key_mask = jnp.repeat(key_mask_b, k, axis=0)

        step_logits, cache = model.apply(
            variables, new_tokens.reshape(-1), st.index, pos_ids,
            key_mask, cache, k, encoder_hidden_states.shape[1], perm,
            use_lm_kernel, method=Prismer.decode_step)

        return BeamState(
            index=st.index + 1,
            alive_seqs=new_alive_seqs,
            alive_scores=new_alive_scores,
            logits=(step_logits if use_lm_kernel
                    else _unflat(step_logits, b, k)),
            cache=cache,
            finished_seqs=new_fin_seqs,
            finished_scores=new_fin_scores,
            prompt_nonpad=st.prompt_nonpad,
        )

    state = jax.lax.while_loop(cond, body, state)

    # finalize: alive beams join the pool for samples that never finished
    final_len = state.index.astype(jnp.float32)
    alive_pen = state.alive_scores / (final_len ** length_penalty)
    not_done = jnp.logical_not(batch_done(state))
    alive_pen = jnp.where(not_done[:, None], alive_pen, NEG_INF)
    all_scores = jnp.concatenate([state.finished_scores, alive_pen], axis=1)
    all_seqs = jnp.concatenate([state.finished_seqs, state.alive_seqs], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    seqs = jnp.take_along_axis(all_seqs, best[:, None, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(all_scores, best[:, None], axis=1)[:, 0]
    return seqs, scores


def rank_answers(model: Prismer, variables: Dict[str, Any],
                 encoder_hidden_states: jax.Array, prompt_ids: jax.Array,
                 prompt_mask: jax.Array, answer_ids: jax.Array,
                 answer_mask: jax.Array, *, k_test: int,
                 pad_token_id: int = 1) -> jax.Array:
    """Two-pass rank inference (prismer_caption.py:59-112, prismer_vqa.py:64-113).

    answer_ids/mask: (A, La) padded candidate answers (tokenized with
    add_special_tokens=False, trailing '</s>'). Returns (B,) best answer ids.

    Pass 1: decoder over the prompt; softmax of the last position's logits,
    gathered at each answer's first token; top-k_test candidates per sample.
    Pass 2: decoder over [prompt ; answer] for each candidate; candidates are
    scored by length-normalized label-smoothed log-prob and argmax'd."""
    b, p = prompt_ids.shape
    a, la = answer_ids.shape

    logits = model.apply(variables, prompt_ids, prompt_mask,
                         encoder_hidden_states,
                         method=Prismer.decode_logits)
    probs = jax.nn.softmax(logits[:, -1, :], axis=-1)
    first_tok_prob = probs[:, answer_ids[:, 0]]          # (B, A)
    _, topk_ids = jax.lax.top_k(first_tok_prob, k_test)  # (B, k)

    cand_ids = answer_ids[topk_ids]        # (B, k, La)
    cand_mask = answer_mask[topk_ids]      # (B, k, La)

    full_ids = jnp.concatenate([
        jnp.broadcast_to(prompt_ids[:, None, :], (b, k_test, p)),
        cand_ids], axis=2).reshape(b * k_test, p + la)
    full_mask = jnp.concatenate([
        jnp.broadcast_to(prompt_mask[:, None, :], (b, k_test, p)),
        cand_mask], axis=2).reshape(b * k_test, p + la)

    targets = jnp.where(full_ids == pad_token_id, -100, full_ids)
    targets = targets.at[:, :p].set(-100)

    # encoder states stay UNTILED: cross-K/V are projected once per sample
    # and broadcast over the k_test candidate rows (attend_grouped_full) —
    # tiling here re-projected them k_test times (~0.5 TFLOP/sample wasted)
    loss = model.apply(variables, full_ids, full_mask,
                       encoder_hidden_states, targets, cross_groups=k_test,
                       method=Prismer.decode_loss)
    denom = jnp.maximum(num_valid_targets(targets), 1)
    scores = (-loss / denom).reshape(b, k_test)
    best = jnp.argmax(scores, axis=1)
    return jnp.take_along_axis(topk_ids, best[:, None], axis=1)[:, 0]
