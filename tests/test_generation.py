"""Beam-search / rank-inference tests.

The jitted, KV-cached `lax.while_loop` beam search is cross-checked against a
naive python implementation of the same (HF-style) semantics that re-runs the
full decoder every step — exactly what the reference does at runtime
(roberta.py has no KV cache). Agreement proves the cache, masking, position
ids, and beam bookkeeping introduce no drift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.config import PrismerConfig
from prismer_tpu.models.generation import beam_search, rank_answers
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.models.roberta import label_smoothed_loss, num_valid_targets
from tests.test_models import tiny_decoder, tiny_vision, make_expert_inputs

NEG_INF = -1.0e7


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    vis = tiny_vision()
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 128, (2, 4)).astype(np.int32))
    mask = jnp.ones((2, 4), dtype=jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    enc = model.apply(variables, inputs, method=Prismer.encode)
    return model, cfg, variables, np.asarray(enc)


def naive_beam_search(model, variables, enc, prompt_ids, prompt_mask, *,
                      num_beams, max_length, min_length, length_penalty,
                      eos, pad):
    """Full-forward (cache-less) beam search with the documented semantics."""
    b, p = prompt_ids.shape
    results, scores_out = [], []

    def score_fn(seq_ids, seq_mask, enc_row):
        logits = model.apply(
            variables, jnp.asarray(seq_ids)[None], jnp.asarray(seq_mask)[None],
            jnp.asarray(enc_row)[None], method=Prismer.decode_logits)
        return np.array(jax.nn.log_softmax(logits[0, -1], axis=-1))

    for i in range(b):
        beams = [(list(prompt_ids[i]), list(prompt_mask[i]),
                  0.0 if j == 0 else NEG_INF) for j in range(num_beams)]
        finished = []  # (penalized_score, seq)
        cur_len = p

        def done():
            if len(finished) < num_beams:
                return False
            worst = min(s for s, _ in finished)
            best_alive = max(s for _, _, s in beams)
            return worst >= best_alive / (cur_len ** length_penalty)

        while cur_len < max_length and not done():
            cands = []
            for bi, (seq, m, sc) in enumerate(beams):
                lp = score_fn(seq, m, enc[i])
                if cur_len < min_length:
                    lp[eos] = NEG_INF
                for tok in np.argsort(lp)[::-1][:2 * num_beams]:
                    cands.append((sc + lp[tok], bi, int(tok)))
            cands.sort(key=lambda x: -x[0])
            cands = cands[:2 * num_beams]
            next_beams = []
            for rank, (sc, bi, tok) in enumerate(cands):
                if tok == eos:
                    if rank < num_beams:
                        finished.append(
                            (sc / (cur_len ** length_penalty),
                             beams[bi][0] + [eos]))
                else:
                    next_beams.append((beams[bi][0] + [tok],
                                       beams[bi][1] + [1], sc))
                if len(next_beams) == num_beams:
                    break
            beams = next_beams
            cur_len += 1
            finished.sort(key=lambda x: -x[0])
            finished = finished[:num_beams]

        if not done():
            for seq, _, sc in beams:
                finished.append((sc / (cur_len ** length_penalty), seq))
        finished.sort(key=lambda x: -x[0])
        best_score, best_seq = finished[0]
        best_seq = best_seq + [pad] * (max_length - len(best_seq))
        results.append(best_seq[:max_length])
        scores_out.append(best_score)
    return np.asarray(results), np.asarray(scores_out)


@pytest.mark.parametrize("num_beams,length_penalty,min_length", [
    (1, 1.0, 0), (3, 1.0, 6), (3, -1.0, 5),
])
def test_beam_search_matches_naive(setup, num_beams, length_penalty, min_length):
    model, cfg, variables, enc = setup
    rng = np.random.default_rng(3)
    prompt = rng.integers(4, 128, (2, 3)).astype(np.int32)
    prompt[1, 2] = cfg.decoder.pad_token_id
    mask = (prompt != cfg.decoder.pad_token_id).astype(np.int32)
    kw = dict(num_beams=num_beams, max_length=10, min_length=min_length,
              length_penalty=length_penalty,
              eos_token_id=cfg.decoder.eos_token_id,
              pad_token_id=cfg.decoder.pad_token_id)

    got_seqs, got_scores = beam_search(
        model, variables, jnp.asarray(enc), jnp.asarray(prompt),
        jnp.asarray(mask), **kw)
    want_seqs, want_scores = naive_beam_search(
        model, variables, enc, prompt, mask, num_beams=num_beams,
        max_length=10, min_length=min_length, length_penalty=length_penalty,
        eos=cfg.decoder.eos_token_id, pad=cfg.decoder.pad_token_id)

    np.testing.assert_allclose(np.asarray(got_scores), want_scores,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_seqs), want_seqs)


def test_beam_search_jits(setup):
    model, cfg, variables, enc = setup
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(4, 128, (2, 3)).astype(np.int32))
    mask = jnp.ones((2, 3), dtype=jnp.int32)

    fn = jax.jit(lambda v, e, p, m: beam_search(
        model, v, e, p, m, num_beams=3, max_length=12, min_length=4,
        length_penalty=1.0, eos_token_id=cfg.decoder.eos_token_id,
        pad_token_id=cfg.decoder.pad_token_id))
    seqs, scores = fn(variables, jnp.asarray(enc), prompt, mask)
    assert seqs.shape == (2, 12)
    assert scores.shape == (2,)


def test_rank_answers_matches_naive(setup):
    model, cfg, variables, enc = setup
    rng = np.random.default_rng(5)
    b, p = 2, 4
    a, la, k = 7, 3, 4
    pad = cfg.decoder.pad_token_id

    prompt = rng.integers(4, 128, (b, p)).astype(np.int32)
    pmask = np.ones((b, p), dtype=np.int32)
    ans = rng.integers(4, 128, (a, la)).astype(np.int32)
    amask = np.ones((a, la), dtype=np.int32)
    ans[2, 2] = pad
    amask[2, 2] = 0

    got = rank_answers(model, variables, jnp.asarray(enc),
                       jnp.asarray(prompt), jnp.asarray(pmask),
                       jnp.asarray(ans), jnp.asarray(amask),
                       k_test=k, pad_token_id=pad)

    # naive two-pass
    logits = model.apply(variables, jnp.asarray(prompt), jnp.asarray(pmask),
                         jnp.asarray(enc), method=Prismer.decode_logits)
    probs = np.asarray(jax.nn.softmax(logits[:, -1], axis=-1))
    first = probs[:, ans[:, 0]]
    want = []
    for i in range(b):
        topk = np.argsort(first[i])[::-1][:k]
        best_score, best_id = -np.inf, None
        for cand in topk:
            ids = np.concatenate([prompt[i], ans[cand]])[None]
            m = np.concatenate([pmask[i], amask[cand]])[None]
            tgt = np.where(ids == pad, -100, ids)
            tgt[:, :p] = -100
            lg = model.apply(variables, jnp.asarray(ids), jnp.asarray(m),
                             jnp.asarray(enc[i:i + 1]),
                             method=Prismer.decode_logits)
            loss = float(label_smoothed_loss(lg, jnp.asarray(tgt))[0])
            n = int(num_valid_targets(jnp.asarray(tgt))[0])
            score = -loss / n
            if score > best_score:
                best_score, best_id = score, cand
        want.append(best_id)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_exact_top_k_matches_lax_top_k():
    """exact_top_k must be bit-identical to jax.lax.top_k, tie order
    included (lower index first on equal values)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prismer_tpu.models.generation import exact_top_k

    rng = np.random.default_rng(0)
    # random values, plus adversarial ties: duplicated maxima, constant
    # rows, -inf rows
    x = rng.standard_normal((8, 997)).astype(np.float32)
    x[0, 100] = x[0, 50] = x[0].max() + 1.0      # duplicate global max
    x[1, :] = 0.0                                 # all-tied row
    x[2, :] = -1.0e7                              # all-dead-beam row (the
    # finite NEG_INF sentinel beam search actually uses; true -inf rows are
    # out of contract -- see the exact_top_k docstring)
    x[3, -1] = x[3].max() + 1.0                   # max at the last column
    xj = jnp.asarray(x)
    for kk in (1, 3, 6):
        v_ref, i_ref = jax.lax.top_k(xj, kk)
        v, i = exact_top_k(xj, kk)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))


def test_exact_top_k_block_path_matches_lax_top_k():
    """The wide-row two-stage block path must also be bit-identical to
    lax.top_k, including cross-block ties, within-block ties, tied block
    maxima, and values in the padding-adjacent tail."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prismer_tpu.models.generation import exact_top_k

    rng = np.random.default_rng(1)
    w = 150795  # the b32 beam-candidate width (3 * 50265), not block-aligned
    x = rng.standard_normal((4, w)).astype(np.float32)
    m = x.max() + 1.0
    x[0, 10] = x[0, 5000] = x[0, 149000] = m   # tie across three blocks
    x[1, 2048] = x[1, 2049] = m                # tie within one block
    x[2, :] = -1.0e7                           # all-tied dead row
    x[3, w - 1] = m                            # max at the very last lane
    xj = jnp.asarray(x)
    for kk in (1, 6):
        v_ref, i_ref = jax.lax.top_k(xj, kk)
        v, i = exact_top_k(xj, kk)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    # small-block override exercises padding + many blocks on the same data
    v, i = exact_top_k(xj[:, :5000], 4, block=512)
    v_ref, i_ref = jax.lax.top_k(xj[:, :5000], 4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_lazy_top_candidates_matches_materialized():
    """lazy_top_candidates must be bit-identical (values AND flat-index tie
    order) to materializing alive + log_softmax(logits) with the min-length
    EOS mask and running lax.top_k — including rounding-collision ties
    (distinct logits collapsing to equal candidates after the row-constant
    adds), the clamped tail block, and the masked-EOS lane."""
    import jax
    import jax.numpy as jnp

    from prismer_tpu.models.generation import NEG_INF, lazy_top_candidates

    rng = np.random.default_rng(11)
    b, k, kk, eos = 3, 3, 6, 2

    for v, block, mask in [(5003, 512, True), (5003, 512, False),
                           (4096, 512, True), (700, 128, False),
                           (1500, 128, True)]:
        x = rng.standard_normal((b, k, v)).astype(np.float32) * 3
        # inject exact ties and near-collisions
        x[0, 0, 5] = x[0, 0, v // 2] = x[0, 0, v - 1] = x[0, 0].max() + 1.0
        x[1, 1, 100:110] = x[1, 1].max() + 0.5
        # large negative alive scores force rounding collapses in the add
        alive = jnp.asarray(
            rng.standard_normal((b, k)).astype(np.float32) * 10 - 50)
        xj = jnp.asarray(x)
        mask_eos = jnp.asarray(mask)

        logprobs = jax.nn.log_softmax(xj, axis=-1)
        logprobs = jnp.where(
            mask_eos & (jnp.arange(v)[None, None, :] == eos),
            NEG_INF, logprobs)
        cand = alive[:, :, None] + logprobs
        ref_v, ref_f = jax.lax.top_k(cand.reshape(b, k * v), kk)

        got_v, got_b, got_t = lazy_top_candidates(xj, alive, kk, eos,
                                                  mask_eos, block=block)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v),
                                      err_msg=f"v={v} mask={mask}")
        np.testing.assert_array_equal(
            np.asarray(got_b) * v + np.asarray(got_t), np.asarray(ref_f),
            err_msg=f"v={v} mask={mask}")


def test_permute_cache_rows_matmul_exact():
    """The 0/1-selector-matmul beam reorder must equal the gather exactly
    (bf16 and fp32 caches, arbitrary within-group permutations)."""
    from prismer_tpu.models import generation as gen

    rng = np.random.default_rng(13)
    x32 = jnp.asarray(rng.standard_normal((3, 5, 6, 16)).astype(np.float32))
    for x in (x32, x32.astype(jnp.bfloat16)):
        flat = jnp.asarray(rng.integers(0, 6, (6,)).astype(np.int32))
        ref = jnp.take(x, flat, axis=2)
        old = gen.BEAM_PERM_IMPL
        gen.BEAM_PERM_IMPL = "matmul"
        try:
            got = gen._permute_cache_rows(x, flat)
        finally:
            gen.BEAM_PERM_IMPL = old
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
