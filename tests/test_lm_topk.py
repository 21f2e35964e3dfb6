"""Fused LM-head + top-2K selection kernel (ops/lm_topk.py) vs the XLA
reference composition: logits = h @ emb_t + bias, then
generation.lazy_top_candidates — indices exact, values to fp32 tolerance
(the kernel's MXU contraction and block-ordered log-sum-exp differ from the
XLA reduction order in the last ulp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.models.generation import NEG_INF, lazy_top_candidates
from prismer_tpu.ops.lm_topk import lm_topk, pad_embedding, pad_layout


def _ref(h, emb_t, bias, alive, mask_eos, kk, eos_id):
    logits = jnp.einsum("nd,dv->nv", h, emb_t,
                        preferred_element_type=jnp.float32) + bias
    b, k = alive.shape
    return lazy_top_candidates(logits.reshape(b, k, -1), alive, kk, eos_id,
                               mask_eos)


@pytest.mark.parametrize("v,b,k,d", [
    (1000, 2, 3, 64),     # single-block layout (nvb == 1)
    (50265, 2, 3, 128),   # real RoBERTa vocab, 8-block layout
    (797, 4, 2, 32),      # non-128-multiple vocab
])
@pytest.mark.parametrize("mask_eos", [False, True])
def test_matches_lazy_top_candidates(v, b, k, d, mask_eos):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((b * k, d)), jnp.float32)
    emb_t = jnp.asarray(rng.standard_normal((d, v)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((v,)) * 0.1, jnp.float32)
    alive = jnp.asarray(
        np.where(rng.random((b, k)) < 0.3, NEG_INF,
                 rng.standard_normal((b, k))), jnp.float32)
    eos_id = 2
    kk = 2 * k

    want_v, want_b, want_t = _ref(h, emb_t, bias, alive,
                                  jnp.asarray(mask_eos), kk, eos_id)
    emb_tp, bias_p = pad_embedding(emb_t, bias, v)
    got_v, got_b, got_t = lm_topk(h, emb_tp, bias_p, alive,
                                  jnp.asarray(mask_eos), vocab=v, beams=k,
                                  kk=kk, eos_token_id=eos_id)
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=2e-5, atol=2e-5)


def test_eos_retirement_values():
    """With mask_eos the EOS lane's candidate value is exactly
    alive + NEG_INF, bit-matching the XLA sentinel path."""
    rng = np.random.default_rng(1)
    v, b, k, d = 300, 1, 2, 16
    h = jnp.asarray(rng.standard_normal((b * k, d)), jnp.float32)
    # make EOS dominate so it would be selected if unmasked
    emb_t = jnp.asarray(rng.standard_normal((d, v)) * 0.01, jnp.float32)
    bias = jnp.zeros((v,), jnp.float32).at[2].set(50.0)
    alive = jnp.zeros((b, k), jnp.float32)

    emb_tp, bias_p = pad_embedding(emb_t, bias, v)
    vals_u, _, tok_u = lm_topk(h, emb_tp, bias_p, alive,
                               jnp.asarray(False), vocab=v, beams=k,
                               kk=2 * k, eos_token_id=2)
    assert 2 in np.asarray(tok_u[0])
    vals_m, _, tok_m = lm_topk(h, emb_tp, bias_p, alive,
                               jnp.asarray(True), vocab=v, beams=k,
                               kk=2 * k, eos_token_id=2)
    assert 2 not in np.asarray(tok_m[0, : 2 * k - 1])


def test_tie_order_lowest_flat_index():
    """Exact ties resolve to the lowest flat (beam-major) candidate index —
    the lax.top_k contract the beam search relies on."""
    v, b, k, d = 256, 1, 3, 8
    h = jnp.ones((b * k, d), jnp.float32)
    emb_t = jnp.zeros((d, v), jnp.float32)     # all logits identical
    bias = jnp.zeros((v,), jnp.float32)
    alive = jnp.zeros((b, k), jnp.float32)
    emb_tp, bias_p = pad_embedding(emb_t, bias, v)
    _, beam, tok = lm_topk(h, emb_tp, bias_p, alive, jnp.asarray(False),
                           vocab=v, beams=k, kk=4, eos_token_id=2)
    np.testing.assert_array_equal(np.asarray(beam[0]), [0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(tok[0]), [0, 1, 2, 3])


def test_row_chunking_exact(monkeypatch):
    """Above the VMEM row envelope the wrapper splits the batch into
    sample-aligned chunks (measured OOM at n=144 on-chip); chunked output
    must be IDENTICAL to the unchunked kernel — samples are independent."""
    import prismer_tpu.ops.lm_topk as lt

    rng = np.random.default_rng(7)
    v, b, k, d = 797, 7, 3, 32        # 21 rows; limit 6 -> chunks of 2 samples
    h = jnp.asarray(rng.standard_normal((b * k, d)), jnp.float32)
    emb_t = jnp.asarray(rng.standard_normal((d, v)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((v,)) * 0.1, jnp.float32)
    alive = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    emb_tp, bias_p = pad_embedding(emb_t, bias, v)

    args = dict(vocab=v, beams=k, kk=2 * k, eos_token_id=2)
    whole = lm_topk(h, emb_tp, bias_p, alive, jnp.asarray(False), **args)
    monkeypatch.setattr(lt, "_ROW_LIMIT", 6)
    chunked = lm_topk(h, emb_tp, bias_p, alive, jnp.asarray(False), **args)
    for w, c in zip(whole, chunked):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(c))

    # and still exact vs the XLA reference composition
    want = _ref(h, emb_t, bias, alive, jnp.asarray(False), 2 * k, 2)
    np.testing.assert_array_equal(np.asarray(chunked[1]), np.asarray(want[1]))
    np.testing.assert_array_equal(np.asarray(chunked[2]), np.asarray(want[2]))


def test_pad_layout():
    assert pad_layout(50265) == (6400, 8, 51200)
    assert pad_layout(1000) == (128, 8, 1024)
    assert pad_layout(128) == (128, 1, 128)


def test_beam_search_kernel_mode_matches_xla():
    """Full beam_search with the fused LM-head+top-k kernel produces the
    same sequences as the XLA selection path (fused decode + serving
    collection, fp32 tiny model)."""
    import dataclasses

    from prismer_tpu.config import PrismerConfig
    from prismer_tpu.models import generation as gen
    from prismer_tpu.models import roberta as rb
    from prismer_tpu.models.prismer import Prismer, prepare_serving_variables
    from tests.test_fused_decode import decoder_cfg
    from tests.test_models import make_expert_inputs, tiny_vision

    rng = np.random.default_rng(3)
    vis = tiny_vision()
    dec_cfg = dataclasses.replace(decoder_cfg(), vision_hidden_size=64)
    cfg = PrismerConfig(vision=vis, decoder=dec_cfg,
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 120, (2, 4)).astype(np.int32))
    mask = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    enc = model.apply(variables, inputs, method=Prismer.encode)

    orig_impl = gen.LM_TOPK_IMPL
    rb.set_fused_decode("on")
    try:
        sv = prepare_serving_variables(model, variables)
        assert "emb_tp" in sv["packed_decode"]["text_decoder"]

        def make_run(impl):
            # fresh closure per mode: jax's trace cache is identity-keyed
            gen.LM_TOPK_IMPL = impl

            def run():
                return gen.beam_search(
                    model, sv, enc, ids, mask, num_beams=3, max_length=12,
                    min_length=6, length_penalty=1.0,
                    eos_token_id=cfg.decoder.eos_token_id,
                    pad_token_id=cfg.decoder.pad_token_id)
            return jax.jit(run)

        seq_x, sc_x = make_run("xla")()

        import prismer_tpu.ops.lm_topk as lt
        calls = []
        orig = lt.lm_topk

        def counting(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        lt.lm_topk = counting
        try:
            seq_k, sc_k = make_run("kernel")()
        finally:
            lt.lm_topk = orig
        assert calls, "lm_topk kernel path was never traced"
        np.testing.assert_array_equal(np.asarray(seq_k), np.asarray(seq_x))
        np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_x),
                                   atol=1e-4)
    finally:
        gen.LM_TOPK_IMPL = orig_impl
        rb.set_fused_decode("auto")
