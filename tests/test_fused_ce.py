"""Parity tests for the fused LM-head + label-smoothed-CE kernel
(ops/fused_ce.py) against the materializing XLA reference
(roberta.label_smoothed_loss over h @ emb.T + bias)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.models.roberta import label_smoothed_loss
from prismer_tpu.ops import fused_ce


def _make_case(rng, b, l, d, v, n_ignore=5):
    h = rng.standard_normal((b, l, d), np.float32) * 0.5
    emb = rng.standard_normal((v, d), np.float32) * 0.2
    bias = rng.standard_normal((v,), np.float32) * 0.1
    labels = rng.integers(0, v, (b, l)).astype(np.int32)
    flat = labels.reshape(-1)
    idx = rng.choice(flat.size, size=n_ignore, replace=False)
    flat[idx] = -100
    labels = flat.reshape(b, l)
    labels[:, 0] = -100  # prompt-style mask
    return (jnp.asarray(h), jnp.asarray(emb), jnp.asarray(bias),
            jnp.asarray(labels))


def _xla_loss(h, emb, bias, labels):
    logits = jnp.einsum("bld,vd->blv", h, emb,
                        preferred_element_type=jnp.float32) + bias
    return label_smoothed_loss(logits, labels)


@pytest.mark.parametrize("v", [1000, 2500])
def test_forward_parity(v):
    rng = np.random.default_rng(0)
    h, emb, bias, labels = _make_case(rng, b=3, l=9, d=128, v=v)
    ref = _xla_loss(h, emb, bias, labels)
    got = fused_ce.fused_label_smoothed_loss(h, emb, bias, labels,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6,
                               atol=1e-5)


def test_grad_parity_kernel_backward():
    rng = np.random.default_rng(1)
    h, emb, bias, labels = _make_case(rng, b=2, l=7, d=128, v=2500)
    w = jnp.asarray(rng.standard_normal(2).astype(np.float32))

    def f_ref(h_, emb_, bias_):
        return jnp.mean(w * _xla_loss(h_, emb_, bias_, labels))

    def f_fused(h_, emb_, bias_):
        return jnp.mean(w * fused_ce.fused_label_smoothed_loss(
            h_, emb_, bias_, labels, interpret=True))

    # the tiny case must take the resident kernel backward
    assert 12 <= fused_ce._bwd_resident_rows(128, 4)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(h, emb, bias)
    g_fus = jax.grad(f_fused, argnums=(0, 1, 2))(h, emb, bias)
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-6,
                                   atol=1e-6)


def test_grad_parity_xla_fallback(monkeypatch):
    """Row counts beyond the resident-VMEM cap fall back to the
    materializing backward; it must match the kernel/reference grads."""
    rng = np.random.default_rng(2)
    h, emb, bias, labels = _make_case(rng, b=2, l=7, d=128, v=1000)
    monkeypatch.setattr(fused_ce, "_bwd_resident_rows", lambda d, i: 0)

    def f_ref(h_, emb_, bias_):
        return jnp.mean(_xla_loss(h_, emb_, bias_, labels))

    def f_fused(h_, emb_, bias_):
        return jnp.mean(fused_ce.fused_label_smoothed_loss(
            h_, emb_, bias_, labels, interpret=True))

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(h, emb, bias)
    g_fus = jax.grad(f_fused, argnums=(0, 1, 2))(h, emb, bias)
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-6,
                                   atol=1e-6)


def test_row_blocking_multi_block():
    """More rows than one row block (nb=8-row padding, multiple r blocks via
    a shrunken block) — exercises the (nvb, R) grid and per-r scratch."""
    rng = np.random.default_rng(3)
    h, emb, bias, labels = _make_case(rng, b=8, l=9, d=128, v=1500)
    import prismer_tpu.ops.fused_ce as fc
    orig = fc._row_layout
    try:
        fc._row_layout = lambda n: (16, -(-max(n, 1) // 16) * 16)
        got = fc.fused_label_smoothed_loss(h, emb, bias, labels,
                                           interpret=True)
    finally:
        fc._row_layout = orig
    ref = _xla_loss(h, emb, bias, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6,
                               atol=1e-5)


def test_bf16_inputs():
    """bf16 compute dtype: kernel matches the XLA bf16 einsum path."""
    rng = np.random.default_rng(4)
    h, emb, bias, labels = _make_case(rng, b=2, l=6, d=128, v=1000)
    hb, eb = h.astype(jnp.bfloat16), emb.astype(jnp.bfloat16)
    ref = _xla_loss(hb, eb, bias, labels)
    got = fused_ce.fused_label_smoothed_loss(hb, eb, bias, labels,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-4)


def test_all_ignored_sample():
    """A sample whose every label is -100 contributes exactly zero."""
    rng = np.random.default_rng(5)
    h, emb, bias, labels = _make_case(rng, b=2, l=6, d=128, v=1000)
    labels = labels.at[1, :].set(-100)
    got = fused_ce.fused_label_smoothed_loss(h, emb, bias, labels,
                                             interpret=True)
    ref = _xla_loss(h, emb, bias, labels)
    assert float(got[1]) == 0.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# model-level: per_sample_loss / train grads / rank with the kernel enabled
# ---------------------------------------------------------------------------

def _tiny_decoder_setup():
    from tests.test_fused_decode import decoder_cfg
    from prismer_tpu.models.roberta import RobertaCausalDecoder
    rng = np.random.default_rng(7)
    cfg = decoder_cfg()
    dec = RobertaCausalDecoder(cfg)
    ids = jnp.asarray(rng.integers(4, 120, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    enc = jnp.asarray(rng.standard_normal((2, 12, 48)).astype(np.float32))
    variables = dec.init(jax.random.key(0), ids, mask, enc)
    targets = np.asarray(ids).copy()
    targets[:, :3] = -100
    targets[1, 6:] = -100
    return dec, variables, ids, mask, enc, jnp.asarray(targets)


def test_per_sample_loss_kernel_matches_xla_path():
    from prismer_tpu.models.roberta import RobertaCausalDecoder
    dec, variables, ids, mask, enc, targets = _tiny_decoder_setup()

    def run():
        return dec.apply(variables, ids, mask, enc, targets,
                         method=RobertaCausalDecoder.per_sample_loss)

    fused_ce.set_fused_ce("off")
    try:
        ref = run()
        fused_ce.set_fused_ce("on")
        got = run()
    finally:
        fused_ce.set_fused_ce("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6,
                               atol=1e-4)


def test_per_sample_loss_grads_match():
    """Gradients wrt ALL decoder params (incl. tied embeddings, which get
    both the input-embedding and the LM-head custom_vjp contribution, and
    the LM bias) agree between the fused kernel and the XLA path."""
    from prismer_tpu.models.roberta import RobertaCausalDecoder
    dec, variables, ids, mask, enc, targets = _tiny_decoder_setup()

    def make_loss():
        def loss(params):
            v = {**variables, "params": params}
            per = dec.apply(v, ids, mask, enc, targets,
                            method=RobertaCausalDecoder.per_sample_loss)
            return jnp.mean(per)
        return loss

    fused_ce.set_fused_ce("off")
    try:
        g_ref = jax.grad(make_loss())(variables["params"])
        fused_ce.set_fused_ce("on")
        g_fus = jax.grad(make_loss())(variables["params"])
    finally:
        fused_ce.set_fused_ce("auto")
    flat_r, _ = jax.tree.flatten(g_ref)
    flat_f, treedef = jax.tree.flatten(g_fus)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=2e-5)


def test_rank_answers_kernel_matches_xla_path():
    """rank pass-2 (decode_loss with cross_groups) under the fused kernel
    selects identical answers and is exercised end to end."""
    import dataclasses
    from prismer_tpu.config import PrismerConfig
    from prismer_tpu.models.generation import rank_answers
    from prismer_tpu.models.prismer import Prismer
    from tests.test_models import make_expert_inputs, tiny_vision
    from tests.test_fused_decode import decoder_cfg

    rng = np.random.default_rng(11)
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
    ans_ids = jnp.asarray(rng.integers(4, 120, (6, 3)).astype(np.int32))
    ans_mask = jnp.ones((6, 3), jnp.int32)

    def run():
        return rank_answers(model, variables, enc, ids, mask, ans_ids,
                            ans_mask, k_test=4,
                            pad_token_id=cfg.decoder.pad_token_id)

    fused_ce.set_fused_ce("off")
    try:
        ref = run()
        fused_ce.set_fused_ce("on")
        got = run()
    finally:
        fused_ce.set_fused_ce("auto")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
