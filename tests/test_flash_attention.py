"""Pallas flash-attention parity + gradient tests (interpret mode on CPU),
in the style of the reference's CUDA-op test (experts/.../ops/test.py:
forward parity vs reference impl + gradcheck)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.models import layers
from prismer_tpu.ops.flash_attention import flash_attention, mha_reference


def make_qkv(rng, b=2, h=4, lq=37, lk=37, d=16, dtype=np.float32):
    q = rng.standard_normal((b, h, lq, d)).astype(dtype)
    k = rng.standard_normal((b, h, lk, d)).astype(dtype)
    v = rng.standard_normal((b, h, lk, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("lq,lk", [(37, 37), (64, 64), (13, 70), (260, 260)])
def test_flash_matches_reference_unmasked(rng, lq, lk):
    q, k, v = make_qkv(rng, lq=lq, lk=lk)
    want = mha_reference(q, k, v)
    got = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_flash_matches_reference_padding_mask(rng):
    q, k, v = make_qkv(rng, lq=20, lk=33)
    mask = np.ones((2, 33), np.int32)
    mask[0, 25:] = 0
    mask[1, 10:] = 0
    want = mha_reference(q, k, v, jnp.asarray(mask))
    got = flash_attention(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("l", [16, 37, 70])
def test_flash_matches_reference_causal(rng, l):
    q, k, v = make_qkv(rng, lq=l, lk=l)
    mask = np.ones((2, l), np.int32)
    mask[1, l - 5:] = 0
    want = mha_reference(q, k, v, jnp.asarray(mask), causal=True)
    got = flash_attention(q, k, v, jnp.asarray(mask), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_flash_bf16(rng):
    q, k, v = make_qkv(rng, lq=32, lk=32, dtype=np.float32)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    want = mha_reference(q, k, v)
    got = flash_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.03)


def test_flash_gradients_match_reference(rng):
    """custom_vjp backward (reference recompute) == reference grads."""
    q, k, v = make_qkv(rng, lq=18, lk=25, d=8)
    mask = jnp.asarray(np.ones((2, 25), np.int32).at if False else
                       np.ones((2, 25), np.int32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, mask) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-4, rtol=1e-3)


def test_decoder_full_forward_same_with_flash_and_xla(rng):
    """Whole-decoder logits agree between the flash and XLA attention paths."""
    from prismer_tpu.models.roberta import RobertaCausalDecoder
    from tests.test_models import tiny_decoder
    cfg = tiny_decoder()
    dec = RobertaCausalDecoder(cfg)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (2, 9)).astype(np.int32))
    mask = np.ones((2, 9), np.int32)
    mask[1, 7:] = 0
    mask = jnp.asarray(mask)
    enc = jnp.asarray(rng.standard_normal((2, 6, cfg.vision_hidden_size))
                      .astype(np.float32))
    params = dec.init(jax.random.key(0), ids, mask, enc)

    layers.set_attention_impl("xla")
    try:
        want = dec.apply(params, ids, mask, enc)
    finally:
        layers.set_attention_impl(None)
    layers.set_attention_impl("flash")
    try:
        got = dec.apply(params, ids, mask, enc)
    finally:
        layers.set_attention_impl(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_pallas_backward_masked(rng, causal):
    """The Pallas two-kernel backward (dq + dk/dv from saved lse) matches
    reference grads under padding masks, causal masking, and ragged
    lengths — the training hot path in every freeze mode."""
    lq = lk = 37 if causal else 0
    if not causal:
        lq, lk = 21, 37
    q, k, v = make_qkv(rng, lq=lq, lk=lk, d=16)
    mask = np.ones((2, lk), np.int32)
    mask[0, lk - 7:] = 0
    mask[1, lk - 2:] = 0
    mask = jnp.asarray(mask)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask, causal)
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangents

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, mask, causal)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=3e-4, rtol=1e-3, err_msg=name)


def test_flash_pallas_backward_bf16(rng):
    q, k, v = make_qkv(rng, lq=32, lk=32)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))

    g = jax.grad(lambda a, b, c: jnp.sum(flash_attention(a, b, c) ** 2),
                 argnums=(0, 1, 2))(qb, kb, vb)
    g_ref = jax.grad(lambda a, b, c: jnp.sum(mha_reference(a, b, c) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g, g_ref):
        assert gf.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(gf, np.float32),
                                   np.asarray(gr), atol=0.1, rtol=0.05)


def pack(t):
    """(B, H, L, D) -> (B, L, H*D)."""
    b, h, l, d = t.shape
    return jnp.asarray(np.asarray(t).transpose(0, 2, 1, 3).reshape(b, l, h * d))


@pytest.mark.parametrize("h,dh,lq,lk", [
    (4, 64, 37, 37),     # G=2 head pairs, ragged non-8-multiple lengths
    (4, 64, 13, 70),     # cross-attention shape
    (8, 96, 20, 53),     # resampler head geometry: G=4 groups
    (2, 128, 16, 16),    # G=1 (dh already lane-aligned)
])
def test_packed_flash_matches_reference(rng, h, dh, lq, lk):
    """The transpose-free packed-layout kernel == reference attention."""
    from prismer_tpu.ops.flash_attention import flash_attention_packed
    q, k, v = make_qkv(rng, b=2, h=h, lq=lq, lk=lk, d=dh)
    want = pack(mha_reference(q, k, v))
    got = flash_attention_packed(pack(q), pack(k), pack(v), h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_packed_flash_bf16(rng):
    from prismer_tpu.ops.flash_attention import flash_attention_packed
    q, k, v = make_qkv(rng, b=2, h=4, lq=32, lk=32, d=64)
    want = pack(mha_reference(q, k, v))
    got = flash_attention_packed(
        *(pack(t).astype(jnp.bfloat16) for t in (q, k, v)), 4)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.03)


def test_packed_flash_gradients(rng):
    """custom_vjp of the packed path (transpose + reuse of the Pallas
    backward kernels) == reference grads."""
    from prismer_tpu.ops.flash_attention import flash_attention_packed
    q, k, v = make_qkv(rng, b=2, h=4, lq=18, lk=25, d=64)
    qp, kp, vp = pack(q), pack(k), pack(v)

    def loss_flash(a, b_, c):
        out = flash_attention_packed(a, b_, c, 4)
        return jnp.sum(out * jnp.cos(out))

    def ref_loss(q, k, v):
        out = mha_reference(q, k, v)
        outp = out.transpose(0, 2, 1, 3).reshape(2, 18, 256)
        return jnp.sum(outp * jnp.cos(outp))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(qp, kp, vp)
    g_ref4 = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = [pack(t) for t in g_ref4]
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=3e-4, rtol=1e-3)


def test_packed_attention_fallback_routes(rng):
    """Masked / causal / oversized shapes fall back to the head-split path
    and still match the reference."""
    from prismer_tpu.ops.flash_attention import (packed_attention,
                                                 packed_eligible)
    q, k, v = make_qkv(rng, b=2, h=4, lq=20, lk=33, d=16)
    mask = np.ones((2, 33), np.int32)
    mask[0, 25:] = 0
    mask = jnp.asarray(mask)
    want = pack(mha_reference(q, k, v, mask))
    got = packed_attention(pack(q), pack(k), pack(v), 4, key_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    # eligibility: indivisible heads and VMEM-exceeding keys are refused
    assert not packed_eligible(3, 64, 64, 64)       # 64 % 3 != 0
    assert not packed_eligible(12, 964, 200_000, 768)
    assert packed_eligible(12, 964, 964, 768)       # the encoder hot shape
    assert packed_eligible(8, 64, 1240, 768)        # the resampler shape


def test_mha_packed_path_matches_xla(rng):
    """Model-level: MultiHeadAttention with the packed flash path ==
    the XLA path (the encoder/resampler integration surface)."""
    mha = layers.MultiHeadAttention(num_heads=4)
    x = jnp.asarray(rng.standard_normal((2, 37, 64)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((2, 53, 64)).astype(np.float32))
    params = mha.init(jax.random.key(0), x, kv)
    layers.set_attention_impl("xla")
    try:
        want = mha.apply(params, x, kv)
    finally:
        layers.set_attention_impl(None)
    layers.set_attention_impl("flash")
    try:
        got = mha.apply(params, x, kv)
    finally:
        layers.set_attention_impl(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_block_size_policy():
    """The swept whole-Q/whole-K policy (ops/flash_attention.py
    _block_sizes): single k-block when it fits, padding-minimizing k-block
    otherwise, callers' explicit overrides respected."""
    from prismer_tpu.ops.flash_attention import _block_sizes

    # encoder hot shape: whole Q, whole K in ONE block (the 3.77 ms winner)
    assert _block_sizes(964, 964) == (968, 1024)
    # resampler keys ~1240: bk=256 pads to 1280 (3%), not 512's 1536 (24%)
    assert _block_sizes(64, 1240) == (64, 256)
    # tiny decode prefill shapes
    assert _block_sizes(20, 20) == (24, 128)
    # explicit override still wins
    assert _block_sizes(964, 964, block_q=256, block_k=256) == (256, 256)
    # block never exceeds the padded length
    assert _block_sizes(8, 100, block_k=512) == (8, 128)
