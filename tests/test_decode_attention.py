"""Parity tests for the Pallas grouped-decode cross-attention kernel
(ops/decode_attention.py) against the exact XLA softmax-attention reference
— the ops/test.py-style kernel-parity discipline (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.models.layers import dot_product_attention
from prismer_tpu.ops.decode_attention import grouped_decode_attention


@pytest.mark.parametrize("b,h,nq,l,dh", [
    (2, 4, 3, 100, 32),    # beam-3 decode step, unaligned L
    (2, 4, 12, 964, 64),   # beam-3 x 4-token prefill at ViT-B/16@480 length
    (1, 2, 8, 128, 64),    # exactly aligned
    (3, 2, 1, 37, 16),     # single query, tiny L
])
def test_grouped_matches_xla_reference(b, h, nq, l, dh):
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, nq, dh), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, dh), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, dh), jnp.float32)

    got = grouped_decode_attention(q, k, v, interpret=True)
    want = dot_product_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grouped_bf16_inputs_fp32_softmax():
    key = jax.random.key(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, 3, 64), jnp.float32)
    k = jax.random.normal(kk, (2, 3, 200, 64), jnp.float32)
    v = jax.random.normal(kv, (2, 3, 200, 64), jnp.float32)

    got = grouped_decode_attention(q.astype(jnp.bfloat16),
                                   k.astype(jnp.bfloat16),
                                   v.astype(jnp.bfloat16), interpret=True)
    want = dot_product_attention(q.astype(jnp.bfloat16),
                                 k.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16), None)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_grouped_padding_region_has_no_effect():
    """Keys beyond the true length must not leak through the padding mask:
    compare L=130 (pads to 256) against the same data computed at an
    exactly-aligned length via the reference."""
    key = jax.random.key(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 3, 32), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 130, 32), jnp.float32) + 5.0  # large keys
    v = jax.random.normal(kv, (1, 2, 130, 32), jnp.float32)
    got = grouped_decode_attention(q, k, v, interpret=True)
    want = dot_product_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_beam_search_same_sequences_flash_vs_xla():
    """End-to-end cached beam search produces identical token sequences with
    the Pallas grouped/flash kernels (interpret mode on CPU) and the XLA
    attention path."""
    import numpy as np

    from prismer_tpu.config import PrismerConfig
    from prismer_tpu.models import layers
    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer
    from tests.test_models import (make_expert_inputs, tiny_decoder,
                                   tiny_vision)

    rng = np.random.default_rng(3)
    vis = tiny_vision()
    cfg = PrismerConfig(vision=vis, decoder=tiny_decoder(),
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 128, (2, 4)).astype(np.int32))
    mask = jnp.ones((2, 4), dtype=jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    enc = model.apply(variables, inputs, method=Prismer.encode)

    def run():
        return beam_search(model, variables, enc, ids, mask, num_beams=3,
                           max_length=10, min_length=6, length_penalty=1.0,
                           eos_token_id=cfg.decoder.eos_token_id,
                           pad_token_id=cfg.decoder.pad_token_id)

    layers.set_attention_impl("xla")
    try:
        seqs_xla, scores_xla = run()
    finally:
        layers.set_attention_impl(None)
    layers.set_attention_impl("flash")
    try:
        seqs_flash, scores_flash = run()
    finally:
        layers.set_attention_impl(None)

    np.testing.assert_array_equal(np.asarray(seqs_xla),
                                  np.asarray(seqs_flash))
    np.testing.assert_allclose(np.asarray(scores_xla),
                               np.asarray(scores_flash), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b,h,nq,l,dh", [
    (2, 4, 3, 100, 32),
    (2, 12, 3, 964, 64),   # the real b32 beam-3 decode shape (per-sample)
    (1, 2, 8, 128, 64),
])
def test_grouped_t_matches_xla_reference(b, h, nq, l, dh):
    """The round-2 retry kernel (bf16 path, transposed-K cache layout)."""
    from prismer_tpu.ops.decode_attention import grouped_cross_attention_t

    key = jax.random.key(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, nq, dh), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, dh), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, dh), jnp.float32)

    got = grouped_cross_attention_t(q, k.transpose(0, 1, 3, 2), v,
                                    interpret=True)
    want = dot_product_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    got16 = grouped_cross_attention_t(
        q.astype(jnp.bfloat16),
        k.transpose(0, 1, 3, 2).astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), interpret=True)
    want16 = dot_product_attention(q.astype(jnp.bfloat16),
                                   k.astype(jnp.bfloat16),
                                   v.astype(jnp.bfloat16), None)
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got16, np.float32),
                               np.asarray(want16, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_attend_grouped_pallas_flag_parity(monkeypatch):
    """PRISMER_DECODE_CROSS=pallas must not change attend_grouped results
    (CPU interpret mode)."""
    from prismer_tpu.config import TextDecoderConfig
    from prismer_tpu.models.roberta import SelfAttentionCore

    cfg = TextDecoderConfig(vocab_size=64, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=4,
                            intermediate_size=64)
    core = SelfAttentionCore(cfg)
    key = jax.random.key(3)
    hidden = jax.random.normal(key, (6, 1, 32))   # B=2 x beams=3
    kt = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 8, 50))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 4, 50, 8))
    variables = core.init(jax.random.key(0), hidden, hidden)

    monkeypatch.delenv("PRISMER_DECODE_CROSS", raising=False)
    want = core.apply(variables, hidden, kt, v, 3,
                      method=SelfAttentionCore.attend_grouped)
    monkeypatch.setenv("PRISMER_DECODE_CROSS", "pallas")
    got = core.apply(variables, hidden, kt, v, 3,
                     method=SelfAttentionCore.attend_grouped)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grouped_t_samples_per_block_parity():
    """samples_per_block > 1 (the DMA-granularity probe path) must be
    numerically identical to the per-sample grid."""
    from prismer_tpu.ops.decode_attention import grouped_cross_attention_t

    key = jax.random.key(5)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (4, 3, 3, 32), jnp.float32)
    kt = jax.random.normal(kk, (4, 3, 32, 100), jnp.float32)
    v = jax.random.normal(kv, (4, 3, 100, 32), jnp.float32)

    base = grouped_cross_attention_t(q, kt, v, interpret=True)
    for sb in (2, 4):
        got = grouped_cross_attention_t(q, kt, v, interpret=True,
                                        samples_per_block=sb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)
