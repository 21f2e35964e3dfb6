"""Parity tests for primitive layers against torch (CPU) ground truth.

The reference's numerics (fp32 LayerNorm, torch bicubic/bilinear/nearest
resizes, torch MultiheadAttention, label-smoothed CE) are replicated exactly;
these tests pin each one (SURVEY.md §4 golden-parity strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from prismer_tpu.models import layers
from prismer_tpu.ops import resize


def test_quick_gelu(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    want = torch.tensor(x) * torch.sigmoid(1.702 * torch.tensor(x))
    got = layers.quick_gelu(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_squared_relu(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    want = torch.relu(torch.tensor(x)) ** 2
    got = layers.squared_relu(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_gelu_exact_matches_torch(rng):
    x = rng.standard_normal((64,)).astype(np.float32)
    want = F.gelu(torch.tensor(x))
    got = layers.gelu_exact(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_fp32_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 32)).astype(np.float32)
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)
    want = F.layer_norm(torch.tensor(x), (32,), torch.tensor(scale),
                        torch.tensor(bias), 1e-5)
    got = layers.fp32_layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias), 1e-5)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_layer_norm_one_pass_matches_two_pass(rng, monkeypatch):
    # one-pass stats (TPU default) vs the exact two-pass definition, at the
    # cancellation-hostile offset (|mean| ~ 100 >> std): worst-case fp32
    # error on var is ~1e-3 absolute -> ~5e-4 on y, inside bf16 resolution
    x = (rng.standard_normal((2, 8, 64)) + 100.0).astype(np.float32)
    scale = rng.standard_normal(64).astype(np.float32)
    bias = rng.standard_normal(64).astype(np.float32)
    monkeypatch.setenv("PRISMER_LN_ONEPASS", "0")
    want = layers.fp32_layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                  jnp.asarray(bias))
    monkeypatch.setenv("PRISMER_LN_ONEPASS", "1")
    got = layers.fp32_layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-2)
    # bf16 activations: identical after output quantization
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    got_b = layers.fp32_layer_norm(xb, jnp.asarray(scale), jnp.asarray(bias))
    monkeypatch.setenv("PRISMER_LN_ONEPASS", "0")
    want_b = layers.fp32_layer_norm(xb, jnp.asarray(scale), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got_b, np.float32),
                               np.asarray(want_b, np.float32), atol=0.02)


def test_layer_norm_bf16_stays_fp32_inside(rng):
    # bf16 input with a large offset: fp32 islands keep the result finite/accurate
    x = (rng.standard_normal((2, 8, 32)) + 100.0).astype(np.float32)
    x_bf16 = jnp.asarray(x, dtype=jnp.bfloat16)
    got = layers.fp32_layer_norm(x_bf16, jnp.ones(32), jnp.zeros(32))
    assert got.dtype == jnp.bfloat16
    # reference: same (quantized) input normalized in fp32 — the only
    # remaining error should be the final downcast of the output
    ref = layers.fp32_layer_norm(x_bf16.astype(jnp.float32),
                                 jnp.ones(32), jnp.zeros(32))
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref), atol=0.01)


@pytest.mark.parametrize("in_size,out_size", [(14, 30), (30, 14), (14, 16), (16, 14)])
def test_bicubic_pos_embed_matches_torch(rng, in_size, out_size):
    d = 8
    pe = rng.standard_normal((in_size * in_size, d)).astype(np.float32)
    t = torch.tensor(pe).reshape(1, in_size, in_size, d).permute(0, 3, 1, 2)
    want = F.interpolate(t, size=(out_size, out_size), mode="bicubic",
                         align_corners=False)
    want = want.permute(0, 2, 3, 1).flatten(0, 2).numpy()
    got = layers.interpolate_pos_embed(jnp.asarray(pe), out_size * out_size)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_bicubic_identity(rng):
    pe = rng.standard_normal((196, 8)).astype(np.float32)
    got = layers.interpolate_pos_embed(jnp.asarray(pe), 196)
    np.testing.assert_array_equal(np.asarray(got), pe)


@pytest.mark.parametrize("in_size,scale", [(224, 0.25), (224, 16 / 14), (224, 4 / 14)])
def test_bilinear_align_corners_matches_torch(rng, in_size, scale):
    out = int(in_size * scale)
    x = rng.standard_normal((2, in_size, in_size, 3)).astype(np.float32)
    t = torch.tensor(x).permute(0, 3, 1, 2)
    want = F.interpolate(t, size=(out, out), mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    got = resize.bilinear_resize_align_corners(jnp.asarray(x), out, out)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@pytest.mark.parametrize("in_size,out_size", [(224, 14), (224, 16), (10, 7)])
def test_nearest_matches_torch(rng, in_size, out_size):
    x = rng.integers(0, 255, (2, in_size, in_size, 1)).astype(np.float32)
    t = torch.tensor(x).permute(0, 3, 1, 2)
    want = F.interpolate(t, size=(out_size, out_size), mode="nearest")
    want = want.permute(0, 2, 3, 1).numpy()
    got = resize.nearest_resize(jnp.asarray(x), out_size, out_size)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_mha_matches_torch_multihead_attention(rng):
    """Our MHA with converter-style split q/k/v == torch nn.MultiheadAttention."""
    d, h, b, l = 32, 4, 2, 9
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(d, h)  # seq-first torch module
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    xt = torch.tensor(x).transpose(0, 1)  # (L, B, D)
    with torch.no_grad():
        want, _ = mha(xt, xt, xt, need_weights=False)
    want = want.transpose(0, 1).numpy()

    w_in = mha.in_proj_weight.detach().numpy()  # (3D, D)
    b_in = mha.in_proj_bias.detach().numpy()
    wq, wk, wv = np.split(w_in, 3, axis=0)
    bq, bk, bv = np.split(b_in, 3, axis=0)
    params = {"params": {
        "q_proj": {"kernel": wq.T, "bias": bq},
        "k_proj": {"kernel": wk.T, "bias": bk},
        "v_proj": {"kernel": wv.T, "bias": bv},
        "out_proj": {"kernel": mha.out_proj.weight.detach().numpy().T,
                     "bias": mha.out_proj.bias.detach().numpy()},
    }}
    mod = layers.MultiHeadAttention(num_heads=h)
    got = mod.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_label_smoothed_loss_matches_torch(rng):
    from prismer_tpu.models.roberta import label_smoothed_loss
    b, l, v = 3, 7, 11
    logits = rng.standard_normal((b, l, v)).astype(np.float32)
    labels = rng.integers(0, v, (b, l))
    labels[:, :2] = -100
    labels[1, -2:] = -100

    sl = torch.tensor(logits[:, :-1]).reshape(-1, v)
    tl = torch.tensor(labels[:, 1:]).reshape(-1)
    lf = torch.nn.CrossEntropyLoss(reduction="none", label_smoothing=0.1)
    want = lf(sl, tl).reshape(b, -1).sum(1).numpy()

    got = label_smoothed_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_create_position_ids():
    from prismer_tpu.models.roberta import create_position_ids
    ids = jnp.asarray([[0, 5, 6, 2, 1, 1], [0, 7, 2, 1, 1, 1]])
    mask = (ids != 1).astype(jnp.int32)
    got = create_position_ids(ids, mask, padding_idx=1)
    want = np.array([[2, 3, 4, 5, 1, 1], [2, 3, 4, 1, 1, 1]])
    np.testing.assert_array_equal(np.asarray(got), want)


def test_adaptor_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    for late in (False, True):
        mod = layers.Adaptor(norm_late=late)
        params = mod.init(jax.random.key(0), x)
        y = mod.apply(params, x)
        assert y.shape == x.shape
