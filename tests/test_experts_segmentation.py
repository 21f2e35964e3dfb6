"""Mask2Former expert tests: Swin window machinery vs hand-built torch
fixtures, sine PE parity, end-to-end shape on a tiny config."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from prismer_tpu.experts.segmentation import mask2former as m2f
from prismer_tpu.experts.segmentation import swin


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 24, 24, 8)).astype(np.float32))
    wins = swin.window_partition(x, 12)
    assert wins.shape == (2 * 4, 144, 8)
    back = swin.window_unpartition(wins, 12, 24, 24)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = swin.relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.max() == (2 * 4 - 1) ** 2 - 1
    assert idx.min() == 0
    # center-symmetric: idx[i, j] + idx[j, i] is constant on the diagonal flip
    assert idx[0, 0] == idx[5, 5] == idx[15, 15]


def test_shift_attn_mask_matches_swin_semantics():
    """Cross-region pairs blocked (-100), same-region pairs open (0)."""
    mask = swin.shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # first window (interior) has no region boundary -> fully open
    np.testing.assert_array_equal(mask[0], np.zeros((16, 16)))
    # last (corner) window mixes 4 regions -> some pairs blocked
    assert (mask[-1] == -100).any()


def test_sine_position_embedding_matches_torch(rng):
    """vs the reference PositionEmbeddingSine (position_encoding.py:29-52)."""
    h, w, dim = 6, 9, 16
    half = dim // 2
    not_mask = torch.ones(1, h, w)
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(half, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="trunc") / half)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                        dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                        dim=4).flatten(3)
    want = torch.cat((pos_y, pos_x), dim=3)[0].numpy()
    got = m2f.sine_position_embedding(h, w, dim)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encoder_reference_points():
    ref = m2f.encoder_reference_points([(2, 2), (1, 1)])
    assert ref.shape == (5, 2, 2)
    np.testing.assert_allclose(ref[0, 0], [0.25, 0.25])
    np.testing.assert_allclose(ref[3, 0], [0.75, 0.75])
    np.testing.assert_allclose(ref[4, 0], [0.5, 0.5])


def test_swin_tiny_shapes(rng):
    model = swin.SwinTransformer(embed_dim=16, depths=(1, 1, 2, 1),
                                 heads=(1, 2, 4, 8), window=4)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    assert outs["res2"].shape == (1, 16, 16, 16)
    assert outs["res3"].shape == (1, 8, 8, 32)
    assert outs["res4"].shape == (1, 4, 4, 64)
    assert outs["res5"].shape == (1, 2, 2, 128)


def test_maskformer_end_to_end_tiny(rng):
    """Tiny MaskFormer: semantic output shape + probability semantics."""
    class TinyMaskFormer(m2f.MaskFormer):
        pass

    model = m2f.MaskFormer(num_classes=7, num_queries=10)
    # monkeypatch small backbone through class attribute override is awkward;
    # instead run the heads directly on synthetic backbone features
    feats = {
        "res2": jnp.asarray(rng.standard_normal((1, 16, 16, 24)).astype(np.float32)),
        "res3": jnp.asarray(rng.standard_normal((1, 8, 8, 48)).astype(np.float32)),
        "res4": jnp.asarray(rng.standard_normal((1, 4, 4, 96)).astype(np.float32)),
        "res5": jnp.asarray(rng.standard_normal((1, 2, 2, 192)).astype(np.float32)),
    }
    pd = m2f.PixelDecoder(conv_dim=32, mask_dim=32, enc_layers=2)
    pd_vars = pd.init(jax.random.key(0), feats)
    mask_features, ms = pd.apply(pd_vars, feats)
    assert mask_features.shape == (1, 16, 16, 32)
    assert [tuple(x.shape) for x in ms] == [
        (1, 2, 2, 32), (1, 4, 4, 32), (1, 8, 8, 32)]

    dec = m2f.MaskedTransformerDecoder(num_queries=10, hidden_dim=32,
                                       heads=4, dec_layers=3, num_classes=7,
                                       mask_dim=32)
    dvars = dec.init(jax.random.key(1), ms, mask_features)
    classes, masks = dec.apply(dvars, ms, mask_features)
    assert classes.shape == (1, 10, 8)
    assert masks.shape == (1, 10, 16, 16)

    cls_prob = jax.nn.softmax(classes, axis=-1)[..., :-1]
    sem = jnp.einsum("bqc,bqhw->bchw", cls_prob, jax.nn.sigmoid(masks))
    assert sem.shape == (1, 7, 16, 16)
    assert float(sem.min()) >= 0.0
