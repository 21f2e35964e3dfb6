"""Swin Transformer backbone (inference), flax/NHWC.

Re-implementation of the segmentation expert's Swin-L backbone
(experts/segmentation/mask2former/modeling/backbone/swin.py; config
maskformer2_swin_large_IN21k_384_bs16_100ep.yaml: embed 192, depths
[2,2,18,2], heads [6,12,24,48], window 12).

Standard Swin semantics: 4x4 conv patch embed + LN; per stage, alternating
regular / shifted (window//2) window attention with relative position bias,
GELU MLP (ratio 4), post-stage patch merging (LN + Linear 4C->2C); each
requested output ('res2'..'res5') is the pre-merge stage output passed
through its own LayerNorm (detectron2 D2SwinTransformer adds norm{i}).
Feature maps are padded to window multiples inside blocks (static shapes).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, w*w, C); H, W divisible by w."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_unpartition(x: jax.Array, w: int, h: int, wd: int) -> jax.Array:
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) index into the (2w-1)^2 bias table (swin standard)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, ww, ww)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    heads: int
    window: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array = None) -> jax.Array:
        """x: (nW*B, ww, C); mask: (nW, ww, ww) additive or None."""
        bnw, ww, c = x.shape
        hd = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(bnw, ww, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)

        table = self.param("rel_pos_bias",
                           nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads),
                           jnp.float32)
        idx = jnp.asarray(relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(ww, ww, self.heads)
        s = s + bias.transpose(2, 0, 1)[None].astype(jnp.float32)

        if mask is not None:
            nw = mask.shape[0]
            s = s.reshape(bnw // nw, nw, self.heads, ww, ww)
            s = s + mask[None, :, None].astype(jnp.float32)
            s = s.reshape(bnw, self.heads, ww, ww)

        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(bnw, ww, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(o)


def shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Swin's shifted-window attention mask: (nW, ww, ww) additive, -100 for
    cross-region pairs."""
    img = np.zeros((1, hp, wp, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, hp // window, window, wp // window, window, 1)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    heads: int
    window: int
    shift: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, wd, c = x.shape
        w = self.window
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        pad_h = (-h) % w
        pad_w = (-wd) % w
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, wd + pad_w

        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(hp, wp, w, self.shift))
        else:
            mask = None

        wins = window_partition(y, w)
        wins = WindowAttention(self.heads, w, dtype=self.dtype,
                               name="attn")(wins, mask)
        y = window_unpartition(wins, w, hp, wp)

        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :h, :wd]
        x = shortcut + y

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            h, w = x.shape[1], x.shape[2]
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns {'res2': (B,H/4,W/4,C), ..., 'res5': (B,H/32,W/32,8C)}."""

    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    heads: Tuple[int, ...] = (6, 12, 24, 48)
    window: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        d = self.dtype
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=d,
                    name="patch_embed")(x.astype(d))
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        outs: Dict[str, jax.Array] = {}
        for s, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(self.heads[s], self.window,
                              shift=0 if b % 2 == 0 else self.window // 2,
                              dtype=d, name=f"stage{s}_block{b}")(x)
            outs[f"res{s + 2}"] = nn.LayerNorm(
                epsilon=1e-5, name=f"out_norm{s}")(x)
            if s < len(self.depths) - 1:
                x = PatchMerging(dtype=d, name=f"downsample{s}")(x)
        return outs
