"""DPT-hybrid monocular depth expert (inference), flax/NHWC.

Re-implementation of the reference depth expert (experts/depth/{models,
blocks,vit}.py): timm 'vit_base_resnet50_384' hybrid backbone — a
ResNetV2 front (weight-standardized convs + GroupNorm-32, pre-activation
bottlenecks; stem + 3 stages) feeding a ViT-B/1 patch projection over the
1/16 feature map — with DPT's reassemble + RefineNet fusion decoder and a
monocular-depth head (models.py:89-124).

Feature taps (vit.py:351-393, hooks [0,1,8,11]):
  layer_1 = ResNet stage 0 output (256ch, /4)
  layer_2 = ResNet stage 1 output (512ch, /8)
  layer_3 = ViT block 8 tokens -> project-readout -> 1x1 conv (768, /16)
  layer_4 = ViT block 11 tokens -> project-readout -> 1x1 conv -> 3x3/2 (/32)
Decoder (blocks.py:317-383 + models.py:72-88): per-level 3x3 'scratch'
convs to 256ch, RefineNet fusion (two ResidualConvUnits, bilinear x2
align_corners=True, 1x1 out conv), head conv->up->conv->relu->conv->relu.

Position embeddings are bilinearly resized (align_corners=False) to the
input grid (vit.py:148-163).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class StdConv(nn.Module):
    """Weight-standardized conv (timm StdConv2d): per-out-channel
    standardization of the kernel with eps=1e-6, biased variance."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       self.kernel + (in_ch, self.features), jnp.float32)
        wf = w.reshape(-1, self.features)
        mean = jnp.mean(wf, axis=0)
        var = jnp.var(wf, axis=0)
        wf = (wf - mean) * jax.lax.rsqrt(var + 1e-6)
        w = wf.reshape(w.shape).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, self.strides,
            self.padding if isinstance(self.padding, str)
            else [tuple(p) for p in self.padding],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class GroupNorm32(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-5)(x)


class PreActBottleneck(nn.Module):
    """timm ResNetV2 pre-activation bottleneck."""

    mid: int
    out: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pre = nn.relu(GroupNorm32(name="norm1")(x))
        shortcut = x
        if self.downsample:
            shortcut = StdConv(self.out, (1, 1), (self.stride, self.stride),
                               dtype=self.dtype, name="downsample_conv")(pre)
        h = StdConv(self.mid, (1, 1), dtype=self.dtype, name="conv1")(pre)
        h = nn.relu(GroupNorm32(name="norm2")(h))
        h = StdConv(self.mid, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(h)
        h = nn.relu(GroupNorm32(name="norm3")(h))
        h = StdConv(self.out, (1, 1), dtype=self.dtype, name="conv3")(h)
        return h + shortcut


class ResNetV2Stage(nn.Module):
    num_blocks: int
    mid: int
    out: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = PreActBottleneck(
                mid=self.mid, out=self.out,
                stride=self.stride if i == 0 else 1,
                downsample=(i == 0), dtype=self.dtype,
                name=f"block_{i}")(x)
        return x


class HybridBackbone(nn.Module):
    """ResNetV2 stem + stages 0-2 (timm vit_base_resnet50_384 front)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = StdConv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(GroupNorm32(name="stem_norm")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        s0 = ResNetV2Stage(3, 64, 256, 1, dtype=self.dtype, name="stage_0")(x)
        s1 = ResNetV2Stage(4, 128, 512, 2, dtype=self.dtype, name="stage_1")(s0)
        s2 = ResNetV2Stage(9, 256, 1024, 2, dtype=self.dtype, name="stage_2")(s1)
        return s0, s1, s2


class ViTBlock(nn.Module):
    """Standard timm ViT block (packed qkv, GELU MLP, plain LayerNorm)."""

    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.heads, d // self.heads
                             ).transpose(0, 2, 1, 3)

        q, k, v = heads_(q), heads_(k), heads_(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        s = s / np.sqrt(d // self.heads)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(x.shape)
        x = x + nn.Dense(d, dtype=self.dtype, name="proj")(o)

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


@functools.lru_cache(maxsize=32)
def _bilinear_half_pixel_matrix(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False)."""
    mat = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), in_size - 1)
        hi_c = min(max(lo + 1, 0), in_size - 1)
        mat[i, lo_c] += 1.0 - frac
        mat[i, hi_c] += frac
    return mat.astype(np.float32)


def resize_pos_embed_bilinear(pos_grid: jax.Array, gh: int, gw: int) -> jax.Array:
    """(Gh0*Gw0, D) grid -> (gh*gw, D), bilinear align_corners=False
    (vit.py:148-163)."""
    g0 = int(round(pos_grid.shape[0] ** 0.5))
    d = pos_grid.shape[-1]
    if g0 * g0 == pos_grid.shape[0] and (g0, g0) == (gh, gw):
        return pos_grid
    grid = pos_grid.reshape(g0, g0, d).astype(jnp.float32)
    wh = jnp.asarray(_bilinear_half_pixel_matrix(g0, gh))
    ww = jnp.asarray(_bilinear_half_pixel_matrix(g0, gw))
    out = jnp.einsum("oi,ijd->ojd", wh, grid, precision="highest")
    out = jnp.einsum("oj,sjd->sod", ww, out, precision="highest")
    return out.reshape(gh * gw, d).astype(pos_grid.dtype)


class ResidualConvUnit(nn.Module):
    """relu->conv->relu->conv + skip (blocks.py:237-313, bn=False)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = x.shape[-1]
        h = nn.relu(x)
        h = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """blocks.py:317-383 (custom variant, align_corners=True, no expand)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        from prismer_tpu.ops.resize import bilinear_resize_align_corners
        if skip is not None:
            x = x + ResidualConvUnit(dtype=self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(dtype=self.dtype, name="rcu2")(x)
        x = bilinear_resize_align_corners(x, x.shape[1] * 2, x.shape[2] * 2)
        return nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPTDepthModel(nn.Module):
    """Full DPT-hybrid depth net. Input NHWC (ImageNet-normalized); output
    (B, H, W) non-negative inverse depth (models.py:99-124)."""

    features: int = 256
    vit_dim: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    hooks: Tuple[int, int] = (8, 11)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from prismer_tpu.ops.resize import bilinear_resize_align_corners
        d = self.dtype
        b, h, w, _ = x.shape
        gh, gw = h // 16, w // 16

        s0, s1, s2 = HybridBackbone(dtype=d, name="backbone")(x.astype(d))

        # patch projection + cls token + resized pos embed (vit.py:166-201)
        tokens = nn.Conv(self.vit_dim, (1, 1), dtype=d, name="patch_proj")(s2)
        tokens = tokens.reshape(b, gh * gw, self.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.vit_dim), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1 + 24 * 24, self.vit_dim), jnp.float32)
        pos_grid = resize_pos_embed_bilinear(pos[1:], gh, gw)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(d), (b, 1, self.vit_dim)), tokens],
            axis=1)
        tokens = tokens + jnp.concatenate([pos[:1], pos_grid], axis=0
                                          ).astype(d)[None]

        taps = {}
        for i in range(self.vit_layers):
            tokens = ViTBlock(heads=self.vit_heads, dtype=d,
                              name=f"vit_block_{i}")(tokens)
            if i in self.hooks:
                taps[i] = tokens
        # NOTE: the final ViT norm only affects the (unused) global output —
        # taps are pre-norm activations, exactly like the reference hooks.

        def reassemble(tok, name):
            """project-readout + 1x1 conv (vit.py:77-90, 446-476)."""
            readout = jnp.broadcast_to(tok[:, :1], tok[:, 1:].shape)
            feat = jnp.concatenate([tok[:, 1:], readout], axis=-1)
            feat = nn.Dense(self.vit_dim, dtype=d,
                            name=f"{name}_readout")(feat)
            feat = jax.nn.gelu(feat, approximate=False)
            feat = feat.reshape(b, gh, gw, self.vit_dim)
            return nn.Conv(self.vit_dim, (1, 1), dtype=d,
                           name=f"{name}_proj")(feat)

        layer_3 = reassemble(taps[self.hooks[0]], "post3")
        layer_4 = reassemble(taps[self.hooks[1]], "post4")
        layer_4 = nn.Conv(self.vit_dim, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), dtype=d,
                          name="post4_down")(layer_4)

        f = self.features
        rn1 = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=d, name="layer1_rn")(s0)
        rn2 = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=d, name="layer2_rn")(s1)
        rn3 = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=d, name="layer3_rn")(layer_3)
        rn4 = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=d, name="layer4_rn")(layer_4)

        p4 = FeatureFusionBlock(dtype=d, name="refinenet4")(rn4)
        p3 = FeatureFusionBlock(dtype=d, name="refinenet3")(p4, rn3)
        p2 = FeatureFusionBlock(dtype=d, name="refinenet2")(p3, rn2)
        p1 = FeatureFusionBlock(dtype=d, name="refinenet1")(p2, rn1)

        out = nn.Conv(f // 2, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                      name="head_conv1")(p1)
        out = bilinear_resize_align_corners(out, out.shape[1] * 2,
                                            out.shape[2] * 2)
        out = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                      name="head_conv2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), dtype=d, name="head_conv3")(out)
        out = nn.relu(out)
        return out[..., 0]
