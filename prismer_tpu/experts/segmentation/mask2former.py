"""Mask2Former segmentation expert (inference), flax/NHWC.

Re-implementation of the reference's detectron2 MaskFormer meta-arch for
SEMANTIC inference only (the Prismer pipeline forces INSTANCE_ON/PANOPTIC_ON
off, experts/segmentation/utils.py:12-13):

  * Swin-L backbone (swin.py here)
  * MSDeformAttn pixel decoder (modeling/pixel_decoder/msdeformattn.py):
    res3-5 projected to 256 + GroupNorm-32, sine position embeddings + level
    embeddings, 6 deformable-attention encoder layers (8 heads, 4 points,
    ffn 1024, post-LN), one extra FPN step onto res2, mask features from a
    final 1x1 conv at stride 4
  * multi-scale masked transformer decoder
    (modeling/transformer_decoder/mask2former_transformer_decoder.py):
    Q learned queries, 9 layers cycling the 3 scales; per layer
    masked cross-attention (attention restricted to sigmoid(mask) >= 0.5 of
    the previous prediction; empty rows unmasked) -> self-attention -> FFN
    (post-norm); prediction heads = LN + class Linear(C+1) + 3-layer mask
    MLP against the mask features
  * semantic inference: softmax(cls)[:-1]^T @ sigmoid(masks)
    (maskformer_model.py:280-284)

The deformable attention core is ms_deform_attn_auto — the measured-fastest
formulation per backend (Pallas one-hot on TPU, XLA gather elsewhere; see
prismer_tpu/experts/ops/deform_attn.py for the numbers) — (the
reference's CUDA kernel re-expressed as XLA gathers).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from prismer_tpu.experts.ops.deform_attn import ms_deform_attn_auto
from prismer_tpu.experts.segmentation.swin import SwinTransformer

Dtype = Any


def sine_position_embedding(h: int, w: int, dim: int = 256) -> np.ndarray:
    """PositionEmbeddingSine(normalize=True) (position_encoding.py:12-52);
    returns (h, w, dim) with the reference's [y; x] channel order."""
    half = dim // 2
    eps, scale = 1e-6, 2 * math.pi
    y = (np.arange(1, h + 1, dtype=np.float32)[:, None]
         / (h + eps) * scale)                      # cumsum of ones / last
    x = (np.arange(1, w + 1, dtype=np.float32)[None, :]
         / (w + eps) * scale)
    dim_t = 10000.0 ** (2 * (np.arange(half, dtype=np.float32) // 2) / half)
    pos_x = np.broadcast_to(x[:, :, None], (h, w, half)) / dim_t
    pos_y = np.broadcast_to(np.broadcast_to(y, (h, w))[:, :, None],
                            (h, w, half)) / dim_t

    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])],
                        axis=-1).reshape(h, w, half)

    return np.concatenate([interleave(pos_y), interleave(pos_x)],
                          axis=-1).astype(np.float32)


class MSDeformAttnLayer(nn.Module):
    """Deformable DETR attention module (heads 8, levels 3, points 4)."""

    heads: int = 8
    levels: int = 3
    points: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, reference_points: jax.Array,
                 value_src: jax.Array,
                 spatial_shapes: Sequence[Tuple[int, int]]) -> jax.Array:
        """query/value_src: (B, S, D); reference_points: (B, S, L, 2)."""
        b, s, d = query.shape
        hlp = self.heads * self.levels * self.points
        value = nn.Dense(d, dtype=self.dtype, name="value_proj")(value_src)
        value = value.reshape(b, s, self.heads, d // self.heads)

        offsets = nn.Dense(2 * hlp, dtype=self.dtype,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(b, s, self.heads, self.levels,
                                  self.points, 2)
        weights = nn.Dense(hlp, dtype=self.dtype,
                           name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(b, s, self.heads,
                            self.levels * self.points).astype(jnp.float32),
            axis=-1).reshape(b, s, self.heads, self.levels, self.points)

        normalizer = jnp.asarray([[wl, hl] for hl, wl in spatial_shapes],
                                 jnp.float32)  # (L, 2) as (W, H)
        locs = (reference_points[:, :, None, :, None, :]
                + offsets.astype(jnp.float32)
                / normalizer[None, None, None, :, None, :])
        out = ms_deform_attn_auto(value.astype(jnp.float32),
                                  spatial_shapes, locs, weights)
        return nn.Dense(d, dtype=self.dtype, name="output_proj")(out)


class DeformableEncoderLayer(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        h = MSDeformAttnLayer(dtype=self.dtype, name="self_attn")(
            src + pos, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + h)
        f = nn.Dense(1024, dtype=self.dtype, name="linear1")(src)
        f = nn.relu(f)
        f = nn.Dense(src.shape[-1], dtype=self.dtype, name="linear2")(f)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + f)


def encoder_reference_points(spatial_shapes) -> np.ndarray:
    """(S, L, 2) normalized pixel centers replicated over levels
    (msdeformattn.py:141-152, valid_ratios = 1)."""
    pts = []
    for hl, wl in spatial_shapes:
        ys, xs = np.meshgrid(
            (np.arange(hl, dtype=np.float32) + 0.5) / hl,
            (np.arange(wl, dtype=np.float32) + 0.5) / wl, indexing="ij")
        pts.append(np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1))
    ref = np.concatenate(pts, axis=0)  # (S, 2)
    return np.broadcast_to(ref[:, None, :],
                           (ref.shape[0], len(spatial_shapes), 2)).copy()


class PixelDecoder(nn.Module):
    """MSDeformAttnPixelDecoder (msdeformattn.py:165-360). Returns
    (mask_features (B, H/4, W/4, 256), [3 decoder-scale feature maps])."""

    conv_dim: int = 256
    mask_dim: int = 256
    enc_layers: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]):
        d = self.dtype
        # top-down transformer inputs: res5, res4, res3
        names = ["res5", "res4", "res3"]
        srcs, poss, shapes = [], [], []
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (3, self.conv_dim), jnp.float32)
        for i, f in enumerate(names):
            x = features[f]
            x = nn.Conv(self.conv_dim, (1, 1), dtype=d,
                        name=f"input_proj_{i}")(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                             name=f"input_norm_{i}")(x)
            b, h, w, _ = x.shape
            pe = jnp.asarray(sine_position_embedding(h, w, self.conv_dim))
            srcs.append(x.reshape(b, h * w, self.conv_dim))
            poss.append((pe.reshape(1, h * w, self.conv_dim)
                         + level_embed[i][None, None]).astype(jnp.float32))
            shapes.append((h, w))

        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        ref = jnp.asarray(encoder_reference_points(shapes))[None]
        ref = jnp.broadcast_to(ref, (src.shape[0],) + ref.shape[1:])

        for i in range(self.enc_layers):
            src = DeformableEncoderLayer(dtype=d, name=f"enc_{i}")(
                src, pos, ref, shapes)

        # split back to per-level maps (top-down order: res5, res4, res3)
        out = []
        start = 0
        for (h, w) in shapes:
            out.append(src[:, start:start + h * w].reshape(-1, h, w,
                                                           self.conv_dim))
            start += h * w

        # one extra FPN level onto res2 (common_stride 4)
        from prismer_tpu.experts.depth.model import \
            _bilinear_half_pixel_matrix  # half-pixel bilinear, ac=False
        r2 = features["res2"]
        lateral = nn.Conv(self.conv_dim, (1, 1), use_bias=False, dtype=d,
                          name="adapter_1")(r2)
        lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                               name="adapter_norm_1")(lateral)
        up = _resize_bilinear_half(out[-1], r2.shape[1], r2.shape[2])
        y = lateral + up
        y = nn.Conv(self.conv_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=d, name="layer_1")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="layer_norm_1")(y)
        y = nn.relu(y)

        mask_features = nn.Conv(self.mask_dim, (1, 1), dtype=d,
                                name="mask_features")(y)
        return mask_features, out  # out = [res5', res4', res3'] at 256ch


def _resize_bilinear_half(x: jax.Array, oh: int, ow: int) -> jax.Array:
    """bilinear, align_corners=False (torch default) NHWC resize."""
    from prismer_tpu.experts.depth.model import _bilinear_half_pixel_matrix
    wh = jnp.asarray(_bilinear_half_pixel_matrix(x.shape[1], oh))
    ww = jnp.asarray(_bilinear_half_pixel_matrix(x.shape[2], ow))
    y = jnp.einsum("oh,bhwc->bowc", wh, x.astype(jnp.float32))
    return jnp.einsum("ow,bhwc->bhoc", ww, y).astype(x.dtype)


class MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent with additive float mask."""

    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask_bias=None):
        d = q.shape[-1]
        hd = d // self.heads

        def split(t, name):
            t = nn.Dense(d, dtype=self.dtype, name=name)(t)
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd
                             ).transpose(0, 2, 1, 3)

        qh = split(q, "q_proj")
        kh = split(k, "k_proj")
        vh = split(v, "v_proj")
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        if mask_bias is not None:
            s = s + mask_bias
        p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        o = o.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(o)


class MaskedTransformerDecoder(nn.Module):
    """MultiScaleMaskedTransformerDecoder (post-norm variant)."""

    num_queries: int = 200
    hidden_dim: int = 256
    heads: int = 8
    dec_layers: int = 9
    num_classes: int = 133
    mask_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ms_features: List[jax.Array],
                 mask_features: jax.Array):
        d = self.dtype
        b = mask_features.shape[0]
        q = self.num_queries
        hd = self.hidden_dim

        query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                (q, hd), jnp.float32)
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (q, hd), jnp.float32)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (3, hd), jnp.float32)

        srcs, poss, sizes = [], [], []
        for i, x in enumerate(ms_features):
            _, h, w, _ = x.shape
            pe = jnp.asarray(sine_position_embedding(h, w, hd))
            srcs.append(x.reshape(b, h * w, hd)
                        + level_embed[i][None, None].astype(x.dtype))
            poss.append(pe.reshape(1, h * w, hd))
            sizes.append((h, w))

        output = jnp.broadcast_to(query_feat[None].astype(d), (b, q, hd))
        qpos = query_embed[None].astype(jnp.float32)

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, dtype=d,
                               name="class_embed")
        mask_mlp = [nn.Dense(hd, dtype=d, name="mask_mlp_0"),
                    nn.Dense(hd, dtype=d, name="mask_mlp_1"),
                    nn.Dense(self.mask_dim, dtype=d, name="mask_mlp_2")]

        def prediction(output, target_size):
            dec = decoder_norm(output)
            cls = class_embed(dec)
            m = dec
            for layer in mask_mlp[:2]:
                m = nn.relu(layer(m))
            m = mask_mlp[2](m)
            masks = jnp.einsum("bqc,bhwc->bqhw", m.astype(jnp.float32),
                               mask_features.astype(jnp.float32))
            # attention mask at the next scale: blocked where sigmoid < 0.5
            small = _resize_bilinear_half(
                masks.transpose(0, 2, 3, 1), *target_size
            ).transpose(0, 3, 1, 2)                       # (B, Q, h, w)
            blocked = (jax.nn.sigmoid(small) < 0.5)
            blocked = blocked.reshape(b, q, -1)
            # rows that mask everything attend everywhere instead
            all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
            blocked = jnp.where(all_blocked, False, blocked)
            bias = jnp.where(blocked[:, None], -1e9, 0.0)  # (B, 1, Q, S)
            return cls, masks, bias

        classes, masks, attn_bias = prediction(output, sizes[0])
        for i in range(self.dec_layers):
            li = i % 3
            # masked cross-attention (cross first — mask2former ordering)
            h = MHA(self.heads, dtype=d, name=f"cross_{i}")(
                output.astype(jnp.float32) + qpos,
                srcs[li].astype(jnp.float32) + poss[li],
                srcs[li].astype(jnp.float32), attn_bias)
            output = nn.LayerNorm(epsilon=1e-5,
                                  name=f"cross_norm_{i}")(output + h)
            # self-attention
            h = MHA(self.heads, dtype=d, name=f"self_{i}")(
                output.astype(jnp.float32) + qpos,
                output.astype(jnp.float32) + qpos, output)
            output = nn.LayerNorm(epsilon=1e-5,
                                  name=f"self_norm_{i}")(output + h)
            # FFN
            f = nn.Dense(2048, dtype=d, name=f"ffn1_{i}")(output)
            f = nn.relu(f)
            f = nn.Dense(hd, dtype=d, name=f"ffn2_{i}")(f)
            output = nn.LayerNorm(epsilon=1e-5,
                                  name=f"ffn_norm_{i}")(output + f)
            classes, masks, attn_bias = prediction(output,
                                                   sizes[(i + 1) % 3])
        return classes, masks


class MaskFormer(nn.Module):
    """Full segmentation expert. Input: ImageNet-normalized NHWC (the
    detectron2 pixel mean/std are applied by the caller). Output: semantic
    logits (B, num_classes, H/4, W/4) — argmax'd + resized by the generator
    (generate_segmentation.py:41-55)."""

    num_classes: int = 133  # 150 for ADE
    num_queries: int = 200
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feats = SwinTransformer(dtype=self.dtype, name="backbone")(x)
        mask_features, ms = PixelDecoder(dtype=self.dtype,
                                         name="pixel_decoder")(feats)
        classes, masks = MaskedTransformerDecoder(
            num_queries=self.num_queries, num_classes=self.num_classes,
            dtype=self.dtype, name="predictor")(ms, mask_features)
        # semantic inference (maskformer_model.py:280-284)
        cls_prob = jax.nn.softmax(classes.astype(jnp.float32),
                                  axis=-1)[..., :-1]
        mask_prob = jax.nn.sigmoid(masks)
        return jnp.einsum("bqc,bqhw->bchw", cls_prob, mask_prob)
