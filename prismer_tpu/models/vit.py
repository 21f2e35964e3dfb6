"""Multi-modal ViT encoder (CLIP trunk + expert stems + resampler + adaptors).

TPU-native re-design of the reference encoder (model/modules/vit.py):

  * per-modality conv stems (vit.py:83-120): plain patchify conv for RGB; a
    bilinear-downsample + 5-conv BN/ReLU stack for 64-channel id-map experts
    (seg / obj_detection / ocr_detection); a 16x-downsampling 5-conv stack for
    dense experts (depth / normal / edge). NHWC layout (TPU conv-native).
  * shared positional embedding, bicubically re-interpolated per modality
    (vit.py:152-158).
  * random-slot instance embedding for obj_detection: every distinct instance
    id is assigned a random row of a 128-row table each forward
    (vit.py:141-148). The reference loops over `.unique()` with python
    randint; we draw one random slot per possible uint8 id and gather —
    identical semantics (ids share slots batch-wide), no data-dependent
    control flow.
  * PerceiverResampler compressing all expert tokens to 64 latents
    (vit.py:161-165).
  * trunk of pre-LN residual attention blocks with an Adaptor between
    attention and MLP (vit.py:70-75), QuickGELU MLPs (vit.py:42-47).

Everything is batch-first, statically shaped; LayerNorm/softmax in fp32.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from prismer_tpu.config import VisionEncoderConfig
from prismer_tpu.models.layers import (Adaptor, LayerNorm, Mlp,
                                       MultiHeadAttention,
                                       interpolate_pos_embed)
from prismer_tpu.models.resampler import PerceiverResampler
from prismer_tpu.ops.resize import bilinear_resize_align_corners, nearest_resize


def draw_instance_slots(key: jax.Array, max_instances: int,
                        num_slots: int) -> jax.Array:
    """Per-forward random slot assignment for the instance embedding
    (vit.py:146 re-rolls python random.randint every forward). Module-level
    so the reference-oracle test can pin BOTH implementations to one recorded
    slot sequence (the reference draws via python random, which no jax key
    can reproduce)."""
    return jax.random.randint(key, (max_instances,), 0, num_slots)

Dtype = Any

# modality groups (vit.py:86-120)
ID_MAP_EXPERTS = ("seg", "obj_detection", "ocr_detection")
DENSE_EXPERTS = ("depth", "normal", "edge")


class ResidualAttentionBlock(nn.Module):
    """Pre-LN CLIP block split into attention and MLP halves so the Adaptor
    can run between them (vit.py:55-59, 70-75)."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from prismer_tpu.models.layers import use_ln_proj
        dim = x.shape[-1]
        attn = MultiHeadAttention(num_heads=self.num_heads, dtype=self.dtype,
                                  name="attn")
        mlp = Mlp(hidden_dim=dim * 4, out_dim=dim, activation="quick_gelu",
                  dtype=self.dtype, name="mlp")
        if use_ln_proj() and not self.is_initializing():
            # fused LN->consumer path (ops/ln_proj.py): the pre-LNs run
            # inside the qkv / c_fc kernels instead of as separate HBM
            # round-trips; params stay under the ln_1/ln_2 child scopes
            p1 = self.get_variable("params", "ln_1")
            p2 = self.get_variable("params", "ln_2")
            x = x + attn(x, pre_ln=(p1["scale"], p1["bias"]))
            x = Adaptor(norm_late=False, dtype=self.dtype, name="adaptor")(x)
            x = x + mlp(x, pre_ln=(p2["scale"], p2["bias"]))
            return x
        x = x + attn(LayerNorm(name="ln_1")(x))
        x = Adaptor(norm_late=False, dtype=self.dtype, name="adaptor")(x)
        x = x + mlp(LayerNorm(name="ln_2")(x))
        return x


def _conv3(features: int, stride: int, dtype) -> nn.Conv:
    return nn.Conv(features, kernel_size=(3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), use_bias=False, dtype=dtype)


class LabelStem(nn.Module):
    """Downsampling conv stack for expert label maps (vit.py:88-120).

    id_map=True: bilinear scale 4/patch, strides (2,2,1,1) — 64-ch experts.
    id_map=False: bilinear scale 16/patch, strides (2,2,2,2) — dense experts.
    All convs bias-free; BatchNorm+ReLU after each except the final 1x1.
    """

    width: int
    patch_size: int
    id_map: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        scale = (4 if self.id_map else 16) / self.patch_size
        out_h, out_w = int(h * scale), int(w * scale)
        # hot path: compute-dtype MXU resize (the reference stems run under
        # fp16 AMP anyway, train_caption.py:39)
        x = bilinear_resize_align_corners(
            x.astype(self.dtype), out_h, out_w, precision=None)

        strides = (2, 2, 1, 1) if self.id_map else (2, 2, 2, 2)
        widths = (self.width // 8, self.width // 4, self.width // 2, self.width)
        for i, (s, f) in enumerate(zip(strides, widths)):
            x = _conv3(f, s, self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"bn_{i}")(x).astype(self.dtype)
            x = nn.relu(x)
        x = nn.Conv(self.width, kernel_size=(1, 1), use_bias=False,
                    dtype=self.dtype, name="proj")(x)
        return x


class VisionTransformer(nn.Module):
    """The full multi-modal encoder (vit.py:78-172). Returns (B, L, D)."""

    cfg: VisionEncoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Dict[str, Any], train: bool = False) -> jax.Array:
        cfg = self.cfg
        width = cfg.width
        scale = width ** -0.5
        pos_embed = self.param(
            "positional_embedding",
            lambda key, shape: scale * jax.random.normal(key, shape, jnp.float32),
            (cfg.rgb_tokens, width),
        )

        experts_tokens = []
        rgb_tokens = None
        for exp, _channels in cfg.experts:
            if exp not in inputs:
                raise KeyError(f"missing modality input: {exp}")
            if exp == "rgb":
                # padding VALID: torch Conv2d semantics (vit.py:86) — at
                # ViT-L/14 x 480px this is 34x34 tokens, not SAME's 35x35
                x = nn.Conv(width, kernel_size=(cfg.patch_size, cfg.patch_size),
                            strides=(cfg.patch_size, cfg.patch_size),
                            padding="VALID", use_bias=False, dtype=self.dtype,
                            name="conv1_rgb")(inputs[exp].astype(self.dtype))
            elif exp in ID_MAP_EXPERTS:
                raw = inputs[exp]["label"] if exp == "obj_detection" else inputs[exp]
                stem_name = "conv1_seg" if exp == "seg" else f"conv1_{exp}"
                x = LabelStem(width=width, patch_size=cfg.patch_size,
                              id_map=True, dtype=self.dtype,
                              name=stem_name)(raw.astype(self.dtype), train=train)
                if exp == "obj_detection":
                    x = self._add_instance_embedding(x, inputs[exp]["instance"])
            else:  # dense experts
                x = LabelStem(width=width, patch_size=cfg.patch_size,
                              id_map=False, dtype=self.dtype,
                              name=f"conv1_{exp}")(
                    inputs[exp].astype(self.dtype), train=train)

            b, h, w_, d = x.shape
            x = x.reshape(b, h * w_, d)
            if exp == "rgb":
                rgb_tokens = x + pos_embed.astype(x.dtype)
            else:
                pe = interpolate_pos_embed(pos_embed, x.shape[1]).astype(x.dtype)
                experts_tokens.append(x + pe)

        if experts_tokens:
            expert_cat = jnp.concatenate(experts_tokens, axis=1)
            latents = PerceiverResampler(
                layers=cfg.resampler_layers, num_heads=cfg.resampler_heads,
                num_latents=cfg.resampler_latents, dtype=self.dtype,
                name="resampler")(expert_cat)
            x = jnp.concatenate([rgb_tokens, latents], axis=1)
        else:
            x = rgb_tokens

        x = LayerNorm(name="ln_pre")(x)
        block = ResidualAttentionBlock
        if train:
            # rematerialize trunk blocks in training to trade FLOPs for HBM
            # (PRISMER_REMAT=0 disables — cost-measurement knob, see
            # roberta.py setup)
            import os
            if os.environ.get("PRISMER_REMAT") != "0":
                block = nn.remat(ResidualAttentionBlock)
        for i in range(cfg.layers):
            x = block(num_heads=cfg.heads, dtype=self.dtype,
                      name=f"resblocks_{i}")(x)
        x = LayerNorm(name="ln_post")(x)
        return x

    def _add_instance_embedding(self, x: jax.Array, instance: jax.Array) -> jax.Array:
        """Random-slot instance embedding (vit.py:126, 141-148).

        `instance` is the (B, 224, 224, 1) uint8 instance-id map; it is
        nearest-downsampled to the stem output grid, each id is assigned a
        random slot of the 128-row table (re-rolled every forward via the
        'instance' RNG stream), and the embedding is added."""
        cfg = self.cfg
        table = self.param(
            "instance_embedding",
            lambda key, shape: (cfg.width ** -0.5) * jax.random.normal(
                key, shape, jnp.float32),
            (cfg.num_instance_slots, cfg.width),
        )
        # the reference re-rolls python randint every forward, train AND eval
        # (vit.py:146); we use the 'instance' RNG stream when provided and a
        # fixed key otherwise (deterministic eval)
        key = (self.make_rng("instance") if self.has_rng("instance")
               else jax.random.key(0))
        slots = draw_instance_slots(key, cfg.max_instances,
                                    cfg.num_instance_slots)
        inst_small = nearest_resize(instance.astype(jnp.int32),
                                    x.shape[1], x.shape[2])[..., 0]
        emb = table.astype(x.dtype)[slots[inst_small]]
        return x + emb
