"""Perceiver-style experts resampler.

Compresses the concatenated expert-modality token streams into a small set of
learned latents via cross-attention (reference: model/modules/resampler.py).
Per block (resampler.py:33-36):

    latents += Attn(q = LN1(latents), kv = concat[LN1(latents), LN2(x)])
    latents += MLP_sq_relu(LN_ff(latents))

Batch-first (B, L, D) — the torch reference is sequence-first.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from prismer_tpu.models.layers import LayerNorm, Mlp, MultiHeadAttention

Dtype = Any


class PerceiverAttentionBlock(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, latents: jax.Array) -> jax.Array:
        dim = latents.shape[-1]
        ln_1 = LayerNorm(name="ln_1")
        ln_2 = LayerNorm(name="ln_2")
        ln_ff = LayerNorm(name="ln_ff")
        q = ln_1(latents)
        kv = jnp.concatenate([ln_1(latents), ln_2(x)], axis=1)
        latents = latents + MultiHeadAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn")(q, kv)
        latents = latents + Mlp(
            hidden_dim=dim * 4, out_dim=dim, activation="squared_relu",
            dtype=self.dtype, name="mlp")(ln_ff(latents))
        return latents


class PerceiverResampler(nn.Module):
    """64 learned latents attending over expert tokens (resampler.py:39-52)."""

    layers: int = 4
    num_heads: int = 8
    num_latents: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, _, dim = x.shape
        scale = dim ** -0.5
        latents = self.param(
            "latents",
            lambda key, shape: scale * jax.random.normal(key, shape, jnp.float32),
            (self.num_latents, dim),
        )
        lat = jnp.broadcast_to(latents.astype(self.dtype)[None], (b, self.num_latents, dim))
        for i in range(self.layers):
            lat = PerceiverAttentionBlock(
                num_heads=self.num_heads, dtype=self.dtype,
                name=f"blocks_{i}")(x, lat)
        return lat
