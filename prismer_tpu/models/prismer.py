"""Prismer core model: multi-modal encoder + causal text decoder.

Re-design of the reference assembly (model/prismer.py:15-37). Freeze modes
(prepare_to_train, model/prismer.py:39-59) are NOT implemented by mutating
parameters here — trainability is an optimizer-side partition of the param
pytree (see prismer_tpu.train.optim.freeze_labels), which is the idiomatic
JAX separation of sharding/trainability from the model definition. There is
no FSDP `ignored_modules` equivalent (model/prismer.py:61-94) because
sharding is likewise an external NamedSharding spec.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prismer_tpu.config import PrismerConfig
from prismer_tpu.models.roberta import Cache, RobertaCausalDecoder
from prismer_tpu.models.vit import VisionTransformer

Dtype = Any

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float16": jnp.float16}


def compute_dtype(cfg) -> Any:
    """The model's compute dtype (PrismerConfig.dtype as a jnp dtype) —
    also the storage dtype callers should materialize expert inputs in
    (data/device.materialize_experts)."""
    return _DTYPES[cfg.dtype]


class Prismer(nn.Module):
    """Expert encoder + text decoder. All task heads build on these methods."""

    cfg: PrismerConfig

    def setup(self):
        dtype = _DTYPES[self.cfg.dtype]
        self.expert_encoder = VisionTransformer(self.cfg.vision, dtype=dtype)
        self.text_decoder = RobertaCausalDecoder(self.cfg.decoder, dtype=dtype)

    def encode(self, experts: Dict[str, Any], train: bool = False) -> jax.Array:
        """Run the multi-modal encoder; returns (B, L, vision_hidden)."""
        return self.expert_encoder(experts, train=train)

    def decode_logits(self, input_ids: jax.Array, attention_mask: jax.Array,
                      encoder_hidden_states: jax.Array,
                      train: bool = False, cross_groups: int = 1) -> jax.Array:
        """Full-sequence decoder logits (training / rank scoring).

        cross_groups > 1: input rows are G candidates per sample while
        encoder_hidden_states stays UNTILED (B, L, D) — cross-K/V are
        projected once per sample (rank pass 2, roberta.py
        attend_grouped_full)."""
        return self.text_decoder(input_ids, attention_mask,
                                 encoder_hidden_states, train=train,
                                 cross_groups=cross_groups)

    def decode_loss(self, input_ids: jax.Array, attention_mask: jax.Array,
                    encoder_hidden_states: jax.Array, targets: jax.Array,
                    train: bool = False, cross_groups: int = 1) -> jax.Array:
        """Per-sample summed label-smoothed CE straight from decoder
        features — routes through the fused LM-head+CE kernel
        (ops/fused_ce.py) when enabled, so the (B, L, V) logits never hit
        HBM (reference loss spec: model/modules/roberta.py:383-387)."""
        return self.text_decoder.per_sample_loss(
            input_ids, attention_mask, encoder_hidden_states, targets,
            train=train, cross_groups=cross_groups)

    def forward_loss(self, experts: Dict[str, Any], input_ids: jax.Array,
                     attention_mask: jax.Array, targets: jax.Array,
                     train: bool = False) -> jax.Array:
        """Encoder + decoder -> (B,) per-sample summed smoothed CE."""
        enc = self.encode(experts, train=train)
        return self.decode_loss(input_ids, attention_mask, enc, targets,
                                train=train)

    def __call__(self, experts: Dict[str, Any], input_ids: jax.Array,
                 attention_mask: jax.Array, train: bool = False) -> jax.Array:
        """Encoder + decoder forward -> (B, L, vocab) logits."""
        enc = self.encode(experts, train=train)
        return self.decode_logits(input_ids, attention_mask, enc, train=train)

    # cached generation entry points (used under jit by generation.py)
    def init_cache(self, input_ids: jax.Array, attention_mask: jax.Array,
                   encoder_hidden_states: jax.Array, max_len: int,
                   beams: int = 1, return_h: bool = False
                   ) -> Tuple[jax.Array, Cache]:
        return self.text_decoder.init_cache(
            input_ids, attention_mask, encoder_hidden_states, max_len,
            beams=beams, return_h=return_h)

    def decode_step(self, token_ids: jax.Array, index: jax.Array,
                    position_ids: jax.Array, key_mask: jax.Array,
                    cache: Cache, beams: int = 1,
                    cross_len: int = None,
                    perm: jax.Array = None,
                    return_h: bool = False) -> Tuple[jax.Array, Cache]:
        return self.text_decoder.decode_step(
            token_ids, index, position_ids, key_mask, cache, beams=beams,
            cross_len=cross_len, perm=perm, return_h=return_h)


def prepare_serving_variables(model: Prismer,
                              variables: Dict[str, Any]) -> Dict[str, Any]:
    """One-time serving setup: precompute the fused-decode packed weight
    tensors into a `packed_decode` variable collection so jitted generate
    calls skip the ~5 ms in-graph re-packing (models/roberta.py
    pack_decode_collection). Returns a new variables dict; a no-op (same
    leaves passed through) when the fused decode kernel is not in use.

    Weight-layout work belongs at load time, like the bf16 cast — the
    packed tensors are as static as the params themselves."""
    from prismer_tpu.models.roberta import (pack_decode_collection,
                                            use_fused_decode)
    if not use_fused_decode():
        return variables
    dtype = _DTYPES[model.cfg.dtype]
    packed = pack_decode_collection(
        variables["params"]["text_decoder"], model.cfg.decoder, dtype,
        with_emb_t=True)
    out = dict(variables)
    out["packed_decode"] = {"text_decoder": packed}
    return out
