"""RoBERTa-style causal decoder with per-layer cross-attention and adaptors.

TPU-native re-design of the reference decoder (model/modules/roberta.py):

  * each decoder layer runs self-attn -> cross-attn -> adaptor -> MLP
    (roberta.py:223-227); a final layer without cross-attention finishes the
    stack (roberta.py:210,230-231).
  * cross-attention keys/values project from `vision_hidden_size`
    (roberta.py:87-89).
  * RoBERTa position ids: pad positions are skipped, numbering starts at
    pad_token_id + 1 (roberta.py:38-45).
  * LM head = dense -> gelu -> LayerNorm -> tied-embedding projection + bias
    (roberta.py:409-430).
  * per-sample *summed* label-smoothed (0.1) cross-entropy (roberta.py:383-387).

Major TPU-first departure: the reference has no KV cache — HF `generate`
re-runs the full sequence every decode step (roberta.py:358-406). Here every
attention layer supports an explicit, functional KV cache (a pytree threaded
through `lax` decode loops), and cross-attention K/V are computed exactly once
per sequence. Batch-first, static shapes, fp32 LayerNorm/softmax.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prismer_tpu.config import TextDecoderConfig
from prismer_tpu.models.layers import (NEG_INF, Adaptor, LayerNorm,
                                       attention, gelu_exact, merge_heads,
                                       split_heads)

Dtype = Any

Cache = Dict[str, jax.Array]

# Decode cross-attention implementation, bound ONCE at import (the flag is
# read at trace time, so a post-compile os.environ flip would silently have
# no effect — process-start-scoped by design; A/B harnesses run separate
# processes). 'pallas' selects ops/decode_attention.grouped_cross_attention_t.
DECODE_CROSS_IMPL = os.environ.get("PRISMER_DECODE_CROSS", "xla")

# Fused whole-step decode kernel (ops/fused_decode.py): 'auto' enables it on
# TPU backends only (the CPU interpreter is far slower than plain XLA there);
# tests force it with set_fused_decode. Read at trace time.
_FUSED_DECODE: str = os.environ.get("PRISMER_DECODE_FUSED", "auto")


def set_fused_decode(mode: str) -> None:
    """'on' | 'off' | 'auto' — must be called before the decode program is
    traced/jitted to take effect."""
    global _FUSED_DECODE
    assert mode in ("on", "off", "auto"), mode
    _FUSED_DECODE = mode


def use_fused_decode() -> bool:
    if _FUSED_DECODE == "auto":
        return jax.default_backend() == "tpu"
    return _FUSED_DECODE == "on"


def fused_rows_ok(n_rows: int, backend: Optional[str] = None) -> bool:
    """Mosaic requires second-to-last-dim memref slices to be 8-aligned: the
    fused decode kernel DMAs (1, T, N, D) slices of the self caches and
    lm_topk chunks rows along N, so on TPU the kernel serving stack needs
    N = B*beams divisible by 8 (prismer_huge @ batch 4 -> N=12 failed Mosaic
    with "Slice shape along dimension 2 must be aligned to tiling (8), but
    is 12"). CPU interpret mode has no such constraint — tiny-batch parity
    tests keep exercising the kernels there. Misaligned TPU row counts fall
    back to the XLA decode path (exact, slower)."""
    backend = backend or jax.default_backend()
    return n_rows % 8 == 0 or backend != "tpu"


def fused_dims_ok(cfg, backend: Optional[str] = None) -> bool:
    """Mosaic lane-alignment gate for the fused kernel serving stack: the
    kernels slice packed weight/cache memrefs along the lane (last) dim in
    hidden_size units, so on TPU the model dims must be 128-lane-aligned.
    Every production config is (BASE 768/3072, LARGE+huge decoder
    1024/4096); tiny test configs (hidden 64) are not — round 5's
    misaligned-BATCH padding exposed that the old row gate was the only
    thing routing them to the XLA path on chip ("Slice shape along
    dimension 2 must be aligned to tiling (128)" from a real-TPU quick-mode
    run). CPU interpret mode has no constraint."""
    backend = backend or jax.default_backend()
    if backend != "tpu":
        return True
    if cfg is None:  # config-less test stubs: no kernels on TPU
        return False
    return cfg.hidden_size % 128 == 0 and cfg.intermediate_size % 128 == 0


# int8 cross-KV serving mode (fused decode only): halves the dominant
# per-step decode HBM stream (the 13 layers re-read the full cross-K/V every
# step) at a per-(layer, sample, head) symmetric-quantization cost comparable
# to bf16 rounding (amax/127 vs 2^-8 relative). OFF by default — the bf16
# path is the parity-pinned spec; opt in for serving via PRISMER_KV_QUANT=int8
# or set_kv_quant. Read at trace time.
_KV_QUANT: str = os.environ.get("PRISMER_KV_QUANT", "off")


def set_kv_quant(mode: str) -> None:
    """'int8' | 'off' — must be called before the decode program is traced."""
    global _KV_QUANT
    assert mode in ("int8", "off"), mode
    _KV_QUANT = mode


def use_kv_quant() -> bool:
    return _KV_QUANT == "int8" and use_fused_decode()


def pack_decode_collection(decoder_params: Dict[str, Any],
                           cfg: TextDecoderConfig, dtype,
                           with_emb_t: bool = False) -> Dict[str, Any]:
    """Fused-decode packed weight tensors for the `packed_decode` variable
    collection: {"w_head", "w_tail", "b_all"} (layouts in the
    ops/fused_decode.py module docstring).

    Packing is a pure layout transform of the static decoder params, but run
    inside the jitted generate program it costs ~5 ms per call at Prismer-BASE
    b32 (XLA cannot hoist work across calls). Serving setups compute this ONCE
    via prismer.prepare_serving_variables and pass it alongside "params";
    _fused_cache falls back to in-graph packing when the collection is absent
    (training/eval paths, tiny tests)."""
    from prismer_tpu.ops.fused_decode import pack_decode_weights
    w_all, b_all = pack_decode_weights(
        [decoder_params[f"layers_{i}"]
         for i in range(cfg.num_hidden_layers)],
        decoder_params["output_layer"], cfg.hidden_size,
        cfg.intermediate_size, dtype)
    d = cfg.hidden_size
    # head/tail column split materialized once: BlockSpecs can only address
    # block-aligned offsets, so the kernel takes two tensors
    out = {"w_head": w_all[:, :, :5 * d], "w_tail": w_all[:, :, 5 * d:],
           "b_all": b_all}
    if with_emb_t:
        # pre-transposed (D, V) tied embeddings for the LM head — serving
        # setup only (the in-graph _fused_cache fallback must not pay a
        # per-call 77 MB transpose)
        we = decoder_params["embeddings"]["word_embeddings"]
        out["emb_t"] = jnp.asarray(we, dtype).T
        # vocab-padded layout + fp32 LM bias for the fused LM-head+top-k
        # kernel (ops/lm_topk.py; generation.PRISMER_LM_TOPK)
        from prismer_tpu.ops.lm_topk import pad_embedding
        out["emb_tp"], out["lm_bias_p"] = pad_embedding(
            out["emb_t"], decoder_params["lm_head"]["bias"], we.shape[0])
    return out


def create_position_ids(input_ids: jax.Array, attention_mask: jax.Array,
                        padding_idx: int) -> jax.Array:
    """Non-pad tokens numbered from padding_idx+1; pads get padding_idx
    (roberta.py:38-45). Uses the attention mask as the pad indicator."""
    mask = attention_mask.astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def decoder_mask_bias(attention_mask: jax.Array) -> jax.Array:
    """HF get_extended_attention_mask(is_decoder=True): causal AND padding.

    attention_mask: (B, L) of {0,1}. Returns (B, 1, L, L) additive fp32."""
    b, l = attention_mask.shape
    causal = jnp.tril(jnp.ones((l, l), dtype=jnp.float32))
    combined = causal[None, :, :] * attention_mask.astype(jnp.float32)[:, None, :]
    return ((1.0 - combined) * NEG_INF)[:, None, :, :]


class SelfAttentionCore(nn.Module):
    """q/k/v projections + fp32-softmax attention (roberta.py:79-126).

    For cross-attention the K/V source is the vision width — flax Dense
    infers the input dim, so no explicit kv_dim is needed. Exposes separate
    q / kv paths so the KV cache can be maintained outside."""

    cfg: TextDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.cfg.hidden_size
        self.query = nn.Dense(d, dtype=self.dtype)
        self.key = nn.Dense(d, dtype=self.dtype)
        self.value = nn.Dense(d, dtype=self.dtype)

    def project_q(self, hidden: jax.Array) -> jax.Array:
        return split_heads(self.query(hidden), self.cfg.num_attention_heads)

    def project_kv(self, source: jax.Array) -> Tuple[jax.Array, jax.Array]:
        k = split_heads(self.key(source), self.cfg.num_attention_heads)
        v = split_heads(self.value(source), self.cfg.num_attention_heads)
        return k, v

    def __call__(self, hidden: jax.Array, kv_source: jax.Array,
                 key_mask: Optional[jax.Array] = None,
                 causal: bool = False) -> jax.Array:
        """Full-sequence attention with structured masks (flash-eligible)."""
        q = self.project_q(hidden)
        k, v = self.project_kv(kv_source)
        return merge_heads(attention(q, k, v, key_mask, causal))

    def attend_t(self, hidden: jax.Array, kt: jax.Array, v: jax.Array,
                 mask_bias: Optional[jax.Array]) -> jax.Array:
        """Attention against a PRE-TRANSPOSED cached K (B, H, Dh, T) and
        natural V (B, H, T, Dh) — both matmuls MXU-layout-native, no per-step
        HBM transpose (same rationale as attend_grouped)."""
        q = self.project_q(hidden)                 # (B, H, 1, Dh)
        dh = q.shape[-1]
        s = jnp.einsum("bhqd,bhdt->bhqt", q, kt,
                       preferred_element_type=jnp.float32) / (dh ** 0.5)
        if mask_bias is not None:
            s = s + mask_bias.astype(jnp.float32)
        probs = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqt,bhtd->bhqd", probs.astype(v.dtype), v)
        return merge_heads(out)

    def attend_grouped(self, hidden: jax.Array, kt: jax.Array, v: jax.Array,
                       beams: int) -> jax.Array:
        """Beam-grouped cross-attention: queries (B*beams, P, D) against
        per-sample K/V — the K/V are shared by a sample's beams, so they are
        never tiled or reordered (3x less cache HBM than the naive
        beam-tiled layout).

        K is stored PRE-TRANSPOSED: kt (B, H, Dh, L), v (B, H, L, Dh). The
        MXU consumes rhs operands as (contract, out); with K in natural
        (L, Dh) layout XLA re-transposes the full cross-K cache in HBM every
        decode step (~1 GB/step at b32) — measured ~40% of decode time.
        Storing K^T once at prefill removes every per-step transpose: both
        matmuls below stream cache memory directly into the MXU."""
        n, p, d = hidden.shape
        b = n // beams
        q = self.project_q(hidden)                 # (B*K, H, P, Dh)
        h_heads, dh = q.shape[1], q.shape[3]
        q = q.reshape(b, beams, h_heads, p, dh).transpose(0, 2, 1, 3, 4)
        q = q.reshape(b, h_heads, beams * p, dh)
        if DECODE_CROSS_IMPL == "pallas":
            from prismer_tpu.ops.decode_attention import \
                grouped_cross_attention_t
            out = grouped_cross_attention_t(q, kt, v)
        else:
            scale = 1.0 / (dh ** 0.5)
            s = jnp.einsum("bhqd,bhdl->bhql", q, kt,
                           preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhql,bhld->bhqd", probs.astype(v.dtype), v)
        out = out.reshape(b, h_heads, beams, p, dh).transpose(0, 2, 1, 3, 4)
        return merge_heads(out.reshape(n, h_heads, p, dh))

    def attend_grouped_nat(self, hidden: jax.Array, k4: jax.Array,
                           v4: jax.Array, beams: int,
                           valid_len: int) -> jax.Array:
        """Beam-grouped cross-attention over PADDED natural-layout K/V views
        (B, Lp, H, Dh) — the fused-path prefill consumes the projections'
        native layout directly, so cross K/V never materialize the
        head-split (B, H, L, Dh) copies (two full HBM passes per tensor at
        Prismer-BASE shapes). Padding keys (l >= valid_len) are masked; the
        masked exp underflows to exactly 0, so values match the unpadded
        computation."""
        n, p, d = hidden.shape
        b, lp = k4.shape[0], k4.shape[1]
        q = self.project_q(hidden)                     # (B*K, H, P, Dh)
        h_heads, dh = q.shape[1], q.shape[3]
        q5 = q.reshape(b, beams, h_heads, p, dh)
        s = jnp.einsum("bghpd,blhd->bghpl", q5, k4,
                       preferred_element_type=jnp.float32) / (dh ** 0.5)
        if valid_len < lp:
            s = jnp.where(jnp.arange(lp)[None, None, None, None, :]
                          < valid_len, s, NEG_INF)
        probs = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bghpl,blhd->bghpd", probs.astype(v4.dtype), v4)
        out = out.reshape(n, h_heads, p, dh)
        return merge_heads(out)

    def attend_grouped_full(self, hidden: jax.Array, kv_source: jax.Array,
                            groups: int) -> jax.Array:
        """Full-sequence grouped cross-attention: queries (B*G, P, D)
        against K/V projected ONCE per sample from kv_source (B, L, D).

        The rank-inference pass 2 scores G = k_test candidate answers per
        sample; tiling the encoder states G-fold re-projects the cross-K/V
        G times (~0.5 TFLOP of pure waste per VQA sample at k_test=16) and
        materializes G copies. Here the per-sample K/V broadcast over the
        group inside the einsum. Cross-attention in this stack never
        carries a key mask (encoder states are full-length)."""
        n, p, d = hidden.shape
        b = kv_source.shape[0]
        assert n == b * groups, (n, b, groups)
        q = self.project_q(hidden)                     # (B*G, H, P, Dh)
        k, v = self.project_kv(kv_source)              # (B, H, L, Dh)
        h_heads, dh = q.shape[1], q.shape[3]
        q = q.reshape(b, groups, h_heads, p, dh)
        s = jnp.einsum("bghpd,bhld->bghpl", q, k,
                       preferred_element_type=jnp.float32) / (dh ** 0.5)
        probs = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bghpl,bhld->bghpd", probs.astype(v.dtype), v)
        return merge_heads(out.reshape(n, h_heads, p, dh))


class AttentionOutput(nn.Module):
    """dense -> dropout -> LayerNorm(residual) (roberta.py:129-140)."""

    cfg: TextDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.dense = nn.Dense(self.cfg.hidden_size, dtype=self.dtype)
        self.ln = LayerNorm(eps=self.cfg.layer_norm_eps)
        self.dropout = nn.Dropout(self.cfg.hidden_dropout_prob)

    def __call__(self, hidden: jax.Array, residual: jax.Array,
                 train: bool = False) -> jax.Array:
        hidden = self.dense(hidden)
        hidden = self.dropout(hidden, deterministic=not train)
        return self.ln(hidden + residual)


class FeedForward(nn.Module):
    """intermediate dense+gelu then output dense + LN(residual)
    (roberta.py:160-183)."""

    cfg: TextDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.intermediate = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype)
        self.out = AttentionOutput(self.cfg, dtype=self.dtype)

    def __call__(self, hidden: jax.Array, train: bool = False) -> jax.Array:
        h = gelu_exact(self.intermediate(hidden))
        return self.out(h, hidden, train=train)


class DecoderLayer(nn.Module):
    """[self-attn, cross-attn, adaptor, MLP] (roberta.py:205-227).

    with_cross=False gives the final output_layer (roberta.py:210)."""

    cfg: TextDecoderConfig
    with_cross: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = SelfAttentionCore(self.cfg, dtype=self.dtype)
        self.self_out = AttentionOutput(self.cfg, dtype=self.dtype)
        if self.with_cross:
            self.cross_attn = SelfAttentionCore(self.cfg, dtype=self.dtype)
            self.cross_out = AttentionOutput(self.cfg, dtype=self.dtype)
            self.adaptor = Adaptor(norm_late=True, dtype=self.dtype)
        self.mlp = FeedForward(self.cfg, dtype=self.dtype)

    def __call__(self, hidden: jax.Array, attention_mask: jax.Array,
                 encoder_hidden_states: Optional[jax.Array],
                 train: bool = False, cross_groups: int = 1) -> jax.Array:
        h = self.self_attn(hidden, hidden, attention_mask, causal=True)
        hidden = self.self_out(h, hidden, train=train)
        if self.with_cross:
            if cross_groups > 1:
                h = self.cross_attn.attend_grouped_full(
                    hidden, encoder_hidden_states, cross_groups)
            else:
                h = self.cross_attn(hidden, encoder_hidden_states)
            hidden = self.cross_out(h, hidden, train=train)
            hidden = self.adaptor(hidden)
        return self.mlp(hidden, train=train)

    # ---- cached decode paths -------------------------------------------
    def prefill(self, hidden: jax.Array, attention_mask: jax.Array,
                cross_kt: Optional[jax.Array], cross_v: Optional[jax.Array],
                max_len: int, beams: int = 1, cross_nat: bool = False,
                valid_len: int = 0
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Full pass over the prompt; returns (hidden, k_cache, v_cache) with
        the prompt K/V written at positions [0, L) of a (B,H,max_len,Dh)
        buffer. hidden may be beam-tiled (B*beams rows) while cross K/V stay
        per-sample (B rows). cross_nat=True: cross_kt/cross_v are padded
        natural-layout (B, Lp, H, Dh) views with true length valid_len
        (fused-path prefill, attend_grouped_nat)."""
        q = self.self_attn.project_q(hidden)
        k, v = self.self_attn.project_kv(hidden)
        h = merge_heads(attention(q, k, v, attention_mask, causal=True))
        hidden = self.self_out(h, hidden)
        if self.with_cross:
            if cross_nat:
                h = self.cross_attn.attend_grouped_nat(
                    hidden, cross_kt, cross_v, beams, valid_len)
            else:
                h = self.cross_attn.attend_grouped(hidden, cross_kt,
                                                   cross_v, beams)
            hidden = self.cross_out(h, hidden)
            hidden = self.adaptor(hidden)
        hidden = self.mlp(hidden)
        pad = [(0, 0), (0, 0), (0, max_len - k.shape[2]), (0, 0)]
        # self-K cached pre-transposed, same layout rationale as cross-K
        return hidden, jnp.pad(k, pad).transpose(0, 1, 3, 2), jnp.pad(v, pad)

    def project_cross_kv_flat(self, encoder_hidden_states: jax.Array
                              ) -> Tuple[jax.Array, jax.Array]:
        """Un-head-split cross K/V (B, L, D). The fused-path packer consumes
        the natural layout directly — V IS the kernel's vc layout after row
        padding, K needs a single transpose — so the head-split
        (B, H, L, Dh) intermediates (two extra full copies per tensor) are
        never built."""
        return (self.cross_attn.key(encoder_hidden_states),
                self.cross_attn.value(encoder_hidden_states))

    def project_step_kv(self, hidden: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
        """This step's self K/V columns: (B, H, Dh, 1) transposed-K layout
        and (B, H, 1, Dh) natural V — written into the stacked cache by the
        caller (one fused in-place update per tensor instead of a per-layer
        slice + re-stack, which the trace showed as thousands of tiny
        copy/update ops per decode pass)."""
        k_new, v_new = self.self_attn.project_kv(hidden)  # (B,H,1,Dh)
        return k_new.transpose(0, 1, 3, 2), v_new

    def decode_attend(self, hidden: jax.Array,
                      kt_cache: jax.Array, v_cache: jax.Array,
                      key_mask_bias: jax.Array,
                      cross_kt: Optional[jax.Array],
                      cross_v: Optional[jax.Array],
                      beams: int = 1) -> jax.Array:
        """One-token step over an already-updated cache slice."""
        h = self.self_attn.attend_t(hidden, kt_cache, v_cache, key_mask_bias)
        hidden = self.self_out(h, hidden)
        if self.with_cross:
            h = self.cross_attn.attend_grouped(hidden, cross_kt, cross_v,
                                               beams)
            hidden = self.cross_out(h, hidden)
            hidden = self.adaptor(hidden)
        return self.mlp(hidden)

    def project_cross_kv(self, encoder_hidden_states: jax.Array):
        return self.cross_attn.project_kv(encoder_hidden_states)


class Embeddings(nn.Module):
    """word + position + token-type embeddings, LN, dropout
    (roberta.py:48-76). Exposes the word table for LM-head weight tying."""

    cfg: TextDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        init = nn.initializers.normal(c.initializer_range)
        self.word_embeddings = self.param(
            "word_embeddings", init, (c.vocab_size, c.hidden_size), jnp.float32)
        self.position_embeddings = self.param(
            "position_embeddings", init,
            (c.max_position_embeddings, c.hidden_size), jnp.float32)
        self.token_type_embeddings = self.param(
            "token_type_embeddings", init,
            (c.type_vocab_size, c.hidden_size), jnp.float32)
        self.ln = LayerNorm(eps=c.layer_norm_eps)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids: jax.Array, position_ids: jax.Array,
                 train: bool = False) -> jax.Array:
        emb = (self.word_embeddings[input_ids]
               + self.position_embeddings[position_ids]
               + self.token_type_embeddings[0][None, None, :])
        emb = self.ln(emb.astype(self.dtype))
        return self.dropout(emb, deterministic=not train)


class LMHead(nn.Module):
    """dense -> gelu -> LN -> tied-embedding decoder + bias (roberta.py:409-426)."""

    cfg: TextDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.dense = nn.Dense(self.cfg.hidden_size, dtype=self.dtype)
        self.ln = LayerNorm(eps=self.cfg.layer_norm_eps)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.cfg.vocab_size,), jnp.float32)

    def features(self, hidden: jax.Array) -> jax.Array:
        """dense -> gelu -> LN — everything before the tied-embedding
        projection. The fused LM-head+top-k kernel (ops/lm_topk.py) consumes
        these features directly and never materializes logits."""
        return self.ln(gelu_exact(self.dense(hidden)))

    def __call__(self, hidden: jax.Array, word_embeddings: jax.Array,
                 emb_t: Optional[jax.Array] = None) -> jax.Array:
        h = self.features(hidden)
        # compute-dtype inputs, fp32 MXU accumulation (the reference runs
        # this projection under fp16 AMP, train_caption.py:39)
        if emb_t is not None:
            # serving: pre-transposed (D, V) tied embeddings from the
            # packed_decode collection — no (V, D) relayout work inside the
            # decode loop; same contraction, same fp32 accumulation
            logits = jnp.einsum("bld,dv->blv", h.astype(self.dtype), emb_t,
                                preferred_element_type=jnp.float32)
        else:
            logits = jnp.einsum("bld,vd->blv", h.astype(self.dtype),
                                word_embeddings.astype(self.dtype),
                                preferred_element_type=jnp.float32)
        return logits + self.bias[None, None, :]


class RobertaCausalDecoder(nn.Module):
    """The full decoder: embeddings -> N x DecoderLayer -> output layer -> LM head.

    Three entry points:
      __call__        — full-sequence logits (training / rank scoring)
      init_cache      — prefill prompt, build KV cache, return last logits
      decode_step     — one cached token step
    """

    cfg: TextDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embeddings = Embeddings(c, dtype=self.dtype)
        # __call__ (the training path) is rematerialized per layer to trade
        # FLOPs for HBM; the cached decode methods are untouched.
        # `train` (arg 4 counting self) is a static python bool.
        # PRISMER_REMAT=0 disables remat everywhere (cost-measurement knob:
        # full-block remat re-runs the whole forward in backward, ~+1/3
        # FLOPs). A/B answered 2026-08-19: remat=0 RESOURCE_EXHAUSTEDs HBM
        # at the b16/480px fine-tune shape on a 16 GB chip — remat is
        # load-bearing at real batch sizes, not a tunable.
        layer_cls = (DecoderLayer if os.environ.get("PRISMER_REMAT") == "0"
                     else nn.remat(DecoderLayer, static_argnums=(4, 5)))
        self.layers = [layer_cls(c, with_cross=True, dtype=self.dtype,
                                 name=f"layers_{i}")
                       for i in range(c.num_hidden_layers)]
        self.output_layer = layer_cls(c, with_cross=False, dtype=self.dtype)
        self.lm_head = LMHead(c, dtype=self.dtype)

    # -- full sequence ----------------------------------------------------
    def _trunk(self, input_ids: jax.Array, attention_mask: jax.Array,
               encoder_hidden_states: jax.Array, train: bool,
               cross_groups: int) -> jax.Array:
        c = self.cfg
        position_ids = create_position_ids(input_ids, attention_mask, c.pad_token_id)
        hidden = self.embeddings(input_ids, position_ids, train=train)
        enc = encoder_hidden_states.astype(self.dtype)
        for layer in self.layers:
            hidden = layer(hidden, attention_mask, enc, train,
                           cross_groups)
        return self.output_layer(hidden, attention_mask, None, train, 1)

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 encoder_hidden_states: jax.Array,
                 train: bool = False, cross_groups: int = 1) -> jax.Array:
        hidden = self._trunk(input_ids, attention_mask,
                             encoder_hidden_states, train, cross_groups)
        return self.lm_head(hidden, self.embeddings.word_embeddings)

    def per_sample_loss(self, input_ids: jax.Array, attention_mask: jax.Array,
                        encoder_hidden_states: jax.Array, targets: jax.Array,
                        train: bool = False, cross_groups: int = 1
                        ) -> jax.Array:
        """Per-sample summed label-smoothed CE without materializing logits
        when the fused LM-head+CE kernel is enabled (ops/fused_ce.py) —
        training and rank pass-2 otherwise write + re-read a (B, L, V) fp32
        logits tensor just to reduce it to (B,). Falls back to the exact
        XLA reference path (lm_head -> label_smoothed_loss) off-TPU."""
        from prismer_tpu.ops.fused_ce import (fused_label_smoothed_loss,
                                              use_fused_ce)
        hidden = self._trunk(input_ids, attention_mask,
                             encoder_hidden_states, train, cross_groups)
        if use_fused_ce(train=train):
            h = self.lm_head.features(hidden).astype(self.dtype)
            emb = self.embeddings.word_embeddings.astype(self.dtype)
            return fused_label_smoothed_loss(h, emb, self.lm_head.bias,
                                             targets)
        logits = self.lm_head(hidden, self.embeddings.word_embeddings)
        return label_smoothed_loss(logits, targets)

    def _serving_emb_t(self) -> Optional[jax.Array]:
        """Pre-transposed (D, V) tied embeddings from the serving-setup
        packed_decode collection (None outside serving mode)."""
        if self.has_variable("packed_decode", "emb_t"):
            return self.get_variable("packed_decode", "emb_t")
        return None

    # -- cached decode ------------------------------------------------------
    def _fused_cache(self, kts, vs, kds, vcs, kss, vss) -> Cache:
        """Assemble the fused-kernel cache: re-lay the prefill self K/V,
        stack the per-layer cross tensors (already in kernel layout — built
        straight from the natural projections in init_cache), and attach the
        packed per-layer weights (ops/fused_decode.py module docstring).
        Weights are packed ONCE per generate call and ride in the cache dict
        — repacking per step would re-stream ~2x the weight bytes. If the
        caller supplied a precomputed `packed_decode` variable collection
        (pack_decode_collection / prismer.prepare_serving_variables), the
        in-graph packing is skipped entirely: packing is a pure layout
        transform of static params that XLA cannot hoist across calls and
        costs ~5 ms per b32 generate."""
        # kt (N, H, Dh, T) -> (T, N, D); v (N, H, T, Dh) -> (T, N, D)
        self_k = jnp.stack([
            kt.transpose(3, 0, 1, 2).reshape(kt.shape[3], kt.shape[0], -1)
            for kt in kts])
        self_v = jnp.stack([
            v.transpose(2, 0, 1, 3).reshape(v.shape[2], v.shape[0], -1)
            for v in vs])
        extra = {}
        if kss:
            # per-layer (B, 1, 128) scale tensors -> (NLc, B, 1, 128)
            extra = {"cross_ks": jnp.stack(kss),
                     "cross_vs": jnp.stack(vss)}
        if self.has_variable("packed_decode", "w_head"):
            packed = {k: self.get_variable("packed_decode", k)
                      for k in ("w_head", "w_tail", "b_all")}
        else:
            packed = pack_decode_collection(self.variables["params"],
                                            self.cfg, self.dtype)
        return {"self_k_tn": self_k, "self_v_tn": self_v,
                "cross_kd": jnp.stack(kds), "cross_vc": jnp.stack(vcs),
                **extra, **packed}

    def init_cache(self, input_ids: jax.Array, attention_mask: jax.Array,
                   encoder_hidden_states: jax.Array, max_len: int,
                   beams: int = 1, return_h: bool = False
                   ) -> Tuple[jax.Array, Cache]:
        """Prefill the (right-padded) prompt. Returns (last-position logits,
        cache). The next-token distribution is logits at column L-1, matching
        HF generate on right-padded prompts. With return_h (static), the
        first element is the last position's LM-head FEATURES (N, D) instead
        — the fused LM-head+top-k kernel path (ops/lm_topk.py) never
        materializes logits.

        For beam search, pass the UNTILED encoder states (B, L, D) with
        beams=K while input_ids/attention_mask are beam-tiled (B*K rows):
        cross-attention K/V are projected and cached once per sample — the
        beams of a sample attend the shared tensors (attend_grouped), so the
        cache is K-times smaller and never reordered."""
        c = self.cfg
        position_ids = create_position_ids(input_ids, attention_mask, c.pad_token_id)
        hidden = self.embeddings(input_ids, position_ids)
        enc = encoder_hidden_states.astype(self.dtype)

        fused = (use_fused_decode() and fused_rows_ok(input_ids.shape[0])
                 and fused_dims_ok(c))
        quant = use_kv_quant()
        kts, vs = [], []
        ckts, cvs = [], []          # XLA path: head-split layouts
        kds, vcs, kss, vss = [], [], [], []  # fused path: kernel layouts
        for layer in self.layers:
            if fused:
                # natural-layout path: V IS the kernel's vc layout after
                # row padding; K takes ONE transpose; the head-split
                # (B, H, L, Dh) intermediates (two extra full HBM passes
                # per tensor) are never materialized
                from prismer_tpu.ops.fused_decode import (_round_up,
                                                          _scale_lanes,
                                                          quantize_kv_nat)
                k_nat, v_nat = layer.project_cross_kv_flat(enc)
                b_, l_, d_ = k_nat.shape
                lp = _round_up(l_, 128)
                heads, dh = c.num_attention_heads, c.head_dim
                rpad = ((0, 0), (0, lp - l_), (0, 0))
                k4 = jnp.pad(k_nat, rpad).reshape(b_, lp, heads, dh)
                v4 = jnp.pad(v_nat, rpad).reshape(b_, lp, heads, dh)
                hidden, kt, v = layer.prefill(
                    hidden, attention_mask, k4, v4, max_len, beams,
                    cross_nat=True, valid_len=l_)
                if quant:
                    k4, ks = quantize_kv_nat(k4)
                    v4, vsc = quantize_kv_nat(v4)
                    kss.append(_scale_lanes(ks))
                    vss.append(_scale_lanes(vsc))
                kds.append(k4.transpose(0, 3, 2, 1).reshape(b_, dh,
                                                            heads * lp))
                vcs.append(v4.reshape(b_, lp, d_))
            else:
                ck, cv = layer.project_cross_kv(enc)
                ckt = ck.transpose(0, 1, 3, 2)  # (B, H, Dh, L) — see
                ckts.append(ckt)                # attend_grouped layout note
                cvs.append(cv)
                hidden, kt, v = layer.prefill(hidden, attention_mask, ckt,
                                              cv, max_len, beams)
            kts.append(kt)
            vs.append(v)
        hidden, kt, v = self.output_layer.prefill(hidden, attention_mask, None, None, max_len)
        kts.append(kt)
        vs.append(v)

        if return_h:
            out = self.lm_head.features(hidden[:, -1:, :])[:, 0, :]
        else:
            out = self.lm_head(hidden[:, -1:, :],
                               self.embeddings.word_embeddings,
                               emb_t=self._serving_emb_t())[:, 0, :]
        if fused:
            return out, self._fused_cache(kts, vs, kds, vcs, kss, vss)
        cache = {
            "self_kt": jnp.stack(kts), "self_v": jnp.stack(vs),
            "cross_kt": jnp.stack(ckts), "cross_v": jnp.stack(cvs),
        }
        return out, cache

    def decode_step(self, token_ids: jax.Array, index: jax.Array,
                    position_ids: jax.Array, key_mask: jax.Array,
                    cache: Cache, beams: int = 1,
                    cross_len: Optional[int] = None,
                    perm: Optional[jax.Array] = None,
                    return_h: bool = False) -> Tuple[jax.Array, Cache]:
        """One decode step. With return_h (static), returns LM-head features
        (N, D) instead of logits (fused LM-head+top-k kernel path).

        token_ids: (B*beams,) current tokens; index: scalar write position;
        position_ids: RoBERTa position ids for these tokens; key_mask:
        (B*beams, max_len) {0,1} validity of every cache slot (after this
        token is written). The cached cross K/V are per-sample (B rows).
        cross_len: static true encoder length (required by the fused-kernel
        path, whose cross cache is lane-padded). Returns (next-token logits,
        updated cache).

        The self caches stay STACKED over layers — (NL, B, H, Dh, T) for the
        transposed K, (NL, B, H, T, Dh) for V — and each layer writes its
        one-token column in place with a single dynamic_update_slice. The
        previous per-layer slice + end-of-step jnp.stack re-materialized the
        whole 38 MB cache twice per step (the trace showed it as thousands
        of copy / update-slice fragments)."""
        if "w_head" in cache:
            return self._fused_decode_step(token_ids, index, position_ids,
                                           key_mask, cache, beams, cross_len,
                                           perm, return_h)
        assert perm is None, "perm fold is a fused-kernel-path feature"
        assert not return_h, "return_h is a fused-kernel-path feature"
        hidden = self.embeddings(token_ids[:, None], position_ids[:, None])
        key_bias = ((1.0 - key_mask.astype(jnp.float32)) * NEG_INF)[:, None, None, :]

        self_kt, self_v = cache["self_kt"], cache["self_v"]
        zero = jnp.zeros((), jnp.int32)
        all_layers = list(self.layers) + [self.output_layer]
        for i, layer in enumerate(all_layers):
            kt_new, v_new = layer.project_step_kv(hidden)
            li = jnp.asarray(i, jnp.int32)
            self_kt = jax.lax.dynamic_update_slice(
                self_kt, kt_new[None], (li, zero, zero, zero, index))
            self_v = jax.lax.dynamic_update_slice(
                self_v, v_new[None], (li, zero, zero, index, zero))
            cross_kt = cache["cross_kt"][i] if layer.with_cross else None
            cross_v = cache["cross_v"][i] if layer.with_cross else None
            hidden = layer.decode_attend(hidden, self_kt[i], self_v[i],
                                         key_bias, cross_kt, cross_v, beams)

        logits = self.lm_head(hidden, self.embeddings.word_embeddings,
                              emb_t=self._serving_emb_t())
        cache = dict(cache, self_kt=self_kt, self_v=self_v)
        return logits[:, 0, :], cache

    def _fused_decode_step(self, token_ids: jax.Array, index: jax.Array,
                           position_ids: jax.Array, key_mask: jax.Array,
                           cache: Cache, beams: int,
                           cross_len: Optional[int],
                           perm: Optional[jax.Array] = None,
                           return_h: bool = False
                           ) -> Tuple[jax.Array, Cache]:
        """Whole-step Pallas path: all layer bodies in one kernel invocation
        (ops/fused_decode.py); only embeddings, the LM head and the cache
        column writes remain XLA ops.

        perm (N,) int32 (optional): beam-search cache-reorder fold — the
        kernel permutes the self K/V rows by perm before attending and
        returns the permuted caches, replacing the caller's separate
        reorder op (generation.PRISMER_BEAM_PERM=kernel)."""
        from prismer_tpu.ops.fused_decode import fused_decode_step
        c = self.cfg
        assert cross_len is not None, "fused decode needs static cross_len"
        hidden = self.embeddings(token_ids[:, None],
                                 position_ids[:, None])[:, 0, :]
        t = cache["self_k_tn"].shape[1]
        # additive bias over cached columns: a column is attendable iff the
        # caller marks it valid AND it is not the current (not-yet-written)
        # column — the kernel folds the fresh k_new/v_new in separately.
        mask_t = key_mask.T.astype(jnp.float32)             # (T, N)
        excl = jnp.arange(t)[:, None] != index
        bias_tn = jnp.where((mask_t > 0) & excl, 0.0, NEG_INF)
        out = fused_decode_step(
            hidden, cache["w_head"], cache["w_tail"], cache["b_all"],
            cache["self_k_tn"], cache["self_v_tn"],
            bias_tn.astype(jnp.float32),
            cache["cross_kd"], cache["cross_vc"],
            cache.get("cross_ks"), cache.get("cross_vs"), perm,
            heads=c.num_attention_heads, beams=beams, valid_len=cross_len,
            eps=c.layer_norm_eps)
        hidden_out, k_new, v_new = out[0], out[1], out[2]
        base_k, base_v = ((out[3], out[4]) if perm is not None
                          else (cache["self_k_tn"], cache["self_v_tn"]))
        zero = jnp.zeros((), jnp.int32)
        self_k = jax.lax.dynamic_update_slice(
            base_k, k_new[:, None], (zero, index, zero, zero))
        self_v = jax.lax.dynamic_update_slice(
            base_v, v_new[:, None], (zero, index, zero, zero))
        new_cache = dict(cache, self_k_tn=self_k, self_v_tn=self_v)
        if return_h:
            return (self.lm_head.features(hidden_out[:, None, :])[:, 0, :],
                    new_cache)
        logits = self.lm_head(hidden_out[:, None, :],
                              self.embeddings.word_embeddings,
                              emb_t=self._serving_emb_t())
        return logits[:, 0, :], new_cache


def label_smoothed_loss(logits: jax.Array, labels: jax.Array,
                        smoothing: float = 0.1) -> jax.Array:
    """Per-sample summed label-smoothed CE with -100 ignore (roberta.py:383-387).

    Matches torch.nn.CrossEntropyLoss(reduction='none', label_smoothing=0.1)
    followed by .view(B, -1).sum(1): logits are shifted off the last position,
    labels off the first, positions with label == -100 contribute zero."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    per_tok = (1.0 - smoothing) * nll + smoothing * smooth
    per_tok = jnp.where(valid, per_tok, 0.0)
    return jnp.sum(per_tok, axis=1)


def num_valid_targets(labels: jax.Array) -> jax.Array:
    """Count of supervised positions per sample on the *unshifted* labels —
    the exact rank-inference normalizer (prismer_vqa.py:108)."""
    return jnp.sum((labels != -100).astype(jnp.int32), axis=1)
