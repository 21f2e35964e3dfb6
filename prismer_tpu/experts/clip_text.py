"""CLIP text encoder (inference), flax — for OCR word embeddings and
feature-table (re)generation.

The reference calls OpenAI CLIP's text tower at OCR-generation time
(experts/generate_ocrdet.py:43,80-84: clip.tokenize + encode_text, then the
sklearn PCA projects 768 -> 64) and the dataset feature tables
(dataset/*.pt, SURVEY.md 2.13) were generated offline the same way.

Architecture (CLIP ViT-L/14 text tower): token embedding (vocab 49408,
width 768), learned positional embedding (77), 12 masked transformer blocks
(heads 12, causal), final LN, projection to 768, features taken at the
argmax (EOT) token. Tokenization uses our byte-BPE (prismer_tpu.tokenizer)
with the CLIP vocabulary files when provided.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class CLIPTextBlock(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="attn_in")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.heads, d // self.heads
                             ).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        s = s / np.sqrt(d // self.heads) + causal_bias
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(x.shape)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_out")(o)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="c_fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        h = nn.Dense(d, dtype=self.dtype, name="c_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    context: int = 77
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jax.Array) -> jax.Array:
        """token_ids: (B, 77) int32 (CLIP-tokenized, EOT = max id per row).
        Returns (B, width) projected features."""
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width), jnp.float32)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context, self.width), jnp.float32)
        x = tok[token_ids].astype(self.dtype) + pos[None].astype(self.dtype)
        causal = jnp.triu(jnp.full((self.context, self.context), -1e9,
                                   jnp.float32), k=1)[None, None]
        for i in range(self.layers):
            x = CLIPTextBlock(self.heads, dtype=self.dtype,
                              name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.width), jnp.float32)
        eot = jnp.argmax(token_ids, axis=-1)
        feats = x[jnp.arange(x.shape[0]), eot]
        return feats.astype(jnp.float32) @ proj


def convert_clip_text(sd: Dict[str, Any]) -> Dict[str, Any]:
    """OpenAI CLIP state dict -> CLIPTextEncoder params."""
    from prismer_tpu.convert.torch_to_jax import _np, layer_norm, linear, \
        packed_mha
    P: Dict[str, Any] = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "text_projection": _np(sd["text_projection"]),
        "ln_final": layer_norm(sd, "ln_final"),
    }
    i = 0
    while f"transformer.resblocks.{i}.attn.in_proj_weight" in sd:
        p = f"transformer.resblocks.{i}"
        P[f"block_{i}"] = {
            "ln_1": layer_norm(sd, f"{p}.ln_1"),
            "ln_2": layer_norm(sd, f"{p}.ln_2"),
            "attn_in": {"kernel": _np(sd[f"{p}.attn.in_proj_weight"]).T,
                        "bias": _np(sd[f"{p}.attn.in_proj_bias"])},
            "attn_out": linear(sd, f"{p}.attn.out_proj"),
            "c_fc": linear(sd, f"{p}.mlp.c_fc"),
            "c_proj": linear(sd, f"{p}.mlp.c_proj"),
        }
        i += 1
    return {"params": P}


# ---------------------------------------------------------------------------
# generation-time word embedding (reference: generate_ocrdet.py:43,80-84)
# ---------------------------------------------------------------------------

CLIP_TEXT_WEIGHTS = "clip_text_vit_l14.npz"   # convert.cli --kind clip_text
CLIP_BPE_VOCAB = ("bpe_simple_vocab_16e6.txt.gz", "bpe_simple_vocab_16e6.txt")


def load_clip_text(weights_dir: str = None):
    """Returns (jitted apply_fn, variables, CLIPTokenizer) when both the
    converted CLIP text weights and the BPE vocab file are present under the
    expert-weights dir, else None (the OCR generator then falls back to the
    background feature with a loud warning)."""
    import os

    weights_dir = weights_dir or os.environ.get("PRISMER_EXPERT_WEIGHTS",
                                                "experts/expert_weights")
    wpath = os.path.join(weights_dir, CLIP_TEXT_WEIGHTS)
    vpath = next((os.path.join(weights_dir, v) for v in CLIP_BPE_VOCAB
                  if os.path.exists(os.path.join(weights_dir, v))), None)
    if not os.path.exists(wpath) or vpath is None:
        return None

    from prismer_tpu.tokenizer import CLIPTokenizer
    from prismer_tpu.train.checkpoint import load_params_npz

    tree = load_params_npz(wpath)
    params = tree.get("params", tree)
    tok = CLIPTokenizer.from_file(vpath)
    width = params["token_embedding"].shape[1]
    layers = sum(1 for k in params if k.startswith("block_"))
    model = CLIPTextEncoder(vocab_size=params["token_embedding"].shape[0],
                            width=width, layers=layers,
                            heads=max(width // 64, 1))
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    apply_fn = jax.jit(lambda v, ids: model.apply(v, ids))
    return apply_fn, variables, tok


def embed_words(words, clip_ctx, tables) -> np.ndarray:
    """words -> (N, 64) PCA'd CLIP text features, the exact generation-time
    pipeline of the reference (clip.tokenize -> encode_text -> pca.transform,
    generate_ocrdet.py:80-84)."""
    apply_fn, variables, tok = clip_ctx
    ids = tok([w.lower() for w in words])
    emb = np.asarray(apply_fn(variables, jnp.asarray(ids)), np.float32)
    return tables.pca_project(emb)
