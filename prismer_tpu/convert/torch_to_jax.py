"""One-way PyTorch -> JAX checkpoint conversion.

Covers the three weight sources the reference consumes (SURVEY.md §5
checkpoint row):

  * CLIP vision towers (OpenAI / open_clip format) — the reference remaps
    keys and loads the visual trunk (model/modules/vit.py:188-214): CLS token
    dropped from the positional embedding (vit.py:201), packed attention
    in_proj split into q/k/v, positional embedding re-interpolated to the
    target resolution (vit.py:223).
  * HF RobertaForMaskedLM — the reference restructures encoder.layer keys
    around its [layer, cross-attn, adaptor] triplets (roberta.py:440-452) and
    loads strict=False, leaving cross-attention/adaptors at random init.
  * Full Prismer training checkpoints ('pytorch_model.bin' layout produced by
    accelerate.save_state; key namespace expert_encoder.* / text_decoder.*) —
    including positional-embedding re-interpolation when fine-tune resolution
    differs from pretrain resolution (train_caption.py:96-100).

All converters return flax-style nested param dicts matching prismer_tpu
module names. torch tensors are converted on CPU via numpy; torch never
touches the TPU path.

Layout conventions:
  torch Linear weight (out, in)  -> flax Dense kernel (in, out)    [transpose]
  torch Conv2d weight (O,I,H,W)  -> flax Conv kernel (H,W,I,O)     [transpose]
  torch BatchNorm {weight,bias,running_mean,running_var}
      -> flax BatchNorm {scale,bias} params + {mean,var} batch_stats
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from prismer_tpu.config import PrismerConfig
from prismer_tpu.models.layers import _bicubic_matrix


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layer_norm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def batch_norm(sd: Dict[str, Any], prefix: str
               ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def packed_mha(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.MultiheadAttention packed in_proj -> q/k/v/out Dense."""
    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    wq, wk, wv = np.split(w, 3, axis=0)
    bq, bk, bv = np.split(b, 3, axis=0)
    return {
        "q_proj": {"kernel": wq.T, "bias": bq},
        "k_proj": {"kernel": wk.T, "bias": bk},
        "v_proj": {"kernel": wv.T, "bias": bv},
        "out_proj": linear(sd, f"{prefix}.out_proj"),
    }


def adaptor(sd: Dict[str, Any], proj_prefix: str, ln_prefix: str) -> Dict[str, Any]:
    return {
        "down_proj": linear(sd, f"{proj_prefix}.down_proj"),
        "up_proj": linear(sd, f"{proj_prefix}.up_proj"),
        "adaptor_ln": layer_norm(sd, ln_prefix),
    }


def interpolate_pos_embed_np(pe: np.ndarray, target_len: int) -> np.ndarray:
    """Host-side twin of models.layers.interpolate_pos_embed (same operator)."""
    orig = int(round(pe.shape[0] ** 0.5))
    new = int(round(target_len ** 0.5))
    if orig == new:
        return pe
    w = _bicubic_matrix(orig, new).astype(np.float64)
    grid = pe.reshape(orig, orig, -1).astype(np.float64)
    out = np.einsum("oi,ijd->ojd", w, grid)
    out = np.einsum("oj,sjd->sod", w, out)
    return out.reshape(new * new, -1).astype(pe.dtype)


# ---------------------------------------------------------------------------
# CLIP visual tower
# ---------------------------------------------------------------------------

def convert_clip_vision(sd: Dict[str, Any], cfg: PrismerConfig
                        ) -> Dict[str, Any]:
    """OpenAI-CLIP state dict -> partial expert_encoder params.

    Handles keys with or without the 'visual.' prefix. Returns only the
    entries present in CLIP: rgb stem, positional embedding (CLS dropped,
    re-interpolated to cfg.vision.rgb_tokens), trunk attn/mlp/LN, ln_pre,
    ln_post. Label stems / adaptors / resampler keep their fresh init."""
    sd = {k[len("visual."):] if k.startswith("visual.") else k: v
          for k, v in sd.items()}
    out: Dict[str, Any] = {}
    out["conv1_rgb"] = conv(sd, "conv1")

    pe = _np(sd["positional_embedding"])
    n = pe.shape[0]
    if int(round(n ** 0.5)) ** 2 != n:  # CLS present -> drop (vit.py:201)
        pe = pe[1:]
    out["positional_embedding"] = interpolate_pos_embed_np(
        pe, cfg.vision.rgb_tokens)

    out["ln_pre"] = layer_norm(sd, "ln_pre")
    out["ln_post"] = layer_norm(sd, "ln_post")

    n_layers = len({m.group(1) for k in sd
                    if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k))})
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}"
        out[f"resblocks_{i}"] = {
            "attn": packed_mha(sd, f"{p}.attn"),
            "ln_1": layer_norm(sd, f"{p}.ln_1"),
            "ln_2": layer_norm(sd, f"{p}.ln_2"),
            "mlp": {"c_fc": linear(sd, f"{p}.mlp.c_fc"),
                    "c_proj": linear(sd, f"{p}.mlp.c_proj")},
        }
    return out


# ---------------------------------------------------------------------------
# HF RoBERTa (MaskedLM) -> decoder
# ---------------------------------------------------------------------------

def _decoder_layer_common(sd: Dict[str, Any], p: str) -> Dict[str, Any]:
    """Self-attention + FFN params shared by HF RobertaLayer and ours."""
    return {
        "self_attn": {
            "query": linear(sd, f"{p}.attention.self.query"),
            "key": linear(sd, f"{p}.attention.self.key"),
            "value": linear(sd, f"{p}.attention.self.value"),
        },
        "self_out": {
            "dense": linear(sd, f"{p}.attention.output.dense"),
            "ln": layer_norm(sd, f"{p}.attention.output.LayerNorm"),
        },
        "mlp": {
            "intermediate": linear(sd, f"{p}.intermediate.dense"),
            "out": {"dense": linear(sd, f"{p}.output.dense"),
                    "ln": layer_norm(sd, f"{p}.output.LayerNorm")},
        },
    }


def convert_hf_roberta_mlm(sd: Dict[str, Any], num_layers: int,
                           layer_prefix_fmt: str = "roberta.encoder.layer.{i}"
                           ) -> Dict[str, Any]:
    """HF RobertaForMaskedLM state dict -> partial text_decoder params.

    Mirrors the reference's strict=False load of restructured MaskedLM
    weights (roberta.py:433-452): layer i's self-attn/FFN come from HF layer
    i; layer num_layers-1 ALSO seeds the extra output_layer? No — the
    reference's output_layer simply keeps random init (its keys don't exist
    in the remapped dict). Cross-attention and adaptors stay at init too."""
    out: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": _np(sd["roberta.embeddings.word_embeddings.weight"]),
            "position_embeddings": _np(sd["roberta.embeddings.position_embeddings.weight"]),
            "token_type_embeddings": _np(sd["roberta.embeddings.token_type_embeddings.weight"]),
            "ln": layer_norm(sd, "roberta.embeddings.LayerNorm"),
        },
        "lm_head": {
            "dense": linear(sd, "lm_head.dense"),
            "ln": layer_norm(sd, "lm_head.layer_norm"),
            "bias": _np(sd["lm_head.bias"]),
        },
    }
    for i in range(num_layers):
        out[f"layers_{i}"] = _decoder_layer_common(
            sd, layer_prefix_fmt.format(i=i))
    return out


# ---------------------------------------------------------------------------
# Full Prismer checkpoint (reference training output)
# ---------------------------------------------------------------------------

_STEM_CONV_IDX = (1, 4, 7, 10)
_STEM_BN_IDX = (2, 5, 8, 11)


def _convert_label_stem(sd: Dict[str, Any], prefix: str
                        ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for j, (ci, bi) in enumerate(zip(_STEM_CONV_IDX, _STEM_BN_IDX)):
        params[f"Conv_{j}"] = conv(sd, f"{prefix}.{ci}")
        bn_p, bn_s = batch_norm(sd, f"{prefix}.{bi}")
        params[f"bn_{j}"] = bn_p
        stats[f"bn_{j}"] = bn_s
    params["proj"] = conv(sd, f"{prefix}.13")
    return params, stats


def convert_prismer_checkpoint(sd: Dict[str, Any], cfg: PrismerConfig
                               ) -> Dict[str, Any]:
    """Reference 'pytorch_model.bin' -> full {'params', 'batch_stats'} tree.

    Key namespace (reference model/prismer.py): expert_encoder.* (vit.py
    naming post-restructure) and text_decoder.* (roberta.py naming).
    Re-interpolates the positional embedding to the configured resolution
    (train_caption.py:96-100)."""
    enc: Dict[str, Any] = {}
    enc_stats: Dict[str, Any] = {}

    pe = _np(sd["expert_encoder.positional_embedding"])
    enc["positional_embedding"] = interpolate_pos_embed_np(
        pe, cfg.vision.rgb_tokens)
    if "expert_encoder.instance_embedding" in sd:
        enc["instance_embedding"] = _np(sd["expert_encoder.instance_embedding"])
    enc["ln_pre"] = layer_norm(sd, "expert_encoder.ln_pre")
    enc["ln_post"] = layer_norm(sd, "expert_encoder.ln_post")

    for exp, _ in cfg.vision.experts:
        pfx = f"expert_encoder.conv1.{exp}"
        if exp == "rgb":
            enc["conv1_rgb"] = conv(sd, pfx)
        else:
            name = "conv1_seg" if exp == "seg" else f"conv1_{exp}"
            enc[name], enc_stats[name] = _convert_label_stem(sd, pfx)

    for i in range(cfg.vision.layers):
        p = f"expert_encoder.transformer.resblocks.{i}"
        enc[f"resblocks_{i}"] = {
            "attn": packed_mha(sd, f"{p}.0.attn"),
            "ln_1": layer_norm(sd, f"{p}.0.ln_1"),
            "ln_2": layer_norm(sd, f"{p}.0.ln_2"),
            "mlp": {"c_fc": linear(sd, f"{p}.0.mlp.c_fc"),
                    "c_proj": linear(sd, f"{p}.0.mlp.c_proj")},
            "adaptor": adaptor(sd, f"{p}.1.adaptor", f"{p}.1.adaptor_ln"),
        }

    if cfg.vision.has_experts:
        res: Dict[str, Any] = {
            "latents": _np(sd["expert_encoder.resampler.latents"])}
        for i in range(cfg.vision.resampler_layers):
            p = f"expert_encoder.resampler.perceiver_blocks.{i}"
            res[f"blocks_{i}"] = {
                "attn": packed_mha(sd, f"{p}.attn"),
                "ln_1": layer_norm(sd, f"{p}.ln_1"),
                "ln_2": layer_norm(sd, f"{p}.ln_2"),
                "ln_ff": layer_norm(sd, f"{p}.ln_ff"),
                "mlp": {"c_fc": linear(sd, f"{p}.mlp.c_fc"),
                        "c_proj": linear(sd, f"{p}.mlp.c_proj")},
            }
        enc["resampler"] = res

    # -- decoder ----------------------------------------------------------
    dsd = {k[len("text_decoder."):]: v for k, v in sd.items()
           if k.startswith("text_decoder.")}
    # reference restructure places layer params under .0 (roberta.py:443-447)
    dec = convert_hf_roberta_mlm(
        dsd, cfg.decoder.num_hidden_layers,
        layer_prefix_fmt="roberta.encoder.layer.{i}.0")
    for i in range(cfg.decoder.num_hidden_layers):
        p = f"roberta.encoder.layer.{i}"
        dec[f"layers_{i}"]["cross_attn"] = {
            "query": linear(dsd, f"{p}.1.self.query"),
            "key": linear(dsd, f"{p}.1.self.key"),
            "value": linear(dsd, f"{p}.1.self.value"),
        }
        dec[f"layers_{i}"]["cross_out"] = {
            "dense": linear(dsd, f"{p}.1.output.dense"),
            "ln": layer_norm(dsd, f"{p}.1.output.LayerNorm"),
        }
        dec[f"layers_{i}"]["adaptor"] = adaptor(
            dsd, f"{p}.2.adaptor", f"{p}.2.adaptor_ln")
    dec["output_layer"] = _decoder_layer_common(
        dsd, "roberta.encoder.output_layer")

    return {
        "params": {"expert_encoder": enc, "text_decoder": dec},
        "batch_stats": {"expert_encoder": enc_stats} if enc_stats else {},
    }


def uncovered_leaves(init_tree: Dict[str, Any], loaded: Dict[str, Any],
                     path: str = "") -> Tuple[int, list]:
    """(total_leaf_count, paths of init leaves NOT overlaid by `loaded`).

    Companion to merge_params' lenient key semantics: the merge itself stays
    strict=False (the reference loads the core model that way), but expert
    weight loading uses this report to FAIL LOUDLY when a real checkpoint's
    key layout drifts — a silent partial load would leave random weights in
    a frozen expert with no signal (experts/model_bank.py)."""
    total, missing = 0, []
    for k, v in init_tree.items():
        sub = loaded.get(k) if isinstance(loaded, dict) else None
        if isinstance(v, dict):
            t, m = uncovered_leaves(v, sub if isinstance(sub, dict) else {},
                                    f"{path}/{k}")
            total += t
            missing += m
        else:
            total += 1
            if sub is None:
                missing.append(f"{path}/{k}")
    return total, missing


def merge_params(init_tree: Dict[str, Any], loaded: Dict[str, Any],
                 path: str = "") -> Dict[str, Any]:
    """Overlay `loaded` onto `init_tree` (strict=False load semantics):
    loaded leaves replace init leaves; anything missing keeps its init.
    Shapes must match where keys overlap."""
    out = dict(init_tree)
    for k, v in loaded.items():
        if k not in out:
            raise KeyError(f"converted key not in model: {path}/{k}")
        if isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = merge_params(out[k], v, f"{path}/{k}")
        else:
            want = np.shape(out[k])
            got = np.shape(v)
            if want != got:
                raise ValueError(f"shape mismatch at {path}/{k}: "
                                 f"model {want} vs checkpoint {got}")
            out[k] = np.asarray(v, dtype=np.float32)
    return out
