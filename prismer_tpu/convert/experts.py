"""torch -> JAX weight converters for the expert networks.

Each expert's released checkpoint (downloaded by the reference's
download_checkpoints.py) is converted to the corresponding flax param tree.
Layout rules as in torch_to_jax.py; torch ConvTranspose2d weights
(in, out, kh, kw) become our (kh, kw, out, in) kernels."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from prismer_tpu.convert.torch_to_jax import _np, batch_norm, conv, linear


def conv_transpose(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn_pair(sd, prefix):
    return batch_norm(sd, prefix)


def _double_conv(sd, p):
    params, stats = {}, {}
    params["conv1"] = conv(sd, f"{p}.conv1")
    params["bn1"], stats["bn1"] = _bn_pair(sd, f"{p}.bn1")
    params["conv2"] = conv(sd, f"{p}.conv2")
    params["bn2"], stats["bn2"] = _bn_pair(sd, f"{p}.bn2")
    return params, stats


def _single_conv(sd, p, use_bn=True):
    params, stats = {"conv": conv(sd, f"{p}.conv")}, {}
    if use_bn:
        params["bn"], stats["bn"] = _bn_pair(sd, f"{p}.bn")
    return params, stats


def _dense_block(sd, p, num_layers):
    params, stats = {}, {}
    for i in range(num_layers):
        lp, ls = {}, {}
        q = f"{p}.denselayer{i + 1}"
        lp["conv1"] = conv(sd, f"{q}.conv1")
        lp["bn1"], ls["bn1"] = _bn_pair(sd, f"{q}.norm1")
        lp["conv2"] = conv(sd, f"{q}.conv2")
        lp["bn2"], ls["bn2"] = _bn_pair(sd, f"{q}.norm2")
        params[f"denselayer_{i}"] = lp
        stats[f"denselayer_{i}"] = ls
    return params, stats


def _up_block(sd, p, up_scale):
    params = {}
    for i in range(up_scale):
        params[f"conv_{i}"] = conv(sd, f"{p}.features.{3 * i}")
        params[f"deconv_{i}"] = conv_transpose(sd, f"{p}.features.{3 * i + 2}")
    return params


def convert_dexined(sd: Dict[str, Any]) -> Dict[str, Any]:
    """DexiNed checkpoint -> {'params', 'batch_stats'} for experts.edge."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for name in ("block_1", "block_2"):
        params[name], stats[name] = _double_conv(sd, name)
    for name, n in (("dblock_3", 2), ("dblock_4", 3), ("dblock_5", 3),
                    ("dblock_6", 3)):
        params[name], stats[name] = _dense_block(sd, name, n)
    for name in ("side_1", "side_2", "side_3", "side_4",
                 "pre_dense_2", "pre_dense_3", "pre_dense_4",
                 "pre_dense_5", "pre_dense_6"):
        params[name], stats[name] = _single_conv(sd, name)
    for name, s in (("up_block_1", 1), ("up_block_2", 1), ("up_block_3", 2),
                    ("up_block_4", 3), ("up_block_5", 4), ("up_block_6", 4)):
        params[name] = _up_block(sd, name, s)
    params["block_cat"], _ = _single_conv(sd, "block_cat", use_bn=False)
    return {"params": params, "batch_stats": stats}
