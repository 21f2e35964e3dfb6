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


def _conv1d_as_dense(sd, prefix):
    """torch Conv1d(k=1) weight (out, in, 1) -> Dense kernel (in, out)."""
    out = {"kernel": _np(sd[f"{prefix}.weight"])[:, :, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def convert_nnet(sd: Dict[str, Any]) -> Dict[str, Any]:
    """NNET scannet.pt checkpoint -> params for experts.normal.NNET.

    gen-efficientnet encoder naming (encoder.original_model.*) + decoder
    naming (decoder.conv2, decoder.up{1-4}._net.{0,1,3,4},
    decoder.out_conv_res8, decoder.out_conv_res{4,2,1}.{0,2,4,6})."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    enc = "encoder.original_model"
    P: Dict[str, Any] = {}
    S: Dict[str, Any] = {}

    E: Dict[str, Any] = {"conv_stem": conv(sd, f"{enc}.conv_stem")}
    ES: Dict[str, Any] = {}
    E["bn1"], ES["bn1"] = batch_norm(sd, f"{enc}.bn1")

    from prismer_tpu.experts.normal.model import B5_STAGES
    for s, (reps, k, stride, e, out_ch) in enumerate(B5_STAGES):
        for r in range(reps):
            q = f"{enc}.blocks.{s}.{r}"
            name = f"blocks_{s}_{r}"
            blk: Dict[str, Any] = {}
            st: Dict[str, Any] = {}
            blk["conv_dw"] = {"conv": conv(sd, f"{q}.conv_dw")}
            blk["se"] = {"conv_reduce": conv(sd, f"{q}.se.conv_reduce"),
                         "conv_expand": conv(sd, f"{q}.se.conv_expand")}
            if e == 1:
                blk["conv_pw"] = conv(sd, f"{q}.conv_pw")
                blk["bn1"], st["bn1"] = batch_norm(sd, f"{q}.bn1")
                blk["bn2"], st["bn2"] = batch_norm(sd, f"{q}.bn2")
            else:
                blk["conv_pw"] = conv(sd, f"{q}.conv_pw")
                blk["conv_pwl"] = conv(sd, f"{q}.conv_pwl")
                blk["bn1"], st["bn1"] = batch_norm(sd, f"{q}.bn1")
                blk["bn2"], st["bn2"] = batch_norm(sd, f"{q}.bn2")
                blk["bn3"], st["bn3"] = batch_norm(sd, f"{q}.bn3")
            E[name] = blk
            ES[name] = st
    E["conv_head"] = conv(sd, f"{enc}.conv_head")
    P["encoder"] = E
    S["encoder"] = ES

    P["conv2"] = conv(sd, "decoder.conv2")
    for i in range(1, 5):
        q = f"decoder.up{i}._net"
        up: Dict[str, Any] = {"conv1": conv(sd, f"{q}.0"),
                              "conv2": conv(sd, f"{q}.3")}
        st = {}
        up["bn1"], st["bn1"] = batch_norm(sd, f"{q}.1")
        up["bn2"], st["bn2"] = batch_norm(sd, f"{q}.4")
        P[f"up{i}"] = up
        S[f"up{i}"] = st
    P["out_conv_res8"] = conv(sd, "decoder.out_conv_res8")
    for res in (4, 2, 1):
        q = f"decoder.out_conv_res{res}"
        P[f"out_conv_res{res}"] = {
            "fc0": _conv1d_as_dense(sd, f"{q}.0"),
            "fc1": _conv1d_as_dense(sd, f"{q}.2"),
            "fc2": _conv1d_as_dense(sd, f"{q}.4"),
            "fc3": _conv1d_as_dense(sd, f"{q}.6"),
        }
    return {"params": P, "batch_stats": S}


def group_norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _rcu(sd, p):
    return {"conv1": conv(sd, f"{p}.conv1"), "conv2": conv(sd, f"{p}.conv2")}


def convert_dpt(sd: Dict[str, Any]) -> Dict[str, Any]:
    """MiDaS DPT-hybrid checkpoint (dpt_hybrid-midas-501f0c75.pt) -> params
    for experts.depth.DPTDepthModel. Key namespace: pretrained.model.* (timm
    vit_base_resnet50_384) + pretrained.act_postprocess{3,4} + scratch.*."""
    P: Dict[str, Any] = {}
    pm = "pretrained.model"

    # hybrid ResNetV2 backbone
    bb: Dict[str, Any] = {
        "stem_conv": conv(sd, f"{pm}.patch_embed.backbone.stem.conv"),
        "stem_norm": {"GroupNorm_0": group_norm(
            sd, f"{pm}.patch_embed.backbone.stem.norm")},
    }
    for s, n_blocks in enumerate((3, 4, 9)):
        stage: Dict[str, Any] = {}
        for b in range(n_blocks):
            q = f"{pm}.patch_embed.backbone.stages.{s}.blocks.{b}"
            blk = {
                "norm1": {"GroupNorm_0": group_norm(sd, f"{q}.norm1")},
                "norm2": {"GroupNorm_0": group_norm(sd, f"{q}.norm2")},
                "norm3": {"GroupNorm_0": group_norm(sd, f"{q}.norm3")},
                "conv1": conv(sd, f"{q}.conv1"),
                "conv2": conv(sd, f"{q}.conv2"),
                "conv3": conv(sd, f"{q}.conv3"),
            }
            if f"{q}.downsample.conv.weight" in sd:
                blk["downsample_conv"] = conv(sd, f"{q}.downsample.conv")
            stage[f"block_{b}"] = blk
        bb[f"stage_{s}"] = stage
    P["backbone"] = bb

    P["patch_proj"] = conv(sd, f"{pm}.patch_embed.proj")
    P["cls_token"] = _np(sd[f"{pm}.cls_token"])
    P["pos_embed"] = _np(sd[f"{pm}.pos_embed"])[0]

    for i in range(12):
        q = f"{pm}.blocks.{i}"
        P[f"vit_block_{i}"] = {
            "norm1": {"scale": _np(sd[f"{q}.norm1.weight"]),
                      "bias": _np(sd[f"{q}.norm1.bias"])},
            "norm2": {"scale": _np(sd[f"{q}.norm2.weight"]),
                      "bias": _np(sd[f"{q}.norm2.bias"])},
            "qkv": linear(sd, f"{q}.attn.qkv"),
            "proj": linear(sd, f"{q}.attn.proj"),
            "fc1": linear(sd, f"{q}.mlp.fc1"),
            "fc2": linear(sd, f"{q}.mlp.fc2"),
        }

    # reassemble heads (project readout + conv)
    P["post3_readout"] = linear(sd, "pretrained.act_postprocess3.0.project.0")
    P["post3_proj"] = conv(sd, "pretrained.act_postprocess3.3")
    P["post4_readout"] = linear(sd, "pretrained.act_postprocess4.0.project.0")
    P["post4_proj"] = conv(sd, "pretrained.act_postprocess4.3")
    P["post4_down"] = conv(sd, "pretrained.act_postprocess4.4")

    for i in range(1, 5):
        P[f"layer{i}_rn"] = conv(sd, f"scratch.layer{i}_rn")
    for i in range(1, 5):
        q = f"scratch.refinenet{i}"
        blk = {"rcu2": _rcu(sd, f"{q}.resConfUnit2"),
               "out_conv": conv(sd, f"{q}.out_conv")}
        if i != 4:  # refinenet4 takes no skip; its rcu1 weights are unused
            blk["rcu1"] = _rcu(sd, f"{q}.resConfUnit1")
        P[f"refinenet{i}"] = blk

    P["head_conv1"] = conv(sd, "scratch.output_conv.0")
    P["head_conv2"] = conv(sd, "scratch.output_conv.2")
    P["head_conv3"] = conv(sd, "scratch.output_conv.4")
    return {"params": P}


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
