"""Synthetic reference-layout state-dict builders.

Each builder walks OUR model's init param tree and emits a state dict in the
reference checkpoint's key namespace (numpy values), by inverting the
converter's layout rules (convert/torch_to_jax.py + convert/experts.py):

    torch Conv2d weight (o,i,kh,kw)  <- kernel.transpose(3,2,0,1)
    torch Linear weight (o,i)        <- kernel.T
    torch MHA in_proj_weight         <- concat([kq.T, kk.T, kv.T])

Used by the model_bank weight round-trip tests: write the synthetic file to
disk in the reference's expert_weights layout, then assert load_expert_model
returns the CONVERTED values (not fresh init)."""

from __future__ import annotations

import numpy as np

_rng = np.random.default_rng(1234)


def _rand(shape):
    return _rng.standard_normal(shape).astype(np.float32)


def _shape(x):
    """Shape of a concrete array OR a jax.eval_shape ShapeDtypeStruct."""
    return tuple(getattr(x, "shape", np.shape(x)))


def synth_conv(sd, p, params):
    sd[f"{p}.weight"] = _rand(_shape(params["kernel"])).transpose(3, 2, 0, 1)
    if "bias" in params:
        sd[f"{p}.bias"] = _rand(_shape(params["bias"]))


def synth_linear(sd, p, params):
    sd[f"{p}.weight"] = _rand(_shape(params["kernel"])).T
    if "bias" in params:
        sd[f"{p}.bias"] = _rand(_shape(params["bias"]))


def synth_ln(sd, p, params):
    sd[f"{p}.weight"] = _rand(_shape(params["scale"]))
    sd[f"{p}.bias"] = _rand(np.shape(params["bias"]))


def synth_bn(sd, p, params, stats):
    n = _shape(params["scale"])
    sd[f"{p}.weight"] = _rand(n)
    sd[f"{p}.bias"] = _rand(n)
    sd[f"{p}.running_mean"] = _rand(n) * 0.1
    sd[f"{p}.running_var"] = np.abs(_rand(n)) * 0.2 + 0.8


def synth_mha(sd, p, params):
    """Inverse of convert/experts.py _torch_mha."""
    qs = _shape(params["q_proj"]["kernel"])[::-1]
    sd[f"{p}.in_proj_weight"] = np.concatenate(
        [_rand(qs), _rand(qs), _rand(qs)], axis=0)
    sd[f"{p}.in_proj_bias"] = _rand((qs[0] * 3,))
    synth_linear(sd, f"{p}.out_proj", params["out_proj"])


def synth_d2_conv(sd, p, params, bn_params=None, bn_stats=None):
    """detectron2 Conv2d with attached .norm (convert/experts.py _d2_conv)."""
    synth_conv(sd, p, params)
    if bn_params is not None:
        synth_bn(sd, f"{p}.norm", bn_params, bn_stats)


# ---------------------------------------------------------------------------
# Swin + Mask2Former (inverse of convert_swin / convert_mask2former)
# ---------------------------------------------------------------------------

def synth_swin_sd(sd, params, prefix="backbone."):
    synth_conv(sd, f"{prefix}patch_embed.proj", params["patch_embed"])
    synth_ln(sd, f"{prefix}patch_embed.norm", params["patch_norm"])
    depths = []
    s = 0
    while f"stage{s}_block0" in params:
        b = 0
        while f"stage{s}_block{b}" in params:
            b += 1
        depths.append(b)
        s += 1
    for s, depth in enumerate(depths):
        for b in range(depth):
            blk = params[f"stage{s}_block{b}"]
            q = f"{prefix}layers.{s}.blocks.{b}"
            synth_ln(sd, f"{q}.norm1", blk["norm1"])
            synth_ln(sd, f"{q}.norm2", blk["norm2"])
            synth_linear(sd, f"{q}.attn.qkv", blk["attn"]["qkv"])
            synth_linear(sd, f"{q}.attn.proj", blk["attn"]["proj"])
            sd[f"{q}.attn.relative_position_bias_table"] = _rand(
                _shape(blk["attn"]["rel_pos_bias"]))
            synth_linear(sd, f"{q}.mlp.fc1", blk["fc1"])
            synth_linear(sd, f"{q}.mlp.fc2", blk["fc2"])
        if s < len(depths) - 1:
            ds = params[f"downsample{s}"]
            q = f"{prefix}layers.{s}.downsample"
            synth_ln(sd, f"{q}.norm", ds["norm"])
            sd[f"{q}.reduction.weight"] = _rand(
                _shape(ds["reduction"]["kernel"])).T
        synth_ln(sd, f"{prefix}norm{s}", params[f"out_norm{s}"])


def synth_mask2former_sd(params):
    """Inverse of convert_mask2former for a MaskFormer param tree (any dims,
    full layer counts: 6 encoder / 9 decoder / 3 levels)."""
    sd = {}
    synth_swin_sd(sd, params["backbone"])

    pd = params["pixel_decoder"]
    base = "sem_seg_head.pixel_decoder"
    sd[f"{base}.transformer.level_embed"] = _rand(_shape(pd["level_embed"]))
    for i in range(3):
        synth_conv(sd, f"{base}.input_proj.{i}.0", pd[f"input_proj_{i}"])
        synth_ln(sd, f"{base}.input_proj.{i}.1", pd[f"input_norm_{i}"])
    for i in range(6):
        enc = pd[f"enc_{i}"]
        q = f"{base}.transformer.encoder.layers.{i}"
        for nm in ("sampling_offsets", "attention_weights", "value_proj",
                   "output_proj"):
            synth_linear(sd, f"{q}.self_attn.{nm}", enc["self_attn"][nm])
        synth_ln(sd, f"{q}.norm1", enc["norm1"])
        synth_ln(sd, f"{q}.norm2", enc["norm2"])
        synth_linear(sd, f"{q}.linear1", enc["linear1"])
        synth_linear(sd, f"{q}.linear2", enc["linear2"])
    synth_conv(sd, f"{base}.adapter_1", pd["adapter_1"])
    synth_ln(sd, f"{base}.adapter_1.norm", pd["adapter_norm_1"])
    synth_conv(sd, f"{base}.layer_1", pd["layer_1"])
    synth_ln(sd, f"{base}.layer_1.norm", pd["layer_norm_1"])
    synth_conv(sd, f"{base}.mask_features", pd["mask_features"])

    pr = params["predictor"]
    base = "sem_seg_head.predictor"
    for nm in ("query_feat", "query_embed", "level_embed"):
        sd[f"{base}.{nm}.weight"] = _rand(_shape(pr[nm]))
    synth_ln(sd, f"{base}.decoder_norm", pr["decoder_norm"])
    synth_linear(sd, f"{base}.class_embed", pr["class_embed"])
    for i in range(3):
        synth_linear(sd, f"{base}.mask_embed.layers.{i}", pr[f"mask_mlp_{i}"])
    for i in range(9):
        synth_mha(sd, f"{base}.transformer_cross_attention_layers.{i}"
                      f".multihead_attn", pr[f"cross_{i}"])
        synth_ln(sd, f"{base}.transformer_cross_attention_layers.{i}.norm",
                 pr[f"cross_norm_{i}"])
        synth_mha(sd, f"{base}.transformer_self_attention_layers.{i}"
                      f".self_attn", pr[f"self_{i}"])
        synth_ln(sd, f"{base}.transformer_self_attention_layers.{i}.norm",
                 pr[f"self_norm_{i}"])
        synth_linear(sd, f"{base}.transformer_ffn_layers.{i}.linear1",
                     pr[f"ffn1_{i}"])
        synth_linear(sd, f"{base}.transformer_ffn_layers.{i}.linear2",
                     pr[f"ffn2_{i}"])
        synth_ln(sd, f"{base}.transformer_ffn_layers.{i}.norm",
                 pr[f"ffn_norm_{i}"])
    return sd


# ---------------------------------------------------------------------------
# CharNet (inverse of convert_charnet)
# ---------------------------------------------------------------------------

def _synth_charnet_residual(sd, p, params, stats):
    synth_conv(sd, f"{p}.conv_1.0", params["conv1"])
    synth_bn(sd, f"{p}.conv_1.1", params["bn1"], stats["bn1"])
    synth_conv(sd, f"{p}.conv_2.0", params["conv2"])
    synth_bn(sd, f"{p}.conv_2.1", params["bn2"], stats["bn2"])
    if "skip_conv" in params:
        synth_conv(sd, f"{p}.skip.0", params["skip_conv"])
        synth_bn(sd, f"{p}.skip.1", params["skip_bn"], stats["skip_bn"])


def _synth_charnet_reslayer(sd, p, params, stats):
    i = 0
    while f"res_{i}" in params:
        _synth_charnet_residual(sd, f"{p}.{i}", params[f"res_{i}"],
                                stats[f"res_{i}"])
        i += 1


def _synth_charnet_hourglass(sd, p, params, stats):
    for name in ("up_1", "low_1", "low_3"):
        _synth_charnet_reslayer(sd, f"{p}.{name}", params[name], stats[name])
    if "res_0" in params["low_2"]:
        _synth_charnet_reslayer(sd, f"{p}.low_2", params["low_2"],
                                stats["low_2"])
    else:
        _synth_charnet_hourglass(sd, f"{p}.low_2", params["low_2"],
                                 stats["low_2"])


def _synth_charnet_cbr(sd, p, params, stats):
    synth_conv(sd, f"{p}.conv", params["conv"])
    synth_bn(sd, f"{p}.bn", params["bn"], stats["bn"])


def synth_charnet_sd(variables):
    P, S = variables["params"], variables["batch_stats"]
    sd = {}
    bb, bbs = P["backbone"], S["backbone"]
    synth_conv(sd, "backbone.pre.0", bb["pre_conv"])
    synth_bn(sd, "backbone.pre.1", bb["pre_bn"], bbs["pre_bn"])
    _synth_charnet_residual(sd, "backbone.pre.3", bb["pre_res"],
                            bbs["pre_res"])
    for i in range(2):
        _synth_charnet_hourglass(sd, f"backbone.hourglass_blocks.{i}",
                                 bb[f"hg_{i}"], bbs[f"hg_{i}"])
    for ours, theirs, final in (
            ("word_detector", "word_detector", "word_det_conv_final"),
            ("char_detector", "char_detector", "character_det_conv_final")):
        h, hs = P[ours], S[ours]
        _synth_charnet_cbr(sd, f"{theirs}.{final}", h["det_conv_final"],
                           hs["det_conv_final"])
        prefix = "word" if "word" in theirs else "char"
        _synth_charnet_cbr(sd, f"{theirs}.{prefix}_fg_feat", h["fg_feat"],
                           hs["fg_feat"])
        _synth_charnet_cbr(sd, f"{theirs}.{prefix}_regression_feat",
                           h["reg_feat"], hs["reg_feat"])
        synth_conv(sd, f"{theirs}.{prefix}_fg_pred", h["fg_pred"])
        synth_conv(sd, f"{theirs}.{prefix}_tblr_pred", h["tblr_pred"])
        if prefix == "word":
            synth_conv(sd, f"{theirs}.orient_pred", h["orient_pred"])
    for i in range(3):
        _synth_charnet_cbr(sd, f"char_recognizer.body.{i}", P[f"recog_{i}"],
                           S[f"recog_{i}"])
    synth_conv(sd, "char_recognizer.classifier", P["recog_cls"])
    return sd


# ---------------------------------------------------------------------------
# UniDet (inverse of convert_unidet; detectron2 layout)
# ---------------------------------------------------------------------------

def synth_unidet_sd(params, stats, blocks):
    sd = {}
    bb, bbs = params["backbone"], stats["backbone"]
    for i in (1, 2, 3):
        synth_d2_conv(sd, f"backbone.bottom_up.stem.conv1_{i}",
                      bb[f"stem_conv{i}"], bb[f"stem_bn{i}"],
                      bbs[f"stem_bn{i}"])
    for s, n in enumerate(blocks):
        for b in range(n):
            blk = bb[f"res{s + 2}_block{b}"]
            bst = bbs[f"res{s + 2}_block{b}"]
            q = f"backbone.bottom_up.res{s + 2}.{b}"
            synth_d2_conv(sd, f"{q}.conv1", blk["conv1"], blk["bn1"],
                          bst["bn1"])
            synth_conv(sd, f"{q}.conv2.conv", blk["conv2"]["conv"])
            synth_conv(sd, f"{q}.conv2.fc1", blk["conv2"]["fc1"])
            synth_conv(sd, f"{q}.conv2.fc2", blk["conv2"]["fc2"])
            for bn in ("bn0", "bn1"):
                synth_bn(sd, f"{q}.conv2.{bn}", blk["conv2"][bn],
                         bst["conv2"][bn])
            synth_d2_conv(sd, f"{q}.conv3", blk["conv3"], blk["bn3"],
                          bst["bn3"])
            if "shortcut_conv" in blk:
                synth_d2_conv(sd, f"{q}.shortcut", blk["shortcut_conv"],
                              blk["shortcut_bn"], bst["shortcut_bn"])
    fp, fst = params["fpn"], stats["fpn"]
    for lvl, f in ((3, "res3"), (4, "res4"), (5, "res5")):
        synth_d2_conv(sd, f"backbone.fpn_lateral{lvl}", fp[f"lateral_{f}"],
                      fp[f"lateral_bn_{f}"], fst[f"lateral_bn_{f}"])
        synth_d2_conv(sd, f"backbone.fpn_output{lvl}", fp[f"output_p{lvl}"],
                      fp[f"output_bn_p{lvl}"], fst[f"output_bn_p{lvl}"])
    synth_conv(sd, "backbone.top_block.p6", fp["p6"])
    synth_conv(sd, "backbone.top_block.p7", fp["p7"])
    rp = params["rpn"]
    synth_conv(sd, "proposal_generator.rpn_head.conv", rp["conv"])
    synth_conv(sd, "proposal_generator.rpn_head.objectness_logits",
               rp["objectness"])
    synth_conv(sd, "proposal_generator.rpn_head.anchor_deltas",
               rp["anchor_deltas"])
    for stage in range(3):
        h, hst = params[f"box_head_{stage}"], stats[f"box_head_{stage}"]
        for i in range(4):
            synth_d2_conv(sd, f"roi_heads.box_head.{stage}.conv{i + 1}",
                          h[f"conv{i}"], h[f"conv_bn{i}"], hst[f"conv_bn{i}"])
        synth_linear(sd, f"roi_heads.box_head.{stage}.fc1", h["fc1"])
        synth_linear(sd, f"roi_heads.box_predictor.{stage}.cls_score",
                     h["cls_score"])
        synth_linear(sd, f"roi_heads.box_predictor.{stage}.bbox_pred",
                     h["bbox_pred"])
    return sd
