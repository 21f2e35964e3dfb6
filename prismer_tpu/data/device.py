"""Device-side expert-input materialization.

The host ships uint8 id maps + tiny (256, 64) per-sample gather tables
(~200 KB/sample); this jit-able function expands them to the model's
(B, H, W, 64) float inputs as fused XLA gathers — killing the reference's
CPU in-paint bottleneck (dataset/utils.py:117-159 builds ~37 MB/sample of
64-channel float maps in dataloader workers; SURVEY.md §3.1 hot loop note).

Canonical-name mapping also happens here: 'seg_coco'/'seg_ade' -> 'seg'
(model stems are keyed by canonical modality, model/prismer.py:24-25).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from prismer_tpu.config import canonical_expert


def materialize_experts(raw: Dict[str, Any], dtype=jnp.float32
                        ) -> Dict[str, Any]:
    """Raw host batch -> model expert inputs.

    raw formats (batched, leading B):
      'rgb'            (B,H,W,3) f32
      dense experts    (B,H,W,C) f32 already in [-1,1]
      id experts       {'ids': (B,H,W) u8, 'table': (B,256,64) f32,
                        ['instance': (B,H,W) u8]}

    `dtype` is the OUTPUT storage dtype. Pass the model's compute dtype
    (bf16) to halve the HBM traffic of the big (B, H, W, 64) materialized
    id maps — the stems cast their inputs to the compute dtype anyway, and
    the values are bit-identical (normalization arithmetic stays fp32 here
    and is cast at the end; a table gather commutes with the cast), so the
    f32 materialization was pure wasted bandwidth on the bf16 path
    (~0.9 GB/step write+read at b16 train, re-read again by the remat
    backward)."""
    out: Dict[str, Any] = {}
    for exp, v in raw.items():
        name = canonical_expert(exp)
        if name == "rgb" and not isinstance(v, dict) and v.dtype == jnp.uint8:
            # host ships raw uint8 frames (transform.RGB_DEVICE_NORM); the
            # /255 + CLIP pixel normalization runs here as one fused f32
            # expression (dataset/utils.py:66-67 semantics), cast at the end
            from prismer_tpu.data.transform import CLIP_MEAN, CLIP_STD
            x = v.astype(jnp.float32) / jnp.float32(255.0)
            x = (x - jnp.asarray(CLIP_MEAN, jnp.float32)) / jnp.asarray(
                CLIP_STD, jnp.float32)
            out[name] = x.astype(dtype)
        elif isinstance(v, dict) and "ids" not in v:
            out[name] = v  # already materialized (idempotent)
        elif isinstance(v, dict):
            b = v["ids"].shape[0]
            idx = v["ids"].astype(jnp.int32).reshape(b, -1)          # (B, HW)
            feat = jnp.take_along_axis(
                v["table"].astype(dtype), idx[:, :, None], axis=1)   # (B, HW, 64)
            label = feat.reshape(v["ids"].shape + (v["table"].shape[-1],))
            if name == "obj_detection":
                out[name] = {"label": label,
                             "instance": v["instance"][..., None]}
            else:
                out[name] = label
        else:
            out[name] = v.astype(dtype) if v.dtype != jnp.uint8 else v
    return out
