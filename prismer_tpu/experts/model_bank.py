"""Expert model bank — the shared `load_expert_model(task)` factory
(reference: experts/model_bank.py:11-135).

Returns (apply_fn, variables, preprocess) where apply_fn is a jitted
NHWC-batch function, variables the flax tree (converted from the published
checkpoint when available, fresh init otherwise), and preprocess a host-side
callable PIL.Image -> np.ndarray replicating the reference's torchvision
transform for that expert. Exception: 'obj_detection' returns the UniDet
module itself in the first slot — its inference interleaves device programs
with host NMS (experts/obj_detection/rcnn.py detect_single).

Checkpoints are searched under PRISMER_EXPERT_WEIGHTS (default
'experts/expert_weights'), same filenames as the reference's
download_checkpoints.py layout.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

WEIGHTS = {
    "depth": "dpt_hybrid-midas-501f0c75.pt",
    "normal": "scannet.pt",
    "edge": "10_model.pth",
    "ocr_detection": "icdar2015_hourglass88.pth",
    "seg_coco": "model_final_f07440.pkl",
    "seg_ade": "model_final_e0c58e.pkl",
    "obj_detection": "Unified_learned_OCIM_RS200_6x+2x.pth",
}


def _weights_dir() -> str:
    return os.environ.get("PRISMER_EXPERT_WEIGHTS", "experts/expert_weights")


def _load_torch_ckpt(task: str):
    """Load the reference checkpoint file for `task`, or None (with a loud
    warning) when absent. Handles both torch serialization (.pt/.pth) and
    detectron2 raw-pickle .pkl (plain `pickle.dump` of {'model': {key:
    np.ndarray}, '__author__': ...} — NOT a torch zipfile, so torch.load
    can't ingest it; reference layout at experts/model_bank.py:26-85)."""
    path = os.path.join(_weights_dir(), WEIGHTS[task])
    if not os.path.exists(path):
        import warnings
        warnings.warn(
            f"[prismer_tpu] expert '{task}': checkpoint {path} not found — "
            f"running with RANDOM weights; generated labels will be noise. "
            f"Provide the file (see convert/cli.py docstring) or set "
            f"PRISMER_EXPERT_WEIGHTS.", stacklevel=2)
        return None
    if path.endswith(".pkl"):
        import pickle
        with open(path, "rb") as f:
            sd = pickle.load(f, encoding="latin1")
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def _resize_norm(size: int, mean, std) -> Callable[[Image.Image], np.ndarray]:
    mean = np.broadcast_to(np.asarray(mean, np.float32), (3,))
    std = np.broadcast_to(np.asarray(std, np.float32), (3,))

    def fn(img: Image.Image) -> np.ndarray:
        # native fast path, DEFAULT ON where built (C++ libjpeg decode +
        # fused resize/norm; non-antialiased bilinear — tiny numeric delta
        # vs PIL's filter). Opt out with PRISMER_NATIVE_LOADER=0.
        if os.environ.get("PRISMER_NATIVE_LOADER", "1") != "0":
            from prismer_tpu import native
            path = getattr(img, "filename", "")
            if native.is_available() and path.lower().endswith((".jpg",
                                                                ".jpeg")):
                with open(path, "rb") as f:
                    return native.decode_jpeg_resize(
                        f.read(), size, size, tuple(mean), tuple(std))
        img = img.convert("RGB").resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - mean) / std

    return fn


def load_expert_model(task: str, image_size: int = 480
                      ) -> Tuple[Callable, Dict[str, Any], Callable]:
    if task == "depth":
        from prismer_tpu.convert.experts import convert_dpt
        from prismer_tpu.experts.depth.model import DPTDepthModel
        model = DPTDepthModel()
        variables = _init_or_convert(model, convert_dpt, task,
                                     (1, image_size, image_size, 3))
        apply_fn = jax.jit(lambda v, x: model.apply(v, x))
        # transforms.Normalize(mean=0.5, std=0.5) (model_bank.py:21-24)
        return apply_fn, variables, _resize_norm(image_size, 0.5, 0.5)

    if task == "normal":
        from prismer_tpu.convert.experts import convert_nnet
        from prismer_tpu.experts.normal.model import NNET
        model = NNET()
        variables = _init_or_convert(model, convert_nnet, task,
                                     (1, image_size, image_size, 3))
        apply_fn = jax.jit(lambda v, x: model.apply(v, x))
        return apply_fn, variables, _resize_norm(image_size, IMAGENET_MEAN,
                                                 IMAGENET_STD)

    if task == "edge":
        from prismer_tpu.convert.experts import convert_dexined
        from prismer_tpu.experts.edge.model import DexiNed
        model = DexiNed()
        variables = _init_or_convert(model, convert_dexined, task,
                                     (1, image_size, image_size, 3))
        apply_fn = jax.jit(lambda v, x: model.apply(v, x))
        # std=1.0 (model_bank.py:125-128)
        return apply_fn, variables, _resize_norm(image_size, IMAGENET_MEAN,
                                                 (1.0, 1.0, 1.0))

    if task in ("seg_coco", "seg_ade"):
        from prismer_tpu.convert.experts import convert_mask2former
        from prismer_tpu.experts.segmentation.mask2former import MaskFormer
        model = MaskFormer(num_classes=133 if task == "seg_coco" else 150)
        variables = _init_or_convert(model, convert_mask2former, task,
                                     (1, image_size, image_size, 3))
        apply_fn = jax.jit(lambda v, x: model.apply(v, x))
        # detectron2 pixel stats (config PIXEL_MEAN/STD over 255)
        mean = np.array([123.675, 116.28, 103.53], np.float32) / 255.0
        std = np.array([58.395, 57.12, 57.375], np.float32) / 255.0
        return apply_fn, variables, _resize_norm(image_size, mean, std)

    if task == "obj_detection":
        from prismer_tpu.convert.experts import convert_unidet
        from prismer_tpu.experts.obj_detection.rcnn import UniDet
        model = UniDet()
        variables = _init_unidet(model, image_size)
        sd = _load_torch_ckpt(task)
        if sd is not None:
            variables = _merge_converted(variables, convert_unidet(sd),
                                         task)
        mean = np.array([123.68, 116.779, 103.939], np.float32) / 255.0
        std = np.array([58.393, 57.12, 57.375], np.float32) / 255.0
        return model, variables, _resize_norm(image_size, mean, std)

    if task == "ocr_detection":
        from prismer_tpu.convert.experts import convert_charnet
        from prismer_tpu.experts.ocr_detection.model import CharNet
        model = CharNet()
        variables = _init_or_convert(model, convert_charnet, task,
                                     (1, image_size, image_size, 3))
        apply_fn = jax.jit(lambda v, x: model.apply(v, x))
        return apply_fn, variables, _resize_norm(image_size, IMAGENET_MEAN,
                                                 IMAGENET_STD)

    raise ValueError(f"unknown expert task: {task}")


def _init_fresh(model, input_shape) -> Dict[str, Any]:
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return model.init(jax.random.key(0),
                          jnp.zeros(input_shape, jnp.float32))


def _init_unidet(model, image_size: int) -> Dict[str, Any]:
    from prismer_tpu.experts.obj_detection.rcnn import UniDet
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        v1 = model.init(jax.random.key(0), img, method=UniDet.features)
        feats = model.apply(v1, img, method=UniDet.features)
        params = dict(v1["params"])
        stats = dict(v1.get("batch_stats", {}))
        v2 = model.init(jax.random.key(1), feats, method=UniDet.rpn_proposals)
        params.update(v2["params"])
        boxes = jnp.zeros((8, 4), jnp.float32)
        for stage in range(3):
            v3 = model.init(jax.random.key(2 + stage), feats, boxes, stage,
                            method=UniDet.cascade_stage)
            params.update(v3["params"])
            stats.update(v3.get("batch_stats", {}))
    return {"params": params, "batch_stats": stats}


def _init_or_convert(model, converter, task: str, input_shape) -> Dict[str, Any]:
    sd = _load_torch_ckpt(task)
    variables = _init_fresh(model, input_shape)
    if sd is None:
        return variables
    return _merge_converted(variables, converter(sd), task)


# fraction of param leaves a converted expert checkpoint may leave at their
# random init before the load is considered a key-layout drift and refused
_MAX_UNCOVERED_FRACTION = 0.01


def _merge_converted(variables: Dict[str, Any], tree: Dict[str, Any],
                     task: str = "expert") -> Dict[str, Any]:
    """Overlay a converted torch tree onto freshly-initialized variables
    (strict on shape mismatch, lenient on keys the converter doesn't cover)
    — but FAIL LOUDLY when the checkpoint covers too few param leaves: these
    experts are frozen, so a silently partial load (e.g. renamed keys in a
    newly released file) would generate noise labels with no other signal."""
    from prismer_tpu.convert.torch_to_jax import merge_params, uncovered_leaves
    total, missing = uncovered_leaves(variables["params"], tree["params"])
    if len(missing) > _MAX_UNCOVERED_FRACTION * total:
        shown = "\n  ".join(missing[:25])
        more = f"\n  ... and {len(missing) - 25} more" if len(missing) > 25 else ""
        raise ValueError(
            f"[prismer_tpu] expert '{task}': converted checkpoint covers only "
            f"{total - len(missing)}/{total} param leaves — the file's key "
            f"layout does not match this converter (drifted release? wrong "
            f"file?). Refusing a silent partial load. Uncovered leaves:\n  "
            f"{shown}{more}")
    if missing:
        import warnings
        warnings.warn(
            f"[prismer_tpu] expert '{task}': {len(missing)}/{total} param "
            f"leaves kept random init: {missing}", stacklevel=2)
    out = {"params": merge_params(variables["params"], tree["params"])}
    if "batch_stats" in variables:
        stats = variables["batch_stats"]
        if tree.get("batch_stats"):
            stats = merge_params(stats, tree["batch_stats"])
        out["batch_stats"] = stats
    return out
