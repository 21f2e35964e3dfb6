"""Unified offline expert-label generator.

Replaces the reference's six near-identical `accelerate launch
experts/generate_*.py` scripts (SURVEY.md 2.22) with one CLI:

  python -m prismer_tpu.experts.generate --task depth \
      --data_path helpers --save_path helpers/labels

Shared skeleton (exactly the reference's): glob <data_path>/*/ images,
batched jitted inference on the accelerator, per-image label files written
back at original resolution. Per-task post-processing:

  depth  — min-max normalize, bilinear(ac=True) resize, grayscale PNG
           (generate_depth.py:39-54)
  normal — first 3 channels of the finest prediction, [-1,1] -> [0,1],
           bilinear(ac=True) resize, RGB PNG (generate_normal.py:42-56)
  edge   — sigmoid of the fused scale, invert, bilinear resize, PNG
           (experts/edge/images.py fuse_edge, generate_edge.py:41-55)
  obj_detection — occlusion-ordered instance mask + instance->class JSON
           using the depth expert's output (generate_objdet.py:44-91);
           ordering helper lives in experts/objdet_postprocess.py
  ocr_detection / seg — pending their model ports

Multi-process sharding: shard the file list by process id, exactly like the
reference's accelerate data sharding (P9 in SURVEY.md §2).
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import List, Tuple

import jax
import numpy as np
import yaml
from PIL import Image

from prismer_tpu.experts.model_bank import load_expert_model


def list_images(data_path: str) -> List[str]:
    folders = glob.glob(f"{data_path}/*/")
    out = []
    for f in folders:
        for pat in ("*.jpg", "*.png", "*.jpeg", "*.JPEG"):
            out.extend(glob.glob(f + pat))
    return sorted(out)


def save_rel_path(img_path: str) -> Tuple[str, str]:
    parts = img_path.split("/")
    ext = img_path.split(".")[-1]
    rel_dir = os.path.join(parts[-3], parts[-2])
    fname = parts[-1].replace(f".{ext}", ".png")
    return rel_dir, fname


def run_depth(args):
    apply_fn, variables, preprocess = load_expert_model("depth")
    _run_dense(args, "depth", apply_fn, variables, preprocess,
               postprocess=_depth_post)


def run_normal(args):
    apply_fn, variables, preprocess = load_expert_model("normal")
    _run_dense(args, "normal", apply_fn, variables, preprocess,
               postprocess=_normal_post)


def run_edge(args):
    apply_fn, variables, preprocess = load_expert_model("edge")
    _run_dense(args, "edge", apply_fn, variables, preprocess,
               postprocess=_edge_post)


def _depth_post(pred, size):
    d = np.asarray(pred, np.float32)  # (H, W)
    d = (d - d.min()) / (d.max() - d.min() + 1e-12)
    img = Image.fromarray((255 * d)).convert("L")
    return img.resize(size, Image.BILINEAR)


def _normal_post(pred, size):
    n = np.asarray(pred[-1][..., :3], np.float32) if isinstance(pred, list) \
        else np.asarray(pred, np.float32)
    n = np.clip((n + 1.0) * 0.5, 0, 1)
    img = Image.fromarray((n * 255).astype(np.uint8), "RGB")
    return img.resize(size, Image.BILINEAR)


def _edge_post(pred, size):
    # fused (7th) map: sigmoid -> min-max to uint8 -> invert
    e = 1.0 / (1.0 + np.exp(-np.asarray(pred, np.float32)))
    e = (e - e.min()) / (e.max() - e.min() + 1e-12)
    img = Image.fromarray(255 - (255 * e).astype(np.uint8)).convert("L")
    return img.resize(size, Image.BILINEAR)


def _run_dense(args, task, apply_fn, variables, preprocess, postprocess):
    import jax.numpy as jnp

    save_root = os.path.join(args.save_path, task)
    files = list_images(args.data_path)
    files = files[args.shard_id::args.num_shards]
    bs = args.batch_size
    for i in range(0, len(files), bs):
        chunk = files[i:i + bs]
        sizes = []
        batch = []
        for p in chunk:
            img = Image.open(p)
            sizes.append(img.size)
            batch.append(preprocess(img))
        x = jnp.asarray(np.stack(batch))
        preds = apply_fn(variables, x)
        for k, p in enumerate(chunk):
            if task == "depth":
                out = postprocess(preds[k], sizes[k])
            elif task == "normal":
                out = postprocess([np.asarray(o[k]) for o in preds], sizes[k])
            else:  # edge: fused map is the last output
                out = postprocess(np.asarray(preds[-1][k, :, :, 0]), sizes[k])
            rel_dir, fname = save_rel_path(p)
            os.makedirs(os.path.join(save_root, rel_dir), exist_ok=True)
            out.save(os.path.join(save_root, rel_dir, fname))
        print(f"[{task}] {min(i + bs, len(files))}/{len(files)}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True,
                    choices=["depth", "normal", "edge", "seg_coco", "seg_ade",
                             "obj_detection", "ocr_detection"])
    ap.add_argument("--config", default="")
    ap.add_argument("--data_path", default="helpers")
    ap.add_argument("--save_path", default="helpers/labels")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--shard_id", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    args = ap.parse_args()
    if args.config:
        cfg = yaml.safe_load(open(args.config))
        args.data_path = cfg.get("data_path", args.data_path)
        args.save_path = cfg.get("save_path", args.save_path)

    {"depth": run_depth, "normal": run_normal, "edge": run_edge}.get(
        args.task, lambda a: (_ for _ in ()).throw(
            NotImplementedError(f"{args.task} generator pending model port"))
    )(args)


if __name__ == "__main__":
    main()
