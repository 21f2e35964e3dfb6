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
  seg_coco / seg_ade — per-pixel argmax of Mask2Former semantic logits,
           nearest resize, grayscale id PNG (generate_segmentation.py:41-55)
  ocr_detection — CharNet word polygons -> id mask + per-word CLIP(PCA)
           64-d feature sidecar .npz (generate_ocrdet.py:47-90)

Multi-process sharding: shard the file list by process id, exactly like the
reference's accelerate data sharding (P9 in SURVEY.md §2).
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import List, Tuple

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
    apply_fn, variables, preprocess = load_expert_model(
        "depth", image_size=getattr(args, "image_size", 480))
    _run_dense(args, "depth", apply_fn, variables, preprocess,
               postprocess=_depth_post)


def run_normal(args):
    apply_fn, variables, preprocess = load_expert_model(
        "normal", image_size=getattr(args, "image_size", 480))
    _run_dense(args, "normal", apply_fn, variables, preprocess,
               postprocess=_normal_post)


def run_edge(args):
    apply_fn, variables, preprocess = load_expert_model(
        "edge", image_size=getattr(args, "image_size", 480))
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


def run_segmentation(args, task):
    import jax.numpy as jnp

    apply_fn, variables, preprocess = load_expert_model(
        task, image_size=getattr(args, "image_size", 480))
    save_root = os.path.join(args.save_path, task)
    files = list_images(args.data_path)[args.shard_id::args.num_shards]
    bs = args.batch_size
    for i in range(0, len(files), bs):
        chunk = files[i:i + bs]
        sizes, batch = [], []
        for p in chunk:
            img = Image.open(p)
            sizes.append(img.size)
            batch.append(preprocess(img))
        sem = apply_fn(variables, jnp.asarray(np.stack(batch)))
        # argmax over classes -> grayscale id map, nearest resize to original
        labels = np.asarray(jnp.argmax(sem, axis=1)).astype(np.uint8)
        for k, p in enumerate(chunk):
            out = Image.fromarray(labels[k], "L").resize(
                sizes[k], Image.NEAREST)
            rel_dir, fname = save_rel_path(p)
            os.makedirs(os.path.join(save_root, rel_dir), exist_ok=True)
            out.save(os.path.join(save_root, rel_dir, fname))
        print(f"[{task}] {min(i + bs, len(files))}/{len(files)}", flush=True)


def run_objdet(args):
    """Occlusion-ordered instance mask + instance->class JSON
    (generate_objdet.py:95-115); depth labels MUST exist (ordering input)."""
    import json as _json

    import jax.numpy as jnp

    from prismer_tpu.experts.obj_detection.rcnn import detect_single
    from prismer_tpu.experts.objdet_postprocess import occlusion_ordered_mask

    model, variables, preprocess = load_expert_model(
        "obj_detection", image_size=getattr(args, "image_size", 480))
    save_root = os.path.join(args.save_path, "obj_detection")
    depth_root = os.path.join(args.save_path, "depth")
    files = list_images(args.data_path)[args.shard_id::args.num_shards]
    size = 480
    for p in files:
        img = Image.open(p)
        w0, h0 = img.size
        x = jnp.asarray(preprocess(img)[None])
        boxes, scores, classes = detect_single(model, variables, x,
                                               (size, size))
        keep = scores >= 0.5  # DefaultPredictor confidence threshold
        boxes, classes = boxes[keep], classes[keep]

        rel_dir, fname = save_rel_path(p)
        dpath = os.path.join(depth_root, rel_dir, fname)
        if os.path.exists(dpath):
            depth = np.asarray(Image.open(dpath).convert("L").resize(
                (size, size), Image.BILINEAR), np.float32) / 255.0
        else:
            depth = np.zeros((size, size), np.float32)
        mask, labels = occlusion_ordered_mask(depth, boxes, classes)
        out = Image.fromarray(mask, "L").resize((w0, h0), Image.NEAREST)
        os.makedirs(os.path.join(save_root, rel_dir), exist_ok=True)
        out.save(os.path.join(save_root, rel_dir, fname))
        with open(os.path.join(save_root, rel_dir,
                               fname.replace(".png", ".json")), "w") as f:
            _json.dump(labels, f)
        print(f"[obj_detection] {p}", flush=True)


def run_ocr(args):
    """Word polygons -> id mask + per-word CLIP(PCA) feature sidecar, the
    reference's exact generation-time pipeline (generate_ocrdet.py:47-90):
    recognized text -> CLIP text encoder -> sklearn-PCA 768->64. When the
    converted CLIP text weights / BPE vocab are absent the features fall
    back to the background vector with a loud warning."""
    import warnings

    import jax.numpy as jnp

    from prismer_tpu.data.features import get_feature_tables
    from prismer_tpu.experts.clip_text import embed_words, load_clip_text
    from prismer_tpu.experts.ocr_detection.postprocess import \
        OrientedTextPostProcessing

    apply_fn, variables, preprocess = load_expert_model(
        "ocr_detection", image_size=getattr(args, "image_size", 480))
    post = OrientedTextPostProcessing()
    tables = get_feature_tables()
    clip_ctx = load_clip_text()
    if clip_ctx is None:
        warnings.warn(
            "[prismer_tpu] OCR word features: converted CLIP text weights "
            "or BPE vocab not found under PRISMER_EXPERT_WEIGHTS — sidecars "
            "will carry the background vector instead of CLIP+PCA "
            "embeddings (generate_ocrdet.py:80-84 semantics disabled).",
            stacklevel=1)
    save_root = os.path.join(args.save_path, "ocr_detection")
    files = list_images(args.data_path)[args.shard_id::args.num_shards]
    size = 480
    for p in files:
        img = Image.open(p)
        w0, h0 = img.size
        x = jnp.asarray(preprocess(img)[None])
        preds = {k: np.asarray(v[0]) for k, v in
                 apply_fn(variables, x).items()}
        words = post(preds, scale_w=w0 / size, scale_h=h0 / size, W=w0, H=h0)
        if not words:
            continue
        mask = np.full((h0, w0), 255, np.uint8)
        texts = []
        for i, wd in enumerate(reversed(words)):  # reference stamps reversed
            poly = np.asarray(wd.word_bbox, np.float32).reshape(4, 2)
            _fill_polygon(mask, poly, i)
            texts.append(wd.text.lower())  # get_label (generate_ocrdet.py:54)
        if clip_ctx is not None:
            word_feats = embed_words(texts, clip_ctx, tables)
        else:
            word_feats = np.tile(tables.background, (len(texts), 1))
        sidecar = {}
        for i, text in enumerate(texts):
            sidecar[str(i)] = word_feats[i].astype(np.float32)
            sidecar[f"text_{i}"] = np.array(text)
        rel_dir, fname = save_rel_path(p)
        os.makedirs(os.path.join(save_root, rel_dir), exist_ok=True)
        Image.fromarray(mask, "L").save(
            os.path.join(save_root, rel_dir, fname))
        with open(os.path.join(save_root, rel_dir,
                               fname.replace(".png", ".pt")), "wb") as f:
            np.savez(f, **sidecar)
        print(f"[ocr_detection] {p}", flush=True)


def _fill_polygon(mask: np.ndarray, poly: np.ndarray, value: int) -> None:
    """Rasterize a convex quad into `mask` (cv2.fillPoly stand-in)."""
    try:
        import cv2
        cv2.fillPoly(mask, [poly.astype(np.int32)], value)
        return
    except ImportError:
        pass
    h, w = mask.shape
    ys, xs = np.mgrid[0:h, 0:w]
    inside = np.ones((h, w), bool)
    n = len(poly)
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        cross = ((b[0] - a[0]) * (ys - a[1]) - (b[1] - a[1]) * (xs - a[0]))
        inside &= cross >= 0 if _signed_area(poly) > 0 else cross <= 0
    mask[inside] = value


def _signed_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True,
                    choices=["depth", "normal", "edge", "seg_coco", "seg_ade",
                             "obj_detection", "ocr_detection"])
    ap.add_argument("--config", default="")
    ap.add_argument("--data_path", default="helpers")
    ap.add_argument("--save_path", default="helpers/labels")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--image_size", type=int, default=480,
                    help="expert input resolution (labels are "
                         "resized back to the original image "
                         "size regardless)")
    ap.add_argument("--shard_id", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    args = ap.parse_args()
    if args.config:
        cfg = yaml.safe_load(open(args.config))
        args.data_path = cfg.get("data_path", args.data_path)
        args.save_path = cfg.get("save_path", args.save_path)

    if args.task in ("seg_coco", "seg_ade"):
        run_segmentation(args, args.task)
    elif args.task == "obj_detection":
        run_objdet(args)
    elif args.task == "ocr_detection":
        run_ocr(args)
    else:
        {"depth": run_depth, "normal": run_normal,
         "edge": run_edge}[args.task](args)


if __name__ == "__main__":
    main()
