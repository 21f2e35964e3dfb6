"""Expert-label file I/O + per-sample tensorization records.

Replicates the on-disk label layout the reference's offline expert
generators produce (dataset/utils.py:74-114):

  <label_path>/<expert>/<dataset>/<image>.png      grayscale id/dense map
                                                   (RGB for 'normal')
  <label_path>/obj_detection/<dataset>/<image>.json  instance -> class map
  <label_path>/ocr_detection/<dataset>/<image>.pt    {word_id: {features,text}}

Missing/empty files fall back to zeros (dense) or all-255 background (id
maps) exactly as the reference does (utils.py:84-110).

The output record is TPU-shaped: dense maps as float arrays, id maps as
uint8 + a per-sample (256, 64) gather table (see data/features.py), instead
of the reference's CPU-expanded 64-channel float maps.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
from PIL import Image, ImageFile

from prismer_tpu.data.features import FeatureTables, get_feature_tables

ImageFile.LOAD_TRUNCATED_IMAGES = True


def _label_file(label_path: str, expert: str, dataset: str,
                image_path: str, new_ext: str) -> str:
    ext = image_path.split(".")[-1]
    return os.path.join(label_path, expert, dataset,
                        image_path.replace(f".{ext}", new_ext))


def _nonempty(path: str) -> bool:
    return os.path.exists(path) and os.stat(path).st_size > 0


def _cache_npy_path(path: str) -> str:
    root = os.environ["PRISMER_LABEL_CACHE"]
    return os.path.join(root, os.path.abspath(path).lstrip(os.sep) + ".npy")


def _open_label_png(path: str, mode: str) -> Image.Image:
    """Decode a label PNG — native libpng fast path (GIL-releasing, default
    on, opt out with PRISMER_NATIVE_LOADER=0) when the file's channel count
    already matches `mode`; exact PIL fallback otherwise (an RGB file read
    as 'L' needs PIL's luminance conversion semantics).

    PRISMER_LABEL_CACHE=<dir>: zlib inflate dominates the per-record host
    cost (~15 ms for the 7 labels of a 640x480 record, measured) and the
    pixels are re-read every epoch — with the cache set, each PNG's decoded
    array is written once as raw .npy (mtime-validated, atomic rename) and
    later epochs memcpy it from the page cache instead of inflating."""
    cache_root = os.environ.get("PRISMER_LABEL_CACHE")
    if cache_root:
        cp = _cache_npy_path(path)
        try:
            if os.path.getmtime(cp) >= os.path.getmtime(path):
                arr = np.load(cp)
                if ((mode == "L" and arr.ndim == 2)
                        or (mode == "RGB" and arr.ndim == 3)):
                    img = Image.fromarray(arr, mode)
                    # the vectorized label warp gathers straight from this
                    # array, skipping a PIL->numpy copy (transform.py)
                    img.prismer_np = arr
                    return img
        except (OSError, ValueError):
            pass

    img = None
    if os.environ.get("PRISMER_NATIVE_LOADER", "1") != "0":
        from prismer_tpu import native
        if native.is_available():
            try:
                with open(path, "rb") as f:
                    arr = native.decode_png(f.read())
            except Exception:
                arr = None
            if arr is not None:
                if mode == "L" and arr.ndim == 2:
                    img = Image.fromarray(arr, "L")
                    img.prismer_np = arr
                elif mode == "RGB" and arr.ndim == 3:
                    img = Image.fromarray(arr, "RGB")
                    img.prismer_np = arr
    if img is None:
        img = Image.open(path).convert(mode)

    if cache_root:
        cp = _cache_npy_path(path)
        try:
            os.makedirs(os.path.dirname(cp), exist_ok=True)
            tmp = cp + f".{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                np.save(f, np.asarray(img))
            os.replace(tmp, cp)
        except OSError:
            pass
    return img


def load_expert_labels(data_path: str, label_path: str, image_path: str,
                       dataset: str, experts) -> Tuple[Image.Image,
                                                       Optional[Dict],
                                                       Optional[Dict]]:
    """(RGB PIL image, {expert: PIL label}, {expert: side info}) with the
    reference's fallbacks (dataset/utils.py:74-114)."""
    image = Image.open(os.path.join(data_path, dataset, image_path)
                       if data_path else os.path.join(dataset, image_path))
    image = image.convert("RGB")
    if experts in (None, "none"):
        return image, None, None

    w, h = image.size
    labels: Dict[str, Image.Image] = {}
    info: Dict[str, Any] = {}
    for exp in experts:
        png = _label_file(label_path, exp, dataset, image_path, ".png")
        if exp in ("seg_coco", "seg_ade", "edge", "depth"):
            labels[exp] = (_open_label_png(png, "L") if _nonempty(png)
                           else Image.new("L", (w, h), 0))
        elif exp == "normal":
            labels[exp] = (_open_label_png(png, "RGB") if _nonempty(png)
                           else Image.new("RGB", (w, h), (0, 0, 0)))
        elif exp == "obj_detection":
            labels[exp] = (_open_label_png(png, "L") if _nonempty(png)
                           else Image.new("L", (w, h), 255))
            js = _label_file(label_path, exp, dataset, image_path, ".json")
            info[exp] = json.load(open(js)) if os.path.exists(js) else {}
        elif exp == "ocr_detection":
            pt = _label_file(label_path, exp, dataset, image_path, ".pt")
            if os.path.exists(pt):
                labels[exp] = _open_label_png(png, "L")
                info[exp] = _load_ocr_sidecar(pt)
            else:
                labels[exp] = Image.new("L", (w, h), 255)
                info[exp] = None
    return image, labels, info


def _load_ocr_sidecar(path: str):
    """OCR sidecars from the reference generators are torch pickles; ours
    are .npz. Support both."""
    if path.endswith(".npz") or _is_npz(path):
        z = np.load(path, allow_pickle=True)
        out: Dict[int, Dict[str, Any]] = {}
        for k in z.files:
            if k.startswith("text_"):
                out.setdefault(int(k[5:]), {})["text"] = str(z[k])
            else:
                out.setdefault(int(k), {})["features"] = z[k]
        return out
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _is_npz(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(2) == b"PK"
    except OSError:
        return False


def build_expert_record(transformed: Dict[str, np.ndarray],
                        info: Optional[Dict[str, Any]],
                        tables: Optional[FeatureTables] = None
                        ) -> Dict[str, Any]:
    """Post-transform tensorization (the reference's post_label_process,
    dataset/utils.py:117-159, re-shaped for device-side gather):

      dense experts  -> (H, W, C) float32 remapped to [-1, 1]
      seg_coco/ade   -> {'ids': (H,W) u8, 'table': (256,64)}   [shared table]
      obj_detection  -> {'ids', 'table' (from instance->class json),
                         'instance': (H,W) u8}
      ocr_detection  -> {'ids', 'table' (from word sidecar)}
    """
    from prismer_tpu.data.transform import DENSE_EXPERTS, remap_dense
    tables = tables or get_feature_tables()
    out: Dict[str, Any] = {"rgb": transformed["rgb"]}
    for exp, arr in transformed.items():
        if exp == "rgb":
            continue
        if exp in DENSE_EXPERTS:
            out[exp] = remap_dense(arr)
        elif exp in ("seg_coco", "seg_ade"):
            out[exp] = {"ids": arr, "table": tables.seg_table(exp)}
        elif exp == "obj_detection":
            label_map = (info or {}).get(exp) or {}
            out[exp] = {"ids": arr,
                        "table": tables.detection_table(label_map),
                        "instance": arr}
        elif exp == "ocr_detection":
            word_info = (info or {}).get(exp)
            out[exp] = {"ids": arr, "table": tables.ocr_table(word_info)}
    return out
