"""Input-pipeline throughput benchmark (VERDICT round-2 item #3).

Measures the FULL 6-expert training record pipeline — JPEG decode, 6 label
PNG decodes, joint RandomResizedCrop/flip/RandAugment Transform, id-map
tensorization, batch collate — in records/sec, against the model's measured
consumption rate (BENCH img/s/chip). The reference's documented bottleneck
is exactly this path (SURVEY.md §3 hot loop (c): dataset/utils.py:117-159
in 8 torch workers).

Prints one JSON line:
  {"records_per_sec": ..., "records_per_sec_per_core": ..., "cpus": ...,
   "stage_ms": {...}, "model_appetite_img_s": ..., "cores_needed": ...}

Run: python tools/bench_input_pipeline.py [--n 64] [--batch 8] [--res 480]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPERTS = ["depth", "normal", "seg_coco", "edge", "obj_detection",
           "ocr_detection"]


def _blocky(rng, h, w, lo, hi, cell=24):
    """Piecewise-constant map — representative of real id/label PNGs
    (random noise would be a zlib worst case and overstate decode cost)."""
    gh, gw = h // cell + 1, w // cell + 1
    grid = rng.integers(lo, hi, (gh, gw), dtype=np.uint8)
    return np.array(Image.fromarray(grid).resize((w, h), Image.NEAREST))


def _smooth(rng, h, w, channels=1):
    """Smooth gradient + low-freq noise — representative of depth/normal."""
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 64, w, dtype=np.float32)[None, :]
    base = (y + x) % 256
    noise = np.asarray(Image.fromarray(
        rng.integers(0, 255, (h // 16, w // 16), dtype=np.uint8)).resize(
            (w, h), Image.BILINEAR), np.float32)
    m = ((base + 0.3 * noise) % 256).astype(np.uint8)
    if channels == 3:
        return np.stack([m, np.roll(m, 7, 0), np.roll(m, 13, 1)], -1)
    return m


def synth_tree(root: str, n: int, w: int = 640, h: int = 480) -> None:
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "images", "vqav2", "train2014")
    os.makedirs(img_dir, exist_ok=True)
    lbl = os.path.join(root, "labels")
    train_list = []
    for i in range(n):
        name = f"train2014/img_{i:05d}.jpg"
        arr = _smooth(rng, h, w, channels=3)
        Image.fromarray(arr).save(os.path.join(img_dir, f"img_{i:05d}.jpg"),
                                  quality=90)
        for exp in EXPERTS:
            d = os.path.join(lbl, exp, "vqav2", "train2014")
            os.makedirs(d, exist_ok=True)
            p = os.path.join(d, f"img_{i:05d}.png")
            if exp == "normal":
                Image.fromarray(_smooth(rng, h, w, 3)).save(p)
            elif exp == "seg_coco":
                Image.fromarray(_blocky(rng, h, w, 0, 133)).save(p)
            elif exp in ("obj_detection", "ocr_detection"):
                ids = _blocky(rng, h, w, 0, 8)
                ids[h // 2:] = 255
                Image.fromarray(ids).save(p)
            else:
                Image.fromarray(_smooth(rng, h, w)).save(p)
        with open(os.path.join(lbl, "obj_detection", "vqav2", "train2014",
                               f"img_{i:05d}.json"), "w") as f:
            json.dump({str(j): int(rng.integers(0, 722)) for j in range(8)},
                      f)
        feats = {str(j): rng.standard_normal(64).astype(np.float32)
                 for j in range(8)}
        with open(os.path.join(lbl, "ocr_detection", "vqav2", "train2014",
                               f"img_{i:05d}.pt"), "wb") as f:
            np.savez(f, **feats)
        train_list.append({"image": name,
                           "caption": f"synthetic caption number {i}"})
    with open(os.path.join(root, "images", "coco_karpathy_train.json"),
              "w") as f:
        json.dump(train_list, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=480)
    ap.add_argument("--appetite", type=float, default=190.0,
                    help="model img/s/chip from BENCH (consumption target)")
    ap.add_argument("--label_cache", action="store_true",
                    help="enable PRISMER_LABEL_CACHE (decoded-label .npy "
                         "cache) and measure the warm-cache epoch")
    args = ap.parse_args()

    if args.label_cache:
        cache_dir = tempfile.mkdtemp(prefix="prismer_label_cache_")
        os.environ["PRISMER_LABEL_CACHE"] = cache_dir

    from prismer_tpu.data.datasets import Caption
    from prismer_tpu.data.loader import create_loader

    with tempfile.TemporaryDirectory() as root:
        synth_tree(root, args.n)
        cfg = {"data_path": os.path.join(root, "images"),
               "label_path": os.path.join(root, "labels"),
               "experts": EXPERTS, "image_resolution": args.res,
               "dataset": "coco", "prefix": "A picture of"}
        ds = Caption(cfg, train=True)

        # warm caches (PNG/JPEG headers, feature tables; with --label_cache
        # this pass also populates the decoded-label .npy cache)
        for i in range(args.n if args.label_cache else 4):
            ds[i]

        cpus = len(os.sched_getaffinity(0))

        # per-stage breakdown, single core
        from prismer_tpu.data.labels import (build_expert_record,
                                             load_expert_labels)
        t_io = t_tf = t_rec = 0.0
        reps = min(24, args.n)
        for i in range(reps):
            d = ds.data_list[i]
            t0 = time.perf_counter()
            image, labels, info = load_expert_labels(
                ds.data_path, ds.label_path, d["image"], "vqav2", EXPERTS)
            t1 = time.perf_counter()
            transformed = ds.transform(image, labels)
            t2 = time.perf_counter()
            build_expert_record(transformed, info, ds.tables)
            t3 = time.perf_counter()
            t_io += t1 - t0
            t_tf += t2 - t1
            t_rec += t3 - t2
        stage_ms = {"label_io_decode": 1e3 * t_io / reps,
                    "transform_augment": 1e3 * t_tf / reps,
                    "tensorize_record": 1e3 * t_rec / reps}

        # end-to-end loader throughput, thread vs forked-process workers
        # (the driver-level question: can the default loader FEED the chip?)
        rps = {}
        for wt in ("thread", "process"):
            loader = create_loader(ds, batch_size=args.batch,
                                   num_workers=max(2, cpus), train=True,
                                   worker_type=wt)
            n_rec = 0
            t0 = time.perf_counter()
            for batch in loader:
                n_rec += batch["experts"]["rgb"].shape[0]
            rps[wt] = n_rec / (time.perf_counter() - t0)

    best = max(rps.values())
    out = {
        "records_per_sec": {k: round(v, 2) for k, v in rps.items()},
        "records_per_sec_per_core": round(best / cpus, 2),
        "cpus": cpus,
        "stage_ms": {k: round(v, 2) for k, v in stage_ms.items()},
        "model_appetite_img_s": args.appetite,
        "label_cache": args.label_cache,
        "feeds_chip": best >= args.appetite,
        "cores_needed": int(np.ceil(args.appetite / max(best / cpus, 1e-9))),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
