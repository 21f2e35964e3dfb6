"""Expert-label visualization (reference: demo_vis.py).

  python -m prismer_tpu.cli.demo_vis --image helpers/images/x.jpg \
      --label_path helpers/labels --out vis.png

Builds the reference's 7-panel figure: RGB + caption, depth (plasma-style
colormap), surface normal, edge, and the three id-map experts rendered with
a deterministic per-id palette (demo_vis.py:122-161). Pure PIL/numpy — no
matplotlib dependency."""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw


def ade20k_colormap() -> np.ndarray:
    """The ADE20K benchmark colormap (151, 3) u8 — the exact constant table
    the reference visualizes segmentation with (utils.py:44-201); bundled as
    an asset."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "ade20k_colormap.npy")
    return np.load(path)


def _palette(n: int = 256, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = rng.integers(40, 255, (n, 3)).astype(np.uint8)
    pal[255] = (0, 0, 0)  # background
    return pal


def _plasma(gray: np.ndarray) -> np.ndarray:
    """Cheap perceptual colormap for depth maps (u8 -> RGB u8)."""
    t = gray.astype(np.float32) / 255.0
    r = np.clip(3.0 * t - 0.5, 0, 1)
    g = np.clip(1.5 * t, 0, 1) * (1 - 0.5 * t)
    b = np.clip(1.5 - 2.0 * t, 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def load_panel(label_path, exp, rel_dir, fname, size):
    p = os.path.join(label_path, exp, rel_dir, fname)
    if not os.path.exists(p):
        return Image.new("RGB", size, (32, 32, 32))
    img = Image.open(p)
    arr = np.asarray(img.convert("L" if exp != "normal" else "RGB"))
    if exp == "depth":
        out = Image.fromarray(_plasma(arr))
    elif exp in ("normal",):
        out = img.convert("RGB")
    elif exp == "edge":
        out = Image.fromarray(np.stack([arr] * 3, -1))
    elif exp == "seg_ade":
        # the reference colors ADE segmentation with the benchmark colormap
        # (utils.py:44-201); ids >= 151 (incl. 255 background) wrap into the
        # deterministic palette
        cmap = np.concatenate([ade20k_colormap(),
                               _palette()[len(ade20k_colormap()):]])
        out = Image.fromarray(cmap[arr])
    else:  # id maps
        out = Image.fromarray(_palette()[arr])
    return out.resize(size, Image.NEAREST)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--label_path", default="helpers/labels")
    ap.add_argument("--out", default="")
    ap.add_argument("--panel", type=int, default=256)
    args = ap.parse_args()

    parts = args.image.split("/")
    rel_dir = os.path.join(parts[-3], parts[-2])
    ext = args.image.split(".")[-1]
    fname = parts[-1].replace(f".{ext}", ".png")
    size = (args.panel, args.panel)

    rgb = Image.open(args.image).convert("RGB").resize(size, Image.BILINEAR)
    panels = [("rgb", rgb)]
    for exp in ("depth", "normal", "edge", "seg_coco", "obj_detection",
                "ocr_detection"):
        panels.append((exp, load_panel(args.label_path, exp, rel_dir, fname,
                                       size)))

    caption_path = os.path.splitext(args.image)[0] + ".txt"
    caption = (open(caption_path).read().strip()
               if os.path.exists(caption_path) else "")

    pad, header = 4, 20
    w = len(panels) * (args.panel + pad) + pad
    h = args.panel + 2 * pad + header
    canvas = Image.new("RGB", (w, h), (255, 255, 255))
    draw = ImageDraw.Draw(canvas)
    for i, (name, panel) in enumerate(panels):
        x = pad + i * (args.panel + pad)
        canvas.paste(panel, (x, pad + header))
        draw.text((x, 2), name, fill=(0, 0, 0))
    if caption:
        draw.text((pad, pad + header - 14), f"caption: {caption}",
                  fill=(60, 60, 60))

    out = args.out or os.path.splitext(args.image)[0] + "_vis.png"
    canvas.save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
