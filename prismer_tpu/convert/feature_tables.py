"""Convert the reference's binary CLIP feature tables to a single .npz.

The reference in-paints expert id maps with CLIP text embeddings from four
torch tables + an sklearn PCA pickle (dataset/utils.py:17-20,
experts/generate_ocrdet.py:27; inventory SURVEY.md 2.13):

  coco_features.pt       {labels: [str], features: (133, 64)}
  ade_features.pt        {labels: [str], features: (150, 64)}
  detection_features.pt  {labels: [str], features: (722, 64)}
  background_features.pt (64,)
  clip_pca.pkl           sklearn PCA(768 -> 64): components_ (64,768), mean_

These are *data assets* (PCA-projected CLIP ViT-L/14 text embeddings of the
class vocabularies), converted once to numpy. Usage:

  python -m prismer_tpu.convert.feature_tables --src <dir-with-pt-files> \
      --dst prismer_tpu/assets/features.npz
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def convert(src_dir: str, dst_path: str) -> None:
    import torch  # conversion-time only

    out = {}
    for name in ("coco", "ade", "detection"):
        d = torch.load(os.path.join(src_dir, f"{name}_features.pt"),
                       map_location="cpu", weights_only=False)
        out[f"{name}_features"] = d["features"].numpy().astype(np.float32)
        out[f"{name}_labels"] = np.asarray(d["labels"], dtype=object)
    bg = torch.load(os.path.join(src_dir, "background_features.pt"),
                    map_location="cpu", weights_only=False)
    out["background"] = bg.numpy().astype(np.float32)

    pca_path = os.path.join(src_dir, "clip_pca.pkl")
    if os.path.exists(pca_path):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            with open(pca_path, "rb") as f:
                pca = pickle.load(f)
        out["pca_components"] = np.asarray(pca.components_, np.float32)
        out["pca_mean"] = np.asarray(pca.mean_, np.float32)

    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    np.savez_compressed(dst_path, **{k: v for k, v in out.items()
                                     if not isinstance(v, np.ndarray)
                                     or v.dtype != object})
    # object (label-string) arrays go in a sidecar .npz with pickle
    np.savez(dst_path.replace(".npz", "_labels.npz"),
             **{k: v for k, v in out.items()
                if isinstance(v, np.ndarray) and v.dtype == object},
             allow_pickle=True)
    print(f"wrote {dst_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(__file__), "..", "assets", "features.npz"))
    a = ap.parse_args()
    convert(a.src, a.dst)
