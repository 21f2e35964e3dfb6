"""CLIP feature tables + PCA projection for expert-label in-painting.

TPU-first redesign of the reference's CPU in-paint loop
(dataset/utils.py:117-159): instead of materializing (64, 224, 224) float
maps per expert per sample on the host (~37 MB/sample over PCIe), the host
ships the uint8 id map plus a tiny (256, 64) per-sample lookup table and the
device performs `table[id_map]` as one fused XLA gather (see
prismer_tpu/data/device.py). Row 255 is the background vector
(dataset/utils.py:127,136,146,156); unused rows default to background.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import numpy as np

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets",
                      "features.npz")

NUM_IDS = 256  # uint8 id space; 255 = background
FEATURE_DIM = 64


class FeatureTables:
    def __init__(self, path: Optional[str] = None):
        path = path or os.environ.get("PRISMER_FEATURES", _ASSET)
        z = np.load(path)
        self.background = z["background"].astype(np.float32)
        self.coco = z["coco_features"].astype(np.float32)
        self.ade = z["ade_features"].astype(np.float32)
        self.detection = z["detection_features"].astype(np.float32)
        self.pca_components = z.get("pca_components")
        self.pca_mean = z.get("pca_mean")
        self._gather = {
            "seg_coco": self._make_gather(self.coco),
            "seg_ade": self._make_gather(self.ade),
        }

    def _make_gather(self, feats: np.ndarray) -> np.ndarray:
        table = np.tile(self.background, (NUM_IDS, 1)).astype(np.float32)
        table[: len(feats)] = feats
        table[255] = self.background
        return table

    def seg_table(self, domain: str) -> np.ndarray:
        """(256, 64) gather table for 'seg_coco' / 'seg_ade' id maps."""
        return self._gather[domain]

    def detection_table(self, label_map: Dict[str, int]) -> np.ndarray:
        """Per-sample (256, 64) table from the objdet instance->class JSON
        (dataset/utils.py:141-149)."""
        table = np.tile(self.background, (NUM_IDS, 1)).astype(np.float32)
        for inst_id, class_idx in label_map.items():
            table[int(inst_id)] = self.detection[int(class_idx)]
        table[255] = self.background
        return table

    def ocr_table(self, word_info) -> np.ndarray:
        """Per-sample (256, 64) table from the OCR sidecar
        ({word_id: {'features': (64,), 'text': str}}, dataset/utils.py:151-159).
        word_info=None -> all-background (missing-label fallback)."""
        table = np.tile(self.background, (NUM_IDS, 1)).astype(np.float32)
        if word_info:
            for word_id, rec in word_info.items():
                feats = rec["features"]
                feats = np.asarray(
                    feats.numpy() if hasattr(feats, "numpy") else feats,
                    np.float32)
                table[int(word_id)] = feats
        table[255] = self.background
        return table

    def pca_project(self, emb: np.ndarray) -> np.ndarray:
        """CLIP 768-d text embedding -> 64-d (sklearn PCA transform:
        (x - mean) @ components.T), used by the OCR generator
        (experts/generate_ocrdet.py:80-84)."""
        assert self.pca_components is not None, "features.npz lacks PCA"
        return (emb - self.pca_mean) @ self.pca_components.T


@functools.lru_cache(maxsize=1)
def get_feature_tables() -> FeatureTables:
    return FeatureTables()
