"""Generator framework tests: occlusion-ordered objdet masking semantics and
an end-to-end depth/edge/normal label generation sweep over a synthetic
image folder (random-init weights)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from prismer_tpu.experts.objdet_postprocess import occlusion_ordered_mask


def test_occlusion_duplicates_dropped():
    depth = np.zeros((20, 20), np.float32)
    boxes = [(0, 0, 10, 10), (0, 0, 10, 10), (12, 12, 18, 18)]
    mask, labels = occlusion_ordered_mask(depth, boxes, [7, 8, 9])
    assert labels == {0: 7, 1: 9}  # the exact duplicate vanishes
    assert mask[5, 5] == 0
    assert mask[15, 15] == 1
    assert mask[0, 19] == 255


def test_occlusion_containment():
    """An object fully inside another sits in front: the outer mask loses
    the contained region."""
    depth = np.zeros((20, 20), np.float32)
    boxes = [(2, 2, 9, 9), (0, 0, 12, 12)]  # box0 inside box1
    mask, labels = occlusion_ordered_mask(depth, boxes, [1, 2])
    assert mask[5, 5] == 0       # inner object keeps its area
    assert mask[10, 10] == 1     # outer object elsewhere
    assert mask[15, 15] == 255


def test_occlusion_depth_ordering():
    """Partial overlap resolved by mean (inverse-)depth: closer wins."""
    depth = np.zeros((20, 20), np.float32)
    depth[:, 10:] = 1.0  # right side closer
    boxes = [(0, 5, 12, 15), (8, 5, 20, 15)]  # overlap x in [8,12)
    mask, labels = occlusion_ordered_mask(depth, boxes, [3, 4])
    # object 1 (right) has higher mean depth -> closer -> keeps the overlap
    assert mask[10, 9] == 1
    assert mask[10, 3] == 0
    assert mask[10, 18] == 1


@pytest.mark.parametrize("task", ["depth", "edge", "normal"])
def test_generate_labels_end_to_end(tmp_path, task):
    """Full generator run (random weights) over a tiny folder; checks file
    layout + format the data pipeline consumes."""
    img_dir = tmp_path / "helpers" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
                    .astype(np.uint8)).save(img_dir / "x.jpg")

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
               PRISMER_EXPERT_WEIGHTS=str(tmp_path / "nonexistent"))
    env.pop("PALLAS_AXON_POOL_IPS", None)  # else sitecustomize forces the axon TPU backend over JAX_PLATFORMS=cpu
    out = subprocess.run(
        [sys.executable, "-m", "prismer_tpu.experts.generate",
         "--task", task, "--data_path", str(tmp_path / "helpers"),
         "--save_path", str(tmp_path / "helpers" / "labels"),
         "--batch_size", "1"],
        capture_output=True, text=True, timeout=1200, env=env)
    assert out.returncode == 0, out.stderr[-2000:]

    label = (tmp_path / "helpers" / "labels" / task / "helpers" / "images"
             / "x.png")
    assert label.exists()
    img = Image.open(label)
    assert img.size == (50, 40)
    assert img.mode == ("RGB" if task == "normal" else "L")
