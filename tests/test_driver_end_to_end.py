"""Full caption-driver integration: `python -m prismer_tpu.cli.train_caption`
runs one training epoch + generation eval + native CIDEr eval + best-gated
orbax checkpointing over a synthetic COCO-format data tree with a tiny
model, entirely in a subprocess (8 virtual CPU devices)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from prismer_tpu.tokenizer import synthetic_tokenizer


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    data = root / "data"
    (data / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)

    # dataset source dir is '<data_path>/vqav2' (caption_dataset.py:47)
    (data / "vqav2" / "images").mkdir(parents=True)
    train_list, test_list, gt_ann = [], [], []
    for i in range(4):
        name = f"images/COCO_val2014_{i:012d}.jpg"
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        .astype(np.uint8)).save(data / "vqav2" / name)
        train_list.append({"image": name, "caption": f"a toy object {i}"})
        if i < 2:
            test_list.append({"image": name})
            gt_ann.append({"image_id": i, "caption": f"A toy object {i}."})

    (data / "coco_karpathy_train.json").write_text(json.dumps(train_list))
    (data / "coco_karpathy_test.json").write_text(json.dumps(test_list))
    (data / "coco_karpathy_test_gt.json").write_text(json.dumps(
        {"annotations": gt_ann, "images": [{"id": i} for i in range(2)]}))

    # tokenizer files
    tok_dir = root / "tok"
    tok_dir.mkdir()
    tok = synthetic_tokenizer()
    (tok_dir / "vocab.json").write_text(json.dumps(tok.vocab))
    merges = ["#version: 0.2"] + [
        f"{a} {b}" for (a, b), _ in sorted(tok.bpe_ranks.items(),
                                           key=lambda kv: kv[1])]
    (tok_dir / "merges.txt").write_text("\n".join(merges) + "\n")

    # task config: PrismerZ-tiny (no expert labels needed on disk)
    cfg = f"""
coco:
  dataset: 'coco'
  data_path: '{data}'
  label_path: '{data}/labels'
  experts: 'none'
  image_resolution: 64
  prismer_model: 'prismer_tiny'
  freeze: 'freeze_vision'
  batch_size_train: 2
  batch_size_test: 2
  init_lr: 1.0e-4
  weight_decay: 0.05
  min_lr: 0
  max_epoch: 1
  prefix: 'a toy'
"""
    (root / "caption.yaml").write_text(cfg)
    return root


def test_train_caption_driver_end_to_end(coco_tree):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH="/root/repo",
               PRISMER_TOKENIZER_DIR=str(coco_tree / "tok"))
    env.pop("PALLAS_AXON_POOL_IPS", None)  # else sitecustomize forces the axon TPU backend over JAX_PLATFORMS=cpu
    out = subprocess.run(
        [sys.executable, "-m", "prismer_tpu.cli.train_caption",
         "--config", str(coco_tree / "caption.yaml"),
         "--target_dataset", "coco", "--exp_name", "e2e",
         "--mixed_precision", "fp32",
         "--logging_dir", str(coco_tree / "logging"),
         "--results_dir", str(coco_tree / "results")],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-3000:]

    # results JSON in the reference's byte format
    res = json.load(open(coco_tree / "results" /
                         "caption_results_e2e_coco.json"))
    assert len(res) == 2
    assert {"image_id", "caption"} <= set(res[0])
    assert isinstance(res[0]["image_id"], int)

    # checkpoint with metadata was written
    assert (coco_tree / "logging" / "caption_e2e" / "state").exists()
    # metrics JSONL emitted
    metrics = (coco_tree / "logging" / "caption_e2e" / "metrics.jsonl")
    assert metrics.exists()
    rec = json.loads(metrics.read_text().splitlines()[0])
    assert "CIDEr" in rec and "train_loss" in rec
