"""First non-synthetic end-to-end smoke: expert label generation + caption
demo over the reference's bundled COCO test images (helpers/images, the
reference's de-facto smoke test — demo.py:26-76, README.md:118-124).

Exercises the native JPEG decoder, the label writers, the demo dataset glob,
the joint transform and the caption generate path on real photographic data
(random-init weights — content quality is not asserted, only that every
stage produces well-formed artifacts)."""

import json
import os
import shutil
import subprocess
import sys

import pytest
from PIL import Image

REF_IMAGES = "/root/reference/helpers/images"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_IMAGES),
                                reason="reference checkout not available")

N_IMAGES = 2


@pytest.fixture(scope="module")
def real_tree(tmp_path_factory):
    """helpers/images populated with real COCO JPEGs (copied — the
    reference checkout is read-only and the demo writes captions next to
    the images)."""
    root = tmp_path_factory.mktemp("demo_real")
    img_dir = root / "helpers" / "images"
    img_dir.mkdir(parents=True)
    names = sorted(os.listdir(REF_IMAGES))[:N_IMAGES]
    for n in names:
        shutil.copy(os.path.join(REF_IMAGES, n), img_dir / n)

    from prismer_tpu.tokenizer import synthetic_tokenizer
    tok_dir = root / "tok"
    tok_dir.mkdir()
    tok = synthetic_tokenizer()
    (tok_dir / "vocab.json").write_text(json.dumps(tok.vocab))
    merges = ["#version: 0.2"] + [
        f"{a} {b}" for (a, b), _ in sorted(tok.bpe_ranks.items(),
                                           key=lambda kv: kv[1])]
    (tok_dir / "merges.txt").write_text("\n".join(merges) + "\n")
    return root, names


def _env(root):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
               PRISMER_EXPERT_WEIGHTS=str(root / "no_weights"),
               PRISMER_TOKENIZER_DIR=str(root / "tok"))
    env.pop("PALLAS_AXON_POOL_IPS", None)  # else sitecustomize forces the axon TPU backend over JAX_PLATFORMS=cpu
    return env


def test_expert_generate_and_demo_on_real_images(real_tree):
    root, names = real_tree

    # 1. dense expert (depth) + one id-map expert (seg_coco) label sweeps
    for task, size in (("depth", 224), ("seg_coco", 64)):
        out = subprocess.run(
            [sys.executable, "-m", "prismer_tpu.experts.generate",
             "--task", task, "--data_path", str(root / "helpers"),
             "--save_path", str(root / "helpers" / "labels"),
             "--batch_size", "1", "--image_size", str(size)],
            capture_output=True, text=True, timeout=2400, env=_env(root),
            cwd="/root/repo")
        assert out.returncode == 0, f"{task}: {out.stderr[-3000:]}"
        for n in names:
            label = (root / "helpers" / "labels" / task / "helpers" /
                     "images" / (os.path.splitext(n)[0] + ".png"))
            assert label.exists(), (task, n)
            img = Image.open(label)
            orig = Image.open(root / "helpers" / "images" / n)
            assert img.size == orig.size, (task, n)
            assert img.mode == "L"

    # 2. caption demo over the generated labels (tiny random model)
    cfg = f"""
demo:
  dataset: 'demo'
  data_path: '{root / "helpers"}'
  label_path: '{root / "helpers" / "labels"}'
  experts: ['depth', 'seg_coco']
  image_resolution: 64
  prismer_model: 'prismer_tiny'
  freeze: 'freeze_vision'
  prefix: 'A picture of'
"""
    (root / "demo.yaml").write_text(cfg)
    out = subprocess.run(
        [sys.executable, "-m", "prismer_tpu.cli.demo",
         "--config", str(root / "demo.yaml"), "--exp_name", "smoke",
         "--mixed_precision", "fp32"],
        capture_output=True, text=True, timeout=1800, env=_env(root),
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-3000:]
    for n in names:
        cap = root / "helpers" / "images" / (os.path.splitext(n)[0] + ".txt")
        assert cap.exists(), n
        assert cap.read_text().strip(), n
