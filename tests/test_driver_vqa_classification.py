"""VQA / classification / pretrain driver integration tests — each driver
runs train + (rank-)eval end to end in a subprocess over a synthetic data
tree with a tiny PrismerZ, mirroring tests/test_driver_end_to_end.py for
the caption driver (reference drivers: train_vqa.py, train_classification.py,
train_pretrain.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from prismer_tpu.tokenizer import synthetic_tokenizer

TINY = """
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
"""


def _strip(block: str) -> str:
    return "\n".join(line[2:] for line in block.strip("\n").splitlines())


def _write_tokenizer(root):
    tok_dir = root / "tok"
    tok_dir.mkdir()
    tok = synthetic_tokenizer()
    (tok_dir / "vocab.json").write_text(json.dumps(tok.vocab))
    merges = ["#version: 0.2"] + [
        f"{a} {b}" for (a, b), _ in sorted(tok.bpe_ranks.items(),
                                           key=lambda kv: kv[1])]
    (tok_dir / "merges.txt").write_text("\n".join(merges) + "\n")
    return tok_dir


def _run(module, cfg_path, root, extra=()):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH="/root/repo",
               PRISMER_TOKENIZER_DIR=str(root / "tok"))
    env.pop("PALLAS_AXON_POOL_IPS", None)  # else sitecustomize forces the axon TPU backend over JAX_PLATFORMS=cpu
    return subprocess.run(
        [sys.executable, "-m", f"prismer_tpu.cli.{module}",
         "--config", str(cfg_path), "--exp_name", "e2e",
         "--mixed_precision", "fp32",
         "--logging_dir", str(root / "logging"),
         "--results_dir", str(root / "results"), *extra],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd="/root/repo")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_train_vqa_driver_end_to_end(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("vqa")
    data = root / "data"
    (data / "vqav2" / "images").mkdir(parents=True)
    _write_tokenizer(root)

    train_list, test_list = [], []
    answers = ["toy", "car", "dog", "tree"]
    for i in range(4):
        name = f"images/vqa_{i:03d}.jpg"
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(data / "vqav2" / name)
        train_list.append({"dataset": "vqa", "image": name,
                           "question": f"what is object {i}?",
                           "answer": answers[i], "weight": 1.0})
        if i < 2:
            test_list.append({"dataset": "vqa", "image": name,
                              "question": f"what is object {i}?",
                              "question_id": 1000 + i})
    (data / "vqav2_train_val.json").write_text(json.dumps(train_list))
    (data / "vqav2_test.json").write_text(json.dumps(test_list))
    (data / "answer_list.json").write_text(json.dumps(answers))

    cfg = (f"datasets: ['vqav2']\n"
           f"data_path: '{data}'\nlabel_path: '{data}/labels'\n"
           f"k_test: 2\ninference: 'rank'\n" + _strip(TINY))
    (root / "vqa.yaml").write_text(cfg)

    out = _run("train_vqa", root / "vqa.yaml", root)
    assert out.returncode == 0, out.stderr[-3000:]

    # results in the reference's EvalAI format (train_vqa.py:173)
    res = json.load(open(root / "results" / "vqa_results_e2e.json"))
    assert len(res) == 2
    assert {"question_id", "answer"} <= set(res[0])
    assert res[0]["answer"] in answers
    assert (root / "logging" / "vqa_e2e" / "state").exists()


def test_train_classification_driver_end_to_end(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("cls")
    data = root / "data"
    _write_tokenizer(root)

    classes = ["goldfish", "hammer"]
    for split in ("imagenet_train", "imagenet"):
        for c in classes:
            d = data / split / c
            d.mkdir(parents=True)
            for j in range(2):
                Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                             dtype=np.uint8)
                                ).save(d / f"{c}_{j}.JPEG")
    (data / "imagenet" / "imagenet_answer.json").write_text(
        json.dumps(classes))
    (data / "imagenet" / "imagenet_class.json").write_text(
        json.dumps({c: i for i, c in enumerate(classes)}))

    cfg = (f"data_path: '{data}'\nlabel_path: '{data}/labels'\n"
           f"dataset: 'imagenet'\nshots: 1\nk_test: 2\n"
           f"prefix: 'a photo of'\n" + _strip(TINY))
    (root / "classification.yaml").write_text(cfg)

    out = _run("train_classification", root / "classification.yaml", root)
    assert out.returncode == 0, out.stderr[-3000:]
    # in-loop accuracy printed (train_classification.py:147-150)
    assert "acc" in out.stdout.lower(), out.stdout[-1500:]
    assert (root / "logging" / "classification_e2e" / "state").exists()


def test_train_pretrain_driver_end_to_end(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("pretrain")
    data = root / "data"
    (data / "vqav2" / "images").mkdir(parents=True)
    _write_tokenizer(root)

    train_list = []
    for i in range(4):
        name = f"images/COCO_train2014_{i:012d}.jpg"
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(data / "vqav2" / name)
        train_list.append({"image": name, "caption": f"pretrain object {i}"})
    (data / "coco_karpathy_train.json").write_text(json.dumps(train_list))

    cfg = (f"datasets: ['coco']\ncoco_data_path: '{data}'\n"
           f"label_path: '{data}/labels'\n"
           f"warmup_lr: 1.0e-6\nwarmup_steps: 2\n" + _strip(TINY))
    (root / "pretrain.yaml").write_text(cfg)

    out = _run("train_pretrain", root / "pretrain.yaml", root)
    assert out.returncode == 0, out.stderr[-3000:]
    assert (root / "logging" / "pretrain_e2e" / "state").exists()
