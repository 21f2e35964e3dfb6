"""Driver-level integration test: tiny model + synthetic demo data tree,
one training step and a full generation eval through the CLI helpers."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from prismer_tpu.config import PrismerConfig, build_prismer_config
from prismer_tpu.models.prismer import Prismer
from prismer_tpu.tokenizer import synthetic_tokenizer
from prismer_tpu.train import TrainState, build_train_step, freeze_labels, \
    make_optimizer


@pytest.fixture(scope="module")
def demo_tree(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("demo")
    img_dir = tmp_path / "helpers" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ("a.jpg", "b.jpg"):
        Image.fromarray(rng.integers(0, 255, (60, 80, 3),
                                     dtype=np.uint8).astype(np.uint8)
                        ).save(img_dir / name)
        stem = name.split(".")[0]
    lbl_root = tmp_path / "helpers" / "labels"
    for exp, mode, fill in [("depth", "L", 100), ("seg_coco", "L", 5),
                            ("obj_detection", "L", 0)]:
        d = lbl_root / exp / "helpers" / "images"
        d.mkdir(parents=True)
        for name in ("a.png", "b.png"):
            Image.new(mode, (80, 60), fill).save(d / name)
    for name in ("a.json", "b.json"):
        with open(lbl_root / "obj_detection" / "helpers" / "images" / name,
                  "w") as f:
            json.dump({"0": 17}, f)
    return tmp_path


def test_caption_driver_roundtrip(demo_tree):
    from prismer_tpu.cli import common
    from prismer_tpu.cli.train_caption import prepare_train_batch
    from prismer_tpu.data import create_dataset, create_loader
    from prismer_tpu.models import caption as caption_head

    task_cfg = {
        "dataset": "demo",
        "data_path": str(demo_tree / "helpers"),
        "label_path": str(demo_tree / "helpers" / "labels"),
        "experts": ["depth", "seg_coco", "obj_detection"],
        "image_resolution": 64,
        "prismer_model": "prismer_tiny",
        "freeze": "freeze_vision",
        "prefix": "A picture of",
        "dtype": "float32",
    }
    cfg = build_prismer_config(task_cfg)
    model = Prismer(cfg)
    tokenizer = synthetic_tokenizer()

    _, test_ds = create_dataset("caption", task_cfg)
    # demo has no train list; fabricate one from test entries with captions
    test_ds_train = create_dataset("caption", task_cfg)[1]
    test_ds_train.train = True
    test_ds_train.data_list = [
        dict(d, caption="a toy caption") for d in test_ds_train.data_list]
    loader = create_loader(test_ds_train, batch_size=2, num_workers=2,
                           train=True)
    test_loader = create_loader(test_ds, batch_size=2, num_workers=2,
                                train=False)

    variables = common.init_model_variables(model, cfg)
    labels = freeze_labels(variables["params"], cfg.freeze)
    tx = make_optimizer(lambda s: 1e-4, 0.05, variables["params"], cfg.freeze)
    state = TrainState.create(variables["params"], tx,
                              batch_stats=variables["batch_stats"],
                              rng=jax.random.key(0))
    step_fn = build_train_step(model, tx, freeze_tree=labels, donate=False)

    prompt_len = caption_head.prefix_length(tokenizer, task_cfg["prefix"])
    for batch in loader:
        dev = prepare_train_batch(batch, tokenizer, prompt_len,
                                  cfg.decoder.pad_token_id)
        state, metrics = step_fn(state, dev)
        assert np.isfinite(float(metrics["loss"]))

    # generation eval (synthetic tokenizer is near-char-level, so the
    # prefix prompt is long — size max_length off the actual prompt)
    p_len = caption_head.prefix_prompt_ids(
        tokenizer, task_cfg["prefix"], 1)[0].shape[1]
    gen_fn = caption_head.build_generate_fn(
        model, max_length=p_len + 6, min_length=p_len + 2)
    for batch in test_loader:
        b = len(batch["index"])
        ids, mask = caption_head.prefix_prompt_ids(
            tokenizer, task_cfg["prefix"], b)
        seqs = gen_fn(state.variables,
                      common.experts_to_device(batch["experts"]),
                      jnp.asarray(ids), jnp.asarray(mask))
        caps = caption_head.decode_captions(np.asarray(seqs), tokenizer,
                                            task_cfg["prefix"])
        assert len(caps) == b
        for c in caps:
            assert isinstance(c, str)


@pytest.mark.parametrize("module", [
    "prismer_tpu.cli.train_caption", "prismer_tpu.cli.train_vqa",
    "prismer_tpu.cli.train_pretrain",
    "prismer_tpu.cli.train_classification", "prismer_tpu.cli.demo"])
def test_cli_help(module):
    out = subprocess.run([sys.executable, "-m", module, "--help"],
                         capture_output=True, text=True, timeout=120,
                         env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                              "PYTHONPATH": "/root/repo"})
    assert out.returncode == 0, out.stderr[-500:]
    assert "--exp_name" in out.stdout
