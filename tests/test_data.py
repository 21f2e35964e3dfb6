"""Data-pipeline tests: transform semantics, device in-painting vs the
reference's CPU loop, loader behavior, and an end-to-end demo-style dataset
walk over synthetic label files."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from prismer_tpu.data.device import materialize_experts
from prismer_tpu.data.features import FeatureTables, get_feature_tables
from prismer_tpu.data.labels import build_expert_record, load_expert_labels
from prismer_tpu.data.loader import DataLoader, default_collate
from prismer_tpu.data.text import pre_caption, pre_question
from prismer_tpu.data.transform import CLIP_MEAN, CLIP_STD, Transform


def test_feature_tables_shapes():
    t = get_feature_tables()
    assert t.coco.shape == (133, 64)
    assert t.ade.shape == (150, 64)
    assert t.detection.shape == (722, 64)
    assert t.background.shape == (64,)
    seg = t.seg_table("seg_coco")
    assert seg.shape == (256, 64)
    np.testing.assert_array_equal(seg[255], t.background)
    np.testing.assert_array_equal(seg[0], t.coco[0])
    # ids beyond the class count fall back to background
    np.testing.assert_array_equal(seg[200], t.background)


def test_detection_and_ocr_tables():
    t = get_feature_tables()
    det = t.detection_table({"0": 5, "3": 700})
    np.testing.assert_array_equal(det[0], t.detection[5])
    np.testing.assert_array_equal(det[3], t.detection[700])
    np.testing.assert_array_equal(det[1], t.background)

    ocr = t.ocr_table({0: {"features": np.ones(64, np.float32)}})
    np.testing.assert_array_equal(ocr[0], np.ones(64))
    np.testing.assert_array_equal(ocr[255], t.background)
    ocr_none = t.ocr_table(None)
    np.testing.assert_array_equal(ocr_none[7], t.background)


def test_pca_project_formula():
    t = get_feature_tables()
    x = np.random.default_rng(0).standard_normal(768).astype(np.float32)
    want = (x - t.pca_mean) @ t.pca_components.T
    np.testing.assert_allclose(t.pca_project(x), want, rtol=1e-6)
    assert t.pca_project(x).shape == (64,)


def test_transform_eval_shapes_and_normalization():
    img = Image.new("RGB", (500, 375), (124, 116, 104))
    labels = {"depth": Image.new("L", (500, 375), 128),
              "seg_coco": Image.new("L", (500, 375), 7)}
    tf = Transform(resize_resolution=480, train=False)
    out = tf(img, labels)
    assert out["rgb"].shape == (480, 480, 3)
    assert out["depth"].shape == (224, 224, 1)
    assert out["seg_coco"].shape == (224, 224)
    assert out["seg_coco"].dtype == np.uint8
    assert out["seg_coco"][0, 0] == 7
    want = (124 / 255 - CLIP_MEAN[0]) / CLIP_STD[0]
    import prismer_tpu.data.transform as T
    if T.RGB_DEVICE_NORM:
        # default path: raw uint8 out of the transform, CLIP normalization
        # fused into the device materialization
        assert out["rgb"].dtype == np.uint8
        assert out["rgb"][0, 0, 0] == 124
        dev = materialize_experts({"rgb": jnp.asarray(out["rgb"][None])})
        np.testing.assert_allclose(np.asarray(dev["rgb"])[0, 0, 0, 0], want,
                                   atol=1e-5)
    else:
        np.testing.assert_allclose(out["rgb"][0, 0, 0], want, atol=1e-5)


def test_rgb_device_norm_matches_host_norm():
    """uint8-to-device path == the host float path, elementwise."""
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    host = (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    dev = materialize_experts({"rgb": jnp.asarray(u8)})["rgb"]
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-6, atol=1e-6)


def test_transform_train_id_values_preserved():
    """Geometric augs must never interpolate id values — only {ids, fill}."""
    rng = np.random.default_rng(0)
    arr = rng.choice([3, 9, 12], size=(64, 64)).astype(np.uint8)
    img = Image.new("RGB", (64, 64))
    labels = {"seg_coco": Image.fromarray(arr, "L")}
    tf = Transform(resize_resolution=64, train=True)
    for _ in range(5):
        out = tf(img, labels)
        vals = set(np.unique(out["seg_coco"]).tolist())
        assert vals <= {3, 9, 12, 255}


def test_materialize_matches_reference_inpaint_loop():
    """Device gather == the reference's per-unique-label CPU in-paint
    (dataset/utils.py:123-130), on random ids."""
    t = get_feature_tables()
    rng = np.random.default_rng(1)
    ids = rng.choice([0, 5, 40, 255], size=(2, 16, 16)).astype(np.uint8)
    table = np.stack([t.seg_table("seg_coco")] * 2)
    raw = {"rgb": rng.standard_normal((2, 8, 8, 3)).astype(np.float32),
           "seg_coco": {"ids": jnp.asarray(ids), "table": jnp.asarray(table)}}
    out = materialize_experts({k: (v if isinstance(v, dict)
                                   else jnp.asarray(v))
                               for k, v in raw.items()})
    got = np.asarray(out["seg"])  # (2,16,16,64)

    want = np.empty((2, 16, 16, 64), np.float32)
    for b in range(2):
        for l in np.unique(ids[b]):
            src = t.background if l == 255 else t.coco[l]
            want[b][ids[b] == l] = src
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert "seg" in out and "seg_coco" not in out


def test_materialize_obj_detection_structure():
    t = get_feature_tables()
    rng = np.random.default_rng(2)
    ids = rng.choice([1, 255], size=(2, 8, 8)).astype(np.uint8)
    table = np.stack([t.detection_table({"1": 10})] * 2)
    raw = {"obj_detection": {"ids": jnp.asarray(ids),
                             "table": jnp.asarray(table),
                             "instance": jnp.asarray(ids)}}
    out = materialize_experts(raw)
    assert out["obj_detection"]["label"].shape == (2, 8, 8, 64)
    assert out["obj_detection"]["instance"].shape == (2, 8, 8, 1)


def test_pre_caption_and_question():
    assert pre_caption("a man: riding; a horse!!") == "A man riding a horse"
    assert pre_question("what is THIS") == "What is this?"
    assert pre_question("is it red?") == "Is it red?"
    long = " ".join(["word"] * 60)
    assert len(pre_caption(long, max_words=50).split(" ")) == 50


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, np.float32), "caption": f"c{i}"}


def test_loader_batching_shuffle_sharding():
    ds = _ToyDataset(20)
    loader = DataLoader(ds, batch_size=4, train=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 5
    assert batches[0]["x"].shape == (4, 2, 2)
    assert isinstance(batches[0]["caption"], list)

    # deterministic per-epoch shuffle given the seed
    l2 = DataLoader(ds, batch_size=4, train=True, num_workers=2, seed=1)
    b2 = list(l2)
    np.testing.assert_array_equal(batches[0]["x"], b2[0]["x"])

    # sharding partitions the index space disjointly
    s0 = DataLoader(ds, batch_size=2, train=False, shard_id=0, num_shards=2)
    s1 = DataLoader(ds, batch_size=2, train=False, shard_id=1, num_shards=2)
    seen0 = {int(v) for b in s0 for v in b["x"][:, 0, 0]}
    seen1 = {int(v) for b in s1 for v in b["x"][:, 0, 0]}
    assert seen0 | seen1 == set(range(20))
    assert not (seen0 & seen1)


@pytest.fixture
def demo_tree(tmp_path):
    """Synthetic demo-style data tree: helpers/images/*.jpg + labels."""
    img_dir = tmp_path / "helpers" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (60, 80, 3), dtype=np.uint8).astype(np.uint8))
    img.save(img_dir / "demo1.jpg")

    lbl_root = tmp_path / "helpers" / "labels"
    for exp, mode, fill in [("depth", "L", 100), ("normal", "RGB", (1, 2, 3)),
                            ("edge", "L", 30), ("seg_coco", "L", 5),
                            ("obj_detection", "L", 0),
                            ("ocr_detection", "L", 255)]:
        d = lbl_root / exp / "helpers" / "images"
        d.mkdir(parents=True)
        Image.new(mode, (80, 60), fill).save(d / "demo1.png")
    with open(lbl_root / "obj_detection" / "helpers" / "images" /
              "demo1.json", "w") as f:
        json.dump({"0": 17}, f)
    # our npz OCR sidecar format (file handle: keep the .pt extension)
    with open(lbl_root / "ocr_detection" / "helpers" / "images" /
              "demo1.pt", "wb") as f:
        np.savez(f, **{"0": np.ones(64, np.float32)})
    return tmp_path


def test_caption_demo_dataset_end_to_end(demo_tree):
    from prismer_tpu.data.datasets import Caption
    cfg = {"dataset": "demo",
           "data_path": str(demo_tree / "helpers"),
           "label_path": str(demo_tree / "helpers" / "labels"),
           "experts": ["depth", "normal", "seg_coco", "edge",
                       "obj_detection", "ocr_detection"],
           "image_resolution": 64, "prefix": "A picture of"}
    train_ds, test_ds = (Caption(cfg, train=True), Caption(cfg, train=False))
    assert len(test_ds) == 1
    rec = test_ds[0]
    experts = rec["experts"]
    assert experts["rgb"].shape == (64, 64, 3)
    assert experts["depth"].shape == (224, 224, 1)
    assert experts["depth"].min() >= -1.0 and experts["depth"].max() <= 1.0
    assert experts["seg_coco"]["ids"].shape == (224, 224)
    assert experts["seg_coco"]["table"].shape == (256, 64)
    assert experts["obj_detection"]["instance"].shape == (224, 224)
    t = get_feature_tables()
    np.testing.assert_array_equal(
        experts["obj_detection"]["table"][0], t.detection[17])
    np.testing.assert_array_equal(
        experts["ocr_detection"]["table"][0], np.ones(64))

    # batch -> device materialization round trip
    batch = default_collate([rec, rec])
    dev = materialize_experts({
        k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict) else jnp.asarray(v))
        for k, v in batch["experts"].items()})
    assert dev["seg"].shape == (2, 224, 224, 64)
    assert dev["obj_detection"]["label"].shape == (2, 224, 224, 64)


def test_loader_process_workers_match_thread_workers():
    """Forked-process workers produce the same batches as thread workers
    (order, content) — the multi-core scaling path for the input pipeline."""
    from prismer_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 9

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32), "name": f"r{i}"}

    kw = dict(batch_size=4, train=False, num_workers=2)
    thread_batches = list(DataLoader(DS(), worker_type="thread", **kw))
    proc_batches = list(DataLoader(DS(), worker_type="process", **kw))
    assert len(thread_batches) == len(proc_batches) == 3
    for tb, pb in zip(thread_batches, proc_batches):
        np.testing.assert_array_equal(tb["x"], pb["x"])
        assert tb["name"] == pb["name"]


def test_label_cache_roundtrip(tmp_path, monkeypatch):
    """PRISMER_LABEL_CACHE: second open returns identical pixels from the
    .npy cache; a touched (newer) PNG invalidates it."""
    from prismer_tpu.data.labels import _open_label_png
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 130, (32, 48), dtype=np.uint8)
    png = tmp_path / "lbl.png"
    Image.fromarray(arr).save(png)
    monkeypatch.setenv("PRISMER_LABEL_CACHE", str(tmp_path / "cache"))
    a1 = np.asarray(_open_label_png(str(png), "L"))
    # cache file exists now
    import glob
    assert glob.glob(str(tmp_path / "cache" / "**" / "*.npy"),
                     recursive=True)
    a2 = np.asarray(_open_label_png(str(png), "L"))
    np.testing.assert_array_equal(a1, arr)
    np.testing.assert_array_equal(a2, arr)
    # newer PNG invalidates the stale cache entry
    arr2 = rng.integers(0, 130, (32, 48), dtype=np.uint8)
    import time as _t
    _t.sleep(0.01)
    Image.fromarray(arr2).save(png)
    os.utime(png)
    a3 = np.asarray(_open_label_png(str(png), "L"))
    np.testing.assert_array_equal(a3, arr2)


def _random_label_set(rng, w, h):
    labels = {
        "depth": Image.fromarray(
            rng.integers(0, 256, (h, w), dtype=np.uint8), "L"),
        "normal": Image.fromarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB"),
        "edge": Image.fromarray(
            rng.integers(0, 256, (h, w), dtype=np.uint8), "L"),
        "seg_coco": Image.fromarray(
            rng.integers(0, 134, (h, w), dtype=np.uint8), "L"),
        "seg_ade": Image.fromarray(
            rng.integers(0, 151, (h, w), dtype=np.uint8), "L"),
        "obj_detection": Image.fromarray(
            rng.choice([0, 3, 7, 255], (h, w)).astype(np.uint8), "L"),
        "ocr_detection": Image.fromarray(
            rng.choice([0, 1, 255], (h, w)).astype(np.uint8), "L"),
    }
    img = Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
                          "RGB")
    return img, labels


@pytest.mark.parametrize("train,res", [(True, 480), (True, 224),
                                       (False, 480)])
def test_vectorized_label_path_matches_pil_exactly(train, res):
    """The composed-index-grid label path (data/pil_warp.py) is BIT-EXACT vs
    the joint PIL path across the whole op set (crop/resize/flip/shears/
    translates/rotates + photometric RGB ops), same RNG stream."""
    import random as pyrandom

    rng = np.random.default_rng(0)
    tf = Transform(resize_resolution=res, train=train)
    mismatch = []
    for seed in range(40):
        w = int(rng.integers(90, 640))
        h = int(rng.integers(90, 640))
        img, labels = _random_label_set(rng, w, h)
        pyrandom.seed(seed)
        ref = tf._call_pil(img, labels)
        pyrandom.seed(seed)
        got = tf._call_vectorized(img, labels)
        for key in ref:
            if not np.array_equal(ref[key], got[key]):
                mismatch.append((seed, key,
                                 int((ref[key] != got[key]).sum())))
    assert not mismatch, mismatch[:10]


def test_vectorized_path_is_default_and_rng_stream_shared():
    """Transform.__call__ routes matching-size label sets through the
    vectorized path by default, and a full __call__ consumes the same RNG
    stream as the PIL path (next draw identical afterwards)."""
    import random as pyrandom

    import prismer_tpu.data.transform as T

    rng = np.random.default_rng(1)
    img, labels = _random_label_set(rng, 300, 200)
    tf = Transform(resize_resolution=480, train=True)
    assert T.VEC_LABELS
    pyrandom.seed(123)
    tf(img, labels)
    after_default = pyrandom.random()
    pyrandom.seed(123)
    tf._call_pil(img, labels)
    after_pil = pyrandom.random()
    assert after_default == after_pil

    # mismatched label size falls back to the exact PIL path
    bad = dict(labels, depth=labels["depth"].resize((64, 64)))
    pyrandom.seed(7)
    out = tf(img, bad)  # must not raise; PIL semantics apply
    assert out["depth"].shape == (224, 224, 1)


def test_materialize_bf16_matches_f32_then_cast():
    """Materializing expert inputs in the compute dtype (bf16) must be
    BIT-IDENTICAL to f32 materialization followed by the stems' cast —
    the round-5 traffic halving must not move a single value (the table
    gather commutes with the cast; RGB normalization arithmetic stays
    f32 inside materialize_experts and is cast at the end)."""
    rng = np.random.default_rng(3)
    raw = {
        "rgb": jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3),
                                        dtype=np.uint8)),
        "depth": jnp.asarray(
            rng.uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32)),
        "seg_coco": {
            "ids": jnp.asarray(rng.integers(0, 256, (2, 8, 8),
                                            dtype=np.uint8)),
            "table": jnp.asarray(
                rng.standard_normal((2, 256, 64)).astype(np.float32)),
        },
        "obj_detection": {
            "ids": jnp.asarray(rng.integers(0, 256, (2, 8, 8),
                                            dtype=np.uint8)),
            "table": jnp.asarray(
                rng.standard_normal((2, 256, 64)).astype(np.float32)),
            "instance": jnp.asarray(rng.integers(0, 8, (2, 8, 8),
                                                 dtype=np.uint8)),
        },
    }
    out32 = materialize_experts(raw)
    out16 = materialize_experts(raw, jnp.bfloat16)
    for k in ("rgb", "depth", "seg"):
        want = np.asarray(out32[k].astype(jnp.bfloat16))
        got = np.asarray(out16[k])
        assert got.dtype == np.dtype("bfloat16") or got.dtype.name == "bfloat16"
        np.testing.assert_array_equal(
            got.view(np.uint16), want.view(np.uint16), err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(out16["obj_detection"]["label"]).view(np.uint16),
        np.asarray(out32["obj_detection"]["label"].astype(
            jnp.bfloat16)).view(np.uint16))
    # instance ids must remain untouched integers
    assert out16["obj_detection"]["instance"].dtype == jnp.uint8
