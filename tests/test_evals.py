"""Metric tests: BLEU vs hand-computed values, CIDEr-D sanity properties,
COCO-eval file-format round trip."""

import json
import math

import numpy as np
import pytest

from prismer_tpu.evals.bleu import corpus_bleu
from prismer_tpu.evals.cider import CiderD, tokenize
from prismer_tpu.evals.coco_eval import coco_caption_eval


def test_tokenize():
    assert tokenize("A man, riding; a horse!") == \
        ["a", "man", "riding", "a", "horse"]


def test_bleu_perfect_match():
    cands = {1: "the cat sat on the mat"}
    refs = {1: ["the cat sat on the mat"]}
    bleu = corpus_bleu(cands, refs)
    for b in bleu:
        assert abs(b - 1.0) < 1e-9


def test_bleu1_hand_computed():
    # cand: "the the cat" vs ref "the cat sat": clipped p1 = (1+1)/3
    cands = {1: "the the cat"}
    refs = {1: ["the cat sat"]}
    bleu = corpus_bleu(cands, refs, max_n=1)
    assert abs(bleu[0] - (2 / 3)) < 1e-9


def test_bleu_brevity_penalty():
    cands = {1: "the cat"}
    refs = {1: ["the cat sat on the mat"]}
    bleu = corpus_bleu(cands, refs, max_n=1)
    want = math.exp(1 - 6 / 2) * 1.0
    assert abs(bleu[0] - want) < 1e-9


def test_cider_identity_beats_mismatch():
    refs = {i: [f"a photo of object {i} on a table"] for i in range(8)}
    perfect = {i: refs[i][0] for i in range(8)}
    wrong = {i: "completely unrelated words here" for i in range(8)}
    c_perfect, _ = CiderD().compute(perfect, refs)
    c_wrong, _ = CiderD().compute(wrong, refs)
    assert c_perfect > c_wrong
    assert c_wrong < 1.0
    assert c_perfect > 3.0


def test_cider_length_penalty():
    refs = {0: ["a cat on a mat"], 1: ["some dog near the door"],
            2: ["green bird in a tree"]}
    close = {0: "a cat on a mat", 1: "some dog near the door",
             2: "green bird in a tree"}
    padded = {0: "a cat on a mat " + "word " * 20,
              1: "some dog near the door", 2: "green bird in a tree"}
    c_close, per = CiderD().compute(close, refs)
    c_padded, per2 = CiderD().compute(padded, refs)
    assert per2[0] < per[0]


def test_coco_eval_format_roundtrip(tmp_path):
    gt = {"annotations": [
        {"image_id": 42, "caption": "A dog running in the park."},
        {"image_id": 42, "caption": "The dog runs through a park."},
        {"image_id": 7, "caption": "A red car parked outside."},
    ], "images": [{"id": 42}, {"id": 7}]}
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    results = [{"image_id": 42, "caption": "A dog running in the park."},
               {"image_id": 7, "caption": "A red car parked outside."}]
    scores = coco_caption_eval(str(gt_path), results)
    assert "CIDEr" in scores and "Bleu_4" in scores
    assert scores["CIDEr"] > 1.0
