"""Tokenizer parity vs HF RobertaTokenizer built from the same local files.

No hub access needed: we write our synthetic vocab/merges to disk and load
them into the HF *slow* RobertaTokenizer, then require exact agreement —
which transfers to the real roberta-base files at deployment time."""

import json

import numpy as np
import pytest

from prismer_tpu.tokenizer import BPETokenizer, synthetic_tokenizer

TEXTS = [
    "A picture of a cat sitting on the mat",
    "the theatre opened.",
    "  leading spaces and   runs",
    "numbers 123 and punctuation!?",
    "",
    "don't stop",
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tok = synthetic_tokenizer()
    d = tmp_path_factory.mktemp("tok")
    vocab_file = d / "vocab.json"
    merges_file = d / "merges.txt"
    vocab_file.write_text(json.dumps(tok.vocab), encoding="utf-8")
    lines = ["#version: 0.2"] + [f"{a} {b}" for (a, b), _ in
                                 sorted(tok.bpe_ranks.items(),
                                        key=lambda kv: kv[1])]
    merges_file.write_text("\n".join(lines) + "\n", encoding="utf-8")

    from transformers import RobertaTokenizer
    hf = RobertaTokenizer(str(vocab_file), str(merges_file))
    return tok, hf


@pytest.mark.parametrize("text", TEXTS)
def test_encode_matches_hf(pair, text):
    tok, hf = pair
    assert tok.encode(text) == hf(text)["input_ids"]


@pytest.mark.parametrize("text", TEXTS)
def test_encode_no_specials_matches_hf(pair, text):
    tok, hf = pair
    assert tok.encode(text, add_special_tokens=False) == \
        hf(text, add_special_tokens=False)["input_ids"]


def test_batch_padding_longest(pair):
    tok, hf = pair
    enc = tok(TEXTS[:4], padding="longest")
    want = hf(TEXTS[:4], padding="longest")
    np.testing.assert_array_equal(enc.input_ids, np.asarray(want["input_ids"]))
    np.testing.assert_array_equal(enc.attention_mask,
                                  np.asarray(want["attention_mask"]))


def test_batch_truncation(pair):
    tok, hf = pair
    enc = tok(TEXTS[:4], padding="longest", truncation=True, max_length=6)
    want = hf(TEXTS[:4], padding="longest", truncation=True, max_length=6)
    np.testing.assert_array_equal(enc.input_ids, np.asarray(want["input_ids"]))


def test_max_length_padding(pair):
    tok, hf = pair
    enc = tok(TEXTS[:2], padding="max_length", max_length=16, truncation=True)
    want = hf(TEXTS[:2], padding="max_length", max_length=16, truncation=True)
    np.testing.assert_array_equal(enc.input_ids, np.asarray(want["input_ids"]))
    assert enc.input_ids.shape == (2, 16)


def test_decode_roundtrip(pair):
    tok, hf = pair
    for text in TEXTS:
        ids = tok.encode(text)
        assert tok.decode(ids) == hf.decode(ids, skip_special_tokens=True)


@pytest.mark.parametrize("text", ["<s>Is it red?", " cat</s>",
                                  "a <mask> b", "<s>x</s>"])
def test_inline_special_tokens_match_hf(pair, text):
    """The task heads spell specials inline ('<s>'+question, ' ans</s>') —
    they must map to the special ids exactly like HF (prismer_vqa.py:18,26)."""
    tok, hf = pair
    assert tok.encode(text, add_special_tokens=False) == \
        hf(text, add_special_tokens=False)["input_ids"]


def test_specials():
    tok = synthetic_tokenizer()
    assert tok.bos_token_id == 0
    assert tok.pad_token_id == 1
    assert tok.eos_token_id == 2
