"""VQA task head (reference: model/prismer_vqa.py).

  * questions rendered as '<s>' + capitalize(q), tokenized max 35 with no
    auto specials (prismer_vqa.py:18-20).
  * training: [question ; ' Answer</s>'] concatenation, loss only on the
    answer span, per-sample weights (VQA multi-answer weighting)
    (prismer_vqa.py:22-42).
  * generation: beam-3, max = q_len+10, min = q_len+2, length_penalty=-1
    (prismer_vqa.py:44-62).
  * rank inference over the dataset answer list, k_test=128 default
    (prismer_vqa.py:64-113).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prismer_tpu.models.caption import tokenize_answer_list
from prismer_tpu.models.generation import beam_search, rank_answers
from prismer_tpu.models.prismer import Prismer

from prismer_tpu.tokenizer import BPETokenizer

QUESTION_MAX_TOKENS = 35  # prismer_vqa.py:19
GEN_NUM_BEAMS = 3


def render_question(q: str) -> str:
    return "<s>" + q.capitalize()


def tokenize_questions(tokenizer: BPETokenizer, questions: Sequence[str],
                       max_length: int = QUESTION_MAX_TOKENS
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """'<s>' is spelled in the string; add_special_tokens=False
    (prismer_vqa.py:18-20). NOTE: '<s>' must map to the BOS id — the BPE
    vocab contains it as a literal token, so we prepend the id directly."""
    enc = tokenizer([q.capitalize() for q in questions], padding="longest",
                    truncation=True, max_length=max_length - 1,
                    add_special_tokens=False)
    b, l = enc.input_ids.shape
    ids = np.concatenate(
        [np.full((b, 1), tokenizer.bos_token_id, np.int32), enc.input_ids],
        axis=1)
    mask = np.concatenate([np.ones((b, 1), np.int32), enc.attention_mask],
                          axis=1)
    return ids, mask


def vqa_training_batch(tokenizer: BPETokenizer, questions: Sequence[str],
                       answers: Sequence[str]
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side tokenization of [question ; answer] with -100 targets
    (prismer_vqa.py:26-33). Returns (input_ids, attention_mask, targets)."""
    q_ids, q_mask = tokenize_questions(tokenizer, questions)
    a_ids, a_mask = tokenize_answer_list(tokenizer, answers, lowercase=False)
    ids = np.concatenate([q_ids, a_ids], axis=1)
    mask = np.concatenate([q_mask, a_mask], axis=1)
    targets = np.where(ids == tokenizer.pad_token_id, -100, ids)
    targets[:, :q_ids.shape[1]] = -100
    return ids, mask, targets


def vqa_loss(model: Prismer, variables: Dict[str, Any],
             experts: Dict[str, Any], input_ids: jax.Array,
             attention_mask: jax.Array, targets: jax.Array,
             weights: jax.Array, train: bool = True,
             rngs: Optional[Dict[str, jax.Array]] = None):
    """weights * per-sample summed CE, meaned (prismer_vqa.py:35-42)."""
    out = model.apply(variables, experts, input_ids, attention_mask,
                      targets, train=train, rngs=rngs,
                      method=Prismer.forward_loss,
                      mutable=["batch_stats"] if train else False)
    per_sample, updates = out if train else (out, None)
    loss = jnp.mean(weights * per_sample)
    return (loss, updates) if train else loss


def generate_answers(model: Prismer, variables: Dict[str, Any],
                     experts: Dict[str, Any], tokenizer: BPETokenizer,
                     questions: Sequence[str],
                     rngs: Optional[Dict[str, jax.Array]] = None
                     ) -> List[str]:
    """Open-ended generation (prismer_vqa.py:44-62)."""
    ids, mask = tokenize_questions(tokenizer, questions)
    q_len = ids.shape[1]
    enc = model.apply(variables, experts, method=Prismer.encode, rngs=rngs)
    seqs, _ = beam_search(
        model, variables, enc, jnp.asarray(ids), jnp.asarray(mask),
        num_beams=GEN_NUM_BEAMS, max_length=q_len + 10, min_length=q_len + 2,
        length_penalty=-1.0,
        eos_token_id=model.cfg.decoder.eos_token_id,
        pad_token_id=model.cfg.decoder.pad_token_id)
    answers = []
    for row in np.asarray(seqs):
        text = tokenizer.decode(row[q_len:], skip_special_tokens=True)
        answers.append(text.lower().strip())
    return answers


def rank_vqa_answers(model: Prismer, variables: Dict[str, Any],
                     experts: Dict[str, Any], tokenizer: BPETokenizer,
                     questions: Sequence[str], answer_list: Sequence[str],
                     k_test: int = 128,
                     rngs: Optional[Dict[str, jax.Array]] = None
                     ) -> np.ndarray:
    """Answer-list rank inference (prismer_vqa.py:64-113); returns indices
    into answer_list."""
    ids, mask = tokenize_questions(tokenizer, questions)
    ans_ids, ans_mask = tokenize_answer_list(tokenizer, answer_list,
                                             lowercase=False)
    enc = model.apply(variables, experts, method=Prismer.encode, rngs=rngs)
    best = rank_answers(model, variables, enc, jnp.asarray(ids),
                        jnp.asarray(mask), jnp.asarray(ans_ids),
                        jnp.asarray(ans_mask), k_test=k_test,
                        pad_token_id=model.cfg.decoder.pad_token_id)
    return np.asarray(best)
