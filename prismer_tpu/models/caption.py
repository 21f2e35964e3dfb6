"""Captioning task head (reference: model/prismer_caption.py).

Host-side text handling (tokenize / detokenize, prefix bookkeeping) wraps
pure jitted device functions:

  * training loss (prismer_caption.py:18-34): captions tokenized to max 30
    tokens, pad + prefix positions masked to -100, mean of per-sample summed
    label-smoothed CE.
  * generation (prismer_caption.py:36-57): beam-3, max_length 20 /
    min_length 8, prefix stripped from the decoded string.
  * rank inference (prismer_caption.py:59-112): candidates ' <ans></s>'
    lowercased, k_test=32 default.

Unlike the reference (which re-tokenizes inside the train loop every step),
tokenization lives in the data pipeline; these helpers also expose
string-level convenience wrappers for demo/eval parity.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prismer_tpu.models.generation import beam_search, rank_answers
from prismer_tpu.models.prismer import Prismer, compute_dtype

from prismer_tpu.tokenizer import BPETokenizer

CAPTION_MAX_TOKENS = 30  # prismer_caption.py:21
GEN_NUM_BEAMS = 3        # prismer_caption.py:42
GEN_MAX_LENGTH = 20      # prismer_caption.py:49
GEN_MIN_LENGTH = 8       # prismer_caption.py:50


def prefix_prompt_ids(tokenizer: BPETokenizer, prefix: str, batch: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenized prefix with the trailing </s> removed
    (prismer_caption.py:38-40); broadcast to the batch."""
    enc = tokenizer([prefix], padding="longest")
    ids = enc.input_ids[:, :-1]
    mask = enc.attention_mask[:, :-1]
    return (np.repeat(ids, batch, axis=0), np.repeat(mask, batch, axis=0))


def prefix_length(tokenizer: BPETokenizer, prefix: str) -> int:
    """Number of caption positions covered by the prefix (loss-masked);
    len(tokenize(prefix)) - 1 drops the </s> (prismer_caption.py:25)."""
    if not prefix:
        return 0
    return len(tokenizer.encode(prefix)) - 1


def caption_targets(input_ids: jax.Array, attention_mask: jax.Array,
                    prompt_len: int, pad_token_id: int) -> jax.Array:
    """-100-masked labels: pads and the first `prompt_len` positions
    (prismer_caption.py:22-26)."""
    targets = jnp.where(input_ids == pad_token_id, -100, input_ids)
    if prompt_len > 0:
        targets = targets.at[:, :prompt_len].set(-100)
    return targets


def caption_loss(model: Prismer, variables: Dict[str, Any],
                 experts: Dict[str, Any], input_ids: jax.Array,
                 attention_mask: jax.Array, prompt_len: int,
                 train: bool = True,
                 rngs: Optional[Dict[str, jax.Array]] = None,
                 weights: Optional[jax.Array] = None):
    """Mean over batch of per-sample summed CE (prismer_caption.py:28-34).

    In train mode returns (loss, batch_stats_updates) — conv-stem BatchNorm
    running stats are functional state threaded by the train step."""
    cfg = model.cfg.decoder
    targets = caption_targets(input_ids, attention_mask, prompt_len,
                              cfg.pad_token_id)
    out = model.apply(variables, experts, input_ids, attention_mask,
                      targets, train=train, rngs=rngs,
                      method=Prismer.forward_loss,
                      mutable=["batch_stats"] if train else False)
    per_sample, updates = out if train else (out, None)
    if weights is not None:
        per_sample = per_sample * weights
    loss = jnp.mean(per_sample)
    return (loss, updates) if train else loss


def build_generate_fn(model: Prismer, *, num_beams: int = GEN_NUM_BEAMS,
                      max_length: int = GEN_MAX_LENGTH,
                      min_length: int = GEN_MIN_LENGTH,
                      length_penalty: float = 1.0):
    """One jitted encode+beam-search pipeline over raw (id-map) expert
    batches — compiled once, reused every eval batch."""
    import jax as _jax
    from prismer_tpu.data.device import materialize_experts

    @_jax.jit
    def fn(variables, experts_raw, prompt_ids, prompt_mask):
        experts = materialize_experts(experts_raw, compute_dtype(model.cfg))
        enc = model.apply(variables, experts, method=Prismer.encode)
        seqs, scores = beam_search(
            model, variables, enc, prompt_ids, prompt_mask,
            num_beams=num_beams, max_length=max_length,
            min_length=min_length, length_penalty=length_penalty,
            eos_token_id=model.cfg.decoder.eos_token_id,
            pad_token_id=model.cfg.decoder.pad_token_id)
        return seqs

    return fn


def build_sharded_generate_fn(model: Prismer, mesh, *,
                              num_beams: int = GEN_NUM_BEAMS,
                              max_length: int = GEN_MAX_LENGTH,
                              min_length: int = GEN_MIN_LENGTH,
                              length_penalty: float = 1.0):
    """Data-parallel serving generate over a device mesh via shard_map.

    GSPMD partitions the XLA decode path fine (tests/test_parallel_
    generation.py), but the fused whole-step decode kernel
    (ops/fused_decode.py) is a pallas_call, which GSPMD cannot split:
    shard_map hands each device its local batch rows and runs the identical
    single-chip program per shard. No collectives are needed anywhere in
    the loop — a sample's beams attend only that sample's encoder states,
    so the computation is embarrassingly parallel over the 'data' axis.
    The global batch must divide mesh.shape['data']. Variables (including
    an optional `packed_decode` collection from prepare_serving_variables)
    are replicated."""
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    from prismer_tpu.data.device import materialize_experts

    def local(variables, experts_raw, prompt_ids, prompt_mask):
        experts = materialize_experts(experts_raw, compute_dtype(model.cfg))
        enc = model.apply(variables, experts, method=Prismer.encode)
        seqs, _ = beam_search(
            model, variables, enc, prompt_ids, prompt_mask,
            num_beams=num_beams, max_length=max_length,
            min_length=min_length, length_penalty=length_penalty,
            eos_token_id=model.cfg.decoder.eos_token_id,
            pad_token_id=model.cfg.decoder.pad_token_id)
        return seqs

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which the vma checker (jax>=0.8) rejects; the manual
    # specs above are the full contract (everything per-shard except the
    # replicated variables)
    sharded = _jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False)
    return _jax.jit(sharded)


def build_rank_fn(model: Prismer, *, k_test: int):
    """Jitted encode + two-pass rank inference over raw expert batches."""
    import jax as _jax
    from prismer_tpu.data.device import materialize_experts

    @_jax.jit
    def fn(variables, experts_raw, prompt_ids, prompt_mask, answer_ids,
           answer_mask):
        experts = materialize_experts(experts_raw, compute_dtype(model.cfg))
        enc = model.apply(variables, experts, method=Prismer.encode)
        return rank_answers(
            model, variables, enc, prompt_ids, prompt_mask, answer_ids,
            answer_mask, k_test=k_test,
            pad_token_id=model.cfg.decoder.pad_token_id)

    return fn


def generate_captions(model: Prismer, variables: Dict[str, Any],
                      experts: Dict[str, Any], tokenizer: BPETokenizer,
                      prefix: str = "",
                      rngs: Optional[Dict[str, jax.Array]] = None
                      ) -> List[str]:
    """String-level generation wrapper (prismer_caption.py:36-57)."""
    batch = experts["rgb"].shape[0]
    ids, mask = prefix_prompt_ids(tokenizer, prefix, batch)
    enc = model.apply(variables, experts, method=Prismer.encode, rngs=rngs)
    seqs, _ = beam_search(
        model, variables, enc, jnp.asarray(ids), jnp.asarray(mask),
        num_beams=GEN_NUM_BEAMS, max_length=GEN_MAX_LENGTH,
        min_length=GEN_MIN_LENGTH, length_penalty=1.0,
        eos_token_id=model.cfg.decoder.eos_token_id,
        pad_token_id=model.cfg.decoder.pad_token_id)
    return decode_captions(np.asarray(seqs), tokenizer, prefix)


def decode_captions(seqs: np.ndarray, tokenizer: BPETokenizer,
                    prefix: str) -> List[str]:
    """Decode + strip prefix (prismer_caption.py:52-57)."""
    captions = []
    space = 1 if len(prefix) > 0 else 0
    for row in seqs:
        text = tokenizer.decode(row, skip_special_tokens=True)
        captions.append(text[len(prefix) + space:])
    return captions


def tokenize_answer_list(tokenizer: BPETokenizer, answers: Sequence[str],
                         lowercase: bool = True
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Candidate answers as ' <ans></s>' (prismer_caption.py:64) or
    ' <Ans></s>' capitalized for VQA (prismer_vqa.py:26)."""
    if lowercase:
        texts = [" " + a.lower() + tokenizer.eos_token for a in answers]
    else:
        texts = [" " + a.capitalize() + tokenizer.eos_token for a in answers]
    enc = tokenizer(texts, padding="longest", add_special_tokens=False)
    return enc.input_ids, enc.attention_mask


def rank_captions(model: Prismer, variables: Dict[str, Any],
                  experts: Dict[str, Any], tokenizer: BPETokenizer,
                  answers: Sequence[str], prefix: str = "",
                  k_test: int = 32,
                  rngs: Optional[Dict[str, jax.Array]] = None) -> np.ndarray:
    """Classification-style rank inference (prismer_caption.py:59-112)."""
    batch = experts["rgb"].shape[0]
    ans_ids, ans_mask = tokenize_answer_list(tokenizer, answers, lowercase=True)
    ids, mask = prefix_prompt_ids(tokenizer, prefix, batch)
    enc = model.apply(variables, experts, method=Prismer.encode, rngs=rngs)
    best = rank_answers(model, variables, enc, jnp.asarray(ids),
                        jnp.asarray(mask), jnp.asarray(ans_ids),
                        jnp.asarray(ans_mask), k_test=k_test,
                        pad_token_id=model.cfg.decoder.pad_token_id)
    return np.asarray(best)
