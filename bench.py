"""Benchmark: Prismer-BASE COCO-captioning inference throughput (images/sec/chip).

Measures the full captioning path of the flagship config — 6-expert fusion,
480px RGB, bf16, beam-3 / max-20 generation (the reference's eval setting,
prismer_caption.py:42-50) — end to end on one chip.

`vs_baseline` is measured, not assumed: the baseline is the *reference's
decode algorithm* (no KV cache — the full decoder re-runs over the whole
growing sequence every beam-search step, exactly the compute pattern of
model/modules/roberta.py generate, which has no past_key_values path)
implemented with the same JAX modules and jitted per step-length on the same
chip. The headline number is our KV-cached, fully-jitted pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import argparse
import json
import time

import numpy as np


def build(model_scale: str, batch: int, quick: bool):
    import jax
    import jax.numpy as jnp

    from prismer_tpu.config import build_prismer_config, tiny_test_config
    from prismer_tpu.models.prismer import Prismer

    if quick:
        task_cfg = tiny_test_config(
            experts=["depth", "seg_coco", "obj_detection"], image_resolution=64)
        task_cfg["dtype"] = "float32"
    else:
        task_cfg = {
            "experts": ["depth", "normal", "seg_coco", "edge",
                        "obj_detection", "ocr_detection"],
            "image_resolution": 480,
            "prismer_model": model_scale,
            "freeze": "freeze_vision",
            "dtype": "bfloat16",
        }
    cfg = build_prismer_config(task_cfg)
    model = Prismer(cfg)

    rng = np.random.default_rng(0)
    from __graft_entry__ import _expert_batch
    experts = jax.tree.map(jnp.asarray, _expert_batch(rng, cfg.vision, batch))

    # 'A picture of' prefix: 4 prompt tokens after dropping </s>
    prompt = np.tile(np.array([[0, 250, 1202, 9]], np.int32), (batch, 1))
    prompt = np.clip(prompt, 0, cfg.decoder.vocab_size - 1)
    mask = np.ones_like(prompt)

    variables = model.init(
        {"params": jax.random.key(0), "instance": jax.random.key(1)},
        experts, jnp.asarray(prompt), jnp.asarray(mask))
    return model, cfg, variables, experts, prompt, mask


def bench_cached(model, cfg, variables, experts, prompt, mask, max_length,
                 repeats=3):
    import jax
    import jax.numpy as jnp

    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer

    @jax.jit
    def run(variables, experts, prompt, mask):
        enc = model.apply(variables, experts, method=Prismer.encode)
        seqs, _ = beam_search(
            model, variables, enc, prompt, mask, num_beams=3,
            max_length=max_length, min_length=min(8, max_length - 1),
            length_penalty=1.0, eos_token_id=cfg.decoder.eos_token_id,
            pad_token_id=cfg.decoder.pad_token_id)
        return seqs

    args = (variables, experts, jnp.asarray(prompt), jnp.asarray(mask))
    run(*args)[0].block_until_ready()  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(*args).block_until_ready()
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_reference_pattern(model, cfg, variables, experts, prompt, mask,
                            max_length, repeats=2):
    """The reference's cache-less decode: greedy stand-in for beam scoring
    cost — each step re-runs the FULL decoder over the beam-tiled, grown
    sequence (beams=3), plus the encoder once. Jitted per sequence length
    (the kindest possible rendition of the reference pattern on TPU)."""
    import jax
    import jax.numpy as jnp

    from prismer_tpu.models.prismer import Prismer

    num_beams = 3
    b, p = prompt.shape
    enc_fn = jax.jit(lambda v, e: model.apply(v, e, method=Prismer.encode))
    dec_fn = jax.jit(lambda v, ids, m, enc: model.apply(
        v, ids, m, enc, method=Prismer.decode_logits))

    enc = enc_fn(variables, experts)
    enc.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(repeats):
        enc_fn(variables, experts).block_until_ready()
    t_enc = (time.perf_counter() - t0) / repeats

    enc_t = jnp.repeat(enc, num_beams, axis=0)

    def time_full_fwd(seq_len):
        """One cache-less full-decoder forward at this sequence length,
        beam-tiled (the per-step cost of the reference's generate)."""
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(
            4, cfg.decoder.vocab_size,
            (b * num_beams, seq_len)).astype(np.int32))
        m = jnp.ones_like(ids)
        dec_fn(variables, ids, m, enc_t).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(repeats):
            dec_fn(variables, ids, m, enc_t).block_until_ready()
        return (time.perf_counter() - t0) / repeats

    # sample 3 lengths, linearly interpolate the per-step cost over the
    # decode trajectory t = p .. max_length-1 (sequence grows by 1 per step)
    sample_lens = sorted({p + 1, (p + max_length) // 2, max_length})
    costs = {L: time_full_fwd(L) for L in sample_lens}

    def interp(L):
        ls = sample_lens
        if L <= ls[0]:
            return costs[ls[0]]
        for lo, hi in zip(ls, ls[1:]):
            if L <= hi:
                w = (L - lo) / (hi - lo)
                return costs[lo] * (1 - w) + costs[hi] * w
        return costs[ls[-1]]

    total_decode = sum(interp(t + 1) for t in range(p, max_length))
    return t_enc + total_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--model", default="prismer_base")
    ap.add_argument("--quick", action="store_true",
                    help="tiny config (CPU-friendly smoke run)")
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    max_length = 10 if args.quick else 20
    model, cfg, variables, experts, prompt, mask = build(
        args.model, args.batch, args.quick)

    t_cached = bench_cached(model, cfg, variables, experts, prompt, mask,
                            max_length)
    ips = args.batch / t_cached

    if args.skip_baseline:
        vs = float("nan")
    else:
        t_ref = bench_reference_pattern(model, cfg, variables, experts,
                                        prompt, mask, max_length)
        vs = t_ref / t_cached  # speedup over the reference decode pattern

    print(json.dumps({
        "metric": "prismer_base_caption_beam3_480px_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 3) if vs == vs else None,
    }))


if __name__ == "__main__":
    main()
