"""Decompose the decode loop's per-step cost by ablating one component at a
time (monkeypatched to an identity of the right shape) and re-timing the full
caption pipeline on the chip.

Variants:
  base      unmodified pipeline
  nocross   beam-grouped cross-attention -> identity (keeps out-proj)
  noself    cached self-attention (attend_t) -> identity (keeps q/kv proj +
            cache write)
  nolmhead  LM head -> pad(hidden) to vocab (removes the 768xV matmul)
  notopk    lax.top_k AND generation.exact_top_k -> static slice (bounds
            the full candidate-selection cost incl. the 150k-wide argmax
            top-k; changes selection semantics, shapes stay legal)
  nolayers  DecoderLayer.decode_attend -> identity (keeps embeddings,
            per-layer step-KV projection + cache writes, LM head, beam
            bookkeeping, loop structure — bounds the loop overhead floor)

History (b32; NOTE this tool's experts are FIXED inputs, so the encoder
is hoisted out of the scan — deltas isolate decode, absolute ms/iter
include ~1/iters of the encoder):
  2026-08-16 pre-restructure (decode ~97 ms): nocross share 67.0,
  noself 51.0, nolmhead 3.6 — shares overlap (sum > decode total);
  measured via the then-live `attend` path.
  2026-08-17 post flash/top-k fixes (decode 74.9 ms by
  tools/profile_pipeline.py): base 121.9 ms/iter, notopk share 9.9
  (exact_top_k correctly patched), nolayers share 72.1 — the 13
  decode_attend layer bodies are 72 ms vs a ~30 ms cross-KV+weights
  traffic floor; that ~40 ms is the round-3 fused whole-step kernel's
  budget (ops/decode_attention.py design notes).

The difference base - variant bounds that component's share of decode time
(prefill is mildly affected too; it is ~7% of the total).

NOTE: the ablation monkeypatches target the XLA per-op decode path. When the
fused whole-step kernel is active (PRISMER_DECODE_FUSED, models/roberta.py),
nocross/noself/nolayers have no effect on the decode loop — run this tool
with PRISMER_DECODE_FUSED=off.

Usage: python tools/profile_decode_parts.py [--batch 32] [--variants ...]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from bench import device_experts, init_variables, make_model, timed_value


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--min_length", type=int, default=20,
                    help="min_length == max_length pins the while-loop trip "
                         "count so every ablated variant runs all 16 steps")
    ap.add_argument("--variants", nargs="+",
                    default=["base", "nocross", "noself", "nolmhead",
                             "notopk"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/prismer_tpu_jax_cache")

    from prismer_tpu.models import generation as gen
    from prismer_tpu.models import roberta as rb
    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer

    model, cfg = make_model("prismer_base", False)
    batch = args.batch
    # bench.py-matching serving config (bf16 params + packed decode
    # collection) — an fp32/non-serving run is NOT comparable to the
    # headline (decode-only measured 176 vs ~63 ms at b24)
    variables = init_variables(model, cfg, batch, "bfloat16")
    from prismer_tpu.models.prismer import prepare_serving_variables
    variables = prepare_serving_variables(model, variables)

    @jax.jit
    def make_inputs(seed):
        return device_experts(cfg, jax.random.key(seed), batch)

    experts_fixed = jax.tree.map(lambda x: x, make_inputs(jnp.int32(42)))

    orig_grouped = rb.SelfAttentionCore.attend_grouped
    orig_attend_t = rb.SelfAttentionCore.attend_t
    orig_lmhead = rb.LMHead.__call__
    orig_topk = jax.lax.top_k
    orig_exact_topk = gen.exact_top_k
    orig_lazy = gen.lazy_top_candidates
    orig_decode_attend = rb.DecoderLayer.decode_attend

    def patch(variant):
        rb.SelfAttentionCore.attend_grouped = orig_grouped
        rb.SelfAttentionCore.attend_t = orig_attend_t
        rb.LMHead.__call__ = orig_lmhead
        jax.lax.top_k = orig_topk
        gen.exact_top_k = orig_exact_topk
        gen.lazy_top_candidates = orig_lazy
        rb.DecoderLayer.decode_attend = orig_decode_attend
        if variant == "nolayers":
            rb.DecoderLayer.decode_attend = (
                lambda self, hidden, kt, v, bias, ckt, cv, beams=1: hidden)
        elif variant == "nocross":
            rb.SelfAttentionCore.attend_grouped = (
                lambda self, hidden, k, v, beams: hidden)
        elif variant == "noself":
            rb.SelfAttentionCore.attend_t = (
                lambda self, hidden, kt, v, bias: hidden)
        elif variant == "notopk":
            def fake_topk(x, kk):
                vals = jax.lax.slice_in_dim(x, 0, kk, axis=-1)
                idx = jnp.broadcast_to(jnp.arange(kk, dtype=jnp.int32),
                                       vals.shape)
                return vals, idx
            def fake_lazy(logits, alive, kk, eos, mask_eos, block=1024):
                b, k, v = logits.shape
                vals = jax.lax.slice_in_dim(
                    logits[:, 0, :], 0, kk, axis=-1)
                idx = jnp.broadcast_to(jnp.arange(kk, dtype=jnp.int32),
                                       vals.shape)
                return vals, idx % k, idx
            jax.lax.top_k = fake_topk
            gen.exact_top_k = fake_topk
            gen.lazy_top_candidates = fake_lazy
        elif variant == "nolmhead":
            def fake_lmhead(self, hidden, word_embeddings):
                v = self.cfg.vocab_size
                h = hidden.astype(jnp.float32)
                return jnp.pad(h, ((0, 0), (0, 0), (0, v - h.shape[-1])))
            rb.LMHead.__call__ = fake_lmhead

    results = {}
    for variant in args.variants:
        patch(variant)

        def full_pass(variables, experts, key):
            prompt = jax.random.randint(key, (batch, 4), 4, 1000)
            mask = jnp.ones((batch, 4), jnp.int32)
            enc = model.apply(variables, experts, method=Prismer.encode)
            seqs, _ = beam_search(
                model, variables, enc, prompt, mask, num_beams=3,
                max_length=20, min_length=args.min_length, length_penalty=1.0,
                eos_token_id=cfg.decoder.eos_token_id,
                pad_token_id=cfg.decoder.pad_token_id)
            return jnp.sum(seqs, dtype=jnp.int32).astype(jnp.float32)

        @jax.jit
        def program(variables, experts, seed):
            def body(c, i):
                key = jax.random.fold_in(jax.random.key(seed), i)
                return c + full_pass(variables, experts, key), None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(args.iters))
            return out

        t0 = time.perf_counter()
        timed_value(program, variables, experts_fixed, jnp.int32(0))
        print(f"# {variant}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for r in range(args.repeats):
            t, _ = timed_value(program, variables, experts_fixed,
                               jnp.int32(r + 1))
            times.append(t)
        per_iter = min(times) / args.iters
        results[variant] = per_iter
        print(f"{variant}: {per_iter * 1000:.2f} ms/iter", flush=True)

    patch("base")
    if "base" in results:
        for v, t in results.items():
            if v != "base":
                print(f"{v} share: {(results['base'] - t) * 1000:.2f} ms")


if __name__ == "__main__":
    main()
