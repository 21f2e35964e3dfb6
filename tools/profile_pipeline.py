"""Time breakdown of the captioning pipeline on the attached chip.

Measures, at a given batch size, three nested jit programs (each with the
bench.py measurement discipline: device-generated inputs, scan-amortized
iterations, forced scalar readback):

  encode      expert stems + resampler + ViT trunk
  prefill     encode + init_cache (prompt prefill + cross-K/V projection)
  full        encode + prefill + beam-3/max-20 cached decode loop

decode share = full - prefill;  prefill share = prefill - encode.

Usage: python tools/profile_pipeline.py [--batch 32] [--iters 4] [--repeats 3]
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
    ap.add_argument("--model", default="prismer_base")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--stages", nargs="+",
                    default=["encode", "prefill", "full"])
    ap.add_argument("--params_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="MUST match bench.py (bf16 serving default) for "
                         "the attribution to be comparable to the headline "
                         "— an fp32 run doubles every weight/cache stream "
                         "and measured decode-only 176 vs ~63 ms at b24")
    ap.add_argument("--serving", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="prepare_serving_variables (packed decode weights "
                         "+ pre-transposed LM-head embeddings), as bench.py "
                         "does")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/prismer_tpu_jax_cache")

    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer

    model, cfg = make_model(args.model, args.quick)
    batch = args.batch
    max_length = 10 if args.quick else 20
    min_length = min(8, max_length - 1)
    prompt_len = 4
    variables = init_variables(model, cfg, batch, args.params_dtype)
    if args.serving:
        from prismer_tpu.models.prismer import prepare_serving_variables
        variables = prepare_serving_variables(model, variables)

    @jax.jit
    def make_inputs(seed):
        return device_experts(cfg, jax.random.key(seed), batch)

    experts_fixed = jax.tree.map(lambda x: x, make_inputs(jnp.int32(42)))

    def encode_pass(variables, experts, key):
        enc = model.apply(variables, experts, method=Prismer.encode)
        # full reduction: every output element feeds the checksum (no DCE)
        return jnp.sum(enc.astype(jnp.float32)) * 1e-6

    def prefill_pass(variables, experts, key):
        prompt = jax.random.randint(key, (batch, prompt_len), 4, 1000)
        mask = jnp.ones((batch, prompt_len), jnp.int32)
        enc = model.apply(variables, experts, method=Prismer.encode)
        ids = jnp.repeat(prompt, 3, axis=0)
        m = jnp.repeat(mask, 3, axis=0)
        logits, cache = model.apply(variables, ids, m, enc, max_length, 3,
                                    method=Prismer.init_cache)
        return jnp.sum(logits[:, :1])

    def full_pass(variables, experts, key):
        prompt = jax.random.randint(key, (batch, prompt_len), 4, 1000)
        mask = jnp.ones((batch, prompt_len), jnp.int32)
        enc = model.apply(variables, experts, method=Prismer.encode)
        seqs, _ = beam_search(
            model, variables, enc, prompt, mask, num_beams=3,
            max_length=max_length, min_length=min_length,
            length_penalty=1.0, eos_token_id=cfg.decoder.eos_token_id,
            pad_token_id=cfg.decoder.pad_token_id)
        return jnp.sum(seqs, dtype=jnp.int32).astype(jnp.float32)

    passes = {"encode": encode_pass, "prefill": prefill_pass,
              "full": full_pass}
    results = {}
    for name in args.stages:
        fn = passes[name]

        @jax.jit
        def program(variables, experts, seed, fn=fn):
            def body(c, i):
                key = jax.random.fold_in(jax.random.key(seed), i)
                # anti-hoisting input perturbation (see bench.py): without it
                # XLA LICM lifts the loop-invariant encoder out of the scan
                eps = 1.0 + 1e-6 * (i + 1).astype(jnp.float32)
                experts_i = jax.tree.map(
                    lambda x: x * eps
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, experts)
                return c + fn(variables, experts_i, key), None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(args.iters))
            return out

        t0 = time.perf_counter()
        timed_value(program, variables, experts_fixed, jnp.int32(0))
        print(f"# {name}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for r in range(args.repeats):
            t, _ = timed_value(program, variables, experts_fixed,
                               jnp.int32(r + 1))
            times.append(t)
        per_iter = min(times) / args.iters
        results[name] = per_iter
        print(f"{name}: {per_iter * 1000:.2f} ms/iter "
              f"({batch / per_iter:.1f} img/s)", flush=True)

    if "encode" in results and "prefill" in results:
        print(f"prefill-only: "
              f"{(results['prefill'] - results['encode']) * 1000:.2f} ms")
    if "prefill" in results and "full" in results:
        print(f"decode-only:  "
              f"{(results['full'] - results['prefill']) * 1000:.2f} ms")


if __name__ == "__main__":
    main()
