"""Empirically check whether XLA amortizes loop-invariant work (the encoder)
across the bench's scan iterations.

Round-2 history: an HLO reachability analysis of the optimized module
concluded the encoder convolutions sat inside the scan body ("not hoisted").
That conclusion was WRONG — timing the same pipeline with and without an
iteration-dependent input perturbation showed ~3x amortization of the
encoder (prefill stage 50.7 ms/iter fixed-input vs 162.7 ms/iter perturbed
at b32). Optimized-HLO call graphs (flattened fusions, `wide.*` loop
transforms) are too hard to parse reliably; this tool now settles the
question the only trustworthy way — by measuring.

Method: run the pipeline program at iters=1 and iters=8 with FIXED inputs.
If per-iteration work is honest, t(8) ~ 8 * t(1) (ratio >= ~6.5 after
subtracting dispatch overhead). If XLA amortizes the encoder, the ratio
collapses toward (E + 8*rest) / (E + rest).

Usage: python tools/check_hoisting.py [--batch 8] [--perturb]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from bench import device_experts, init_variables, make_model, timed_value


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--perturb", action="store_true",
                    help="apply the bench's anti-hoisting perturbation "
                         "(expected: ratio ~8 with it; lower without)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/prismer_tpu_jax_cache")

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
    experts_fixed = jax.jit(
        lambda s: device_experts(cfg, jax.random.key(s), batch))(jnp.int32(0))

    def one_pass(variables, experts, key):
        prompt = jax.random.randint(key, (batch, 4), 4, 1000)
        mask = jnp.ones((batch, 4), jnp.int32)
        enc = model.apply(variables, experts, method=Prismer.encode)
        seqs, _ = beam_search(
            model, variables, enc, prompt, mask, num_beams=3,
            max_length=20, min_length=8, length_penalty=1.0,
            eos_token_id=cfg.decoder.eos_token_id,
            pad_token_id=cfg.decoder.pad_token_id)
        return jnp.sum(seqs, dtype=jnp.int32).astype(jnp.float32)

    def make_program(iters):
        @jax.jit
        def program(variables, experts, seed):
            def body(c, i):
                key = jax.random.fold_in(jax.random.key(seed), i)
                if args.perturb:
                    eps = 1.0 + 1e-6 * (i + 1).astype(jnp.float32)
                    experts_i = jax.tree.map(
                        lambda x: x * eps
                        if jnp.issubdtype(x.dtype, jnp.floating) else x,
                        experts)
                else:
                    experts_i = experts
                return c + one_pass(variables, experts_i, key), None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return out
        return program

    ts = {}
    for iters in (1, 8):
        program = make_program(iters)
        t0 = time.perf_counter()
        timed_value(program, variables, experts_fixed, jnp.int32(0))
        print(f"# iters={iters}: compile+first "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        best = min(timed_value(program, variables, experts_fixed,
                               jnp.int32(r + 1))[0]
                   for r in range(args.repeats))
        ts[iters] = best
        print(f"iters={iters}: {best * 1000:.1f} ms total", flush=True)

    # each timed dispatch pays the ~25-30 ms relay round trip once; at
    # iters=1 that dwarfs one pipeline pass, so the raw ratio understates
    # linearity badly (measured 2026-08-17 --perturb b8: raw 4.92 but 7.17
    # after overhead subtraction — linear). Measure the overhead with a
    # null program using the same readback pattern and subtract it.
    @jax.jit
    def null_run(seed):
        return jnp.sum(seed).astype(jnp.float32)

    timed_value(null_run, jnp.int32(0))
    overhead = min(timed_value(null_run, jnp.int32(r + 1))[0]
                   for r in range(5))
    print(f"relay overhead: {overhead * 1000:.1f} ms")

    ratio = ts[8] / ts[1]
    net1 = ts[1] - overhead
    if net1 < 0.25 * overhead:
        # the single-iteration run is in the relay-overhead noise floor —
        # the ratio is meaningless at this config; use a bigger --batch
        print(f"t(8)/t(1) = {ratio:.2f} raw; iters=1 net device time "
              f"({net1 * 1000:.1f} ms) is below the noise floor — "
              "NO VERDICT (increase --batch)")
        return
    adj = (ts[8] - overhead) / net1
    print(f"t(8)/t(1) = {ratio:.2f} raw, {adj:.2f} overhead-subtracted")
    if adj < 6.0:
        print("VERDICT: work is AMORTIZED across iterations "
              "(hoisting; fixed-input scan timing is invalid)")
    else:
        print("VERDICT: per-iteration work is honest")


if __name__ == "__main__":
    main()
