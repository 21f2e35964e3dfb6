"""On-chip A/B of the per-step self-cache beam reorder implementations.

generation._permute_cache_rows has two exact impls (PRISMER_BEAM_PERM):
  gather  — jnp.take over axis 2 of the (NL, T, N, D) caches
  matmul  — 0/1 selector einsum streaming the tensor through the MXU

This times the per-step reorder of BOTH self caches in isolation at the
serving shapes (b24 caption: NL=13, T=34, N=72, D=768 bf16 => ~86 MB moved
per cache per step) with bench.py discipline: device-generated inputs keyed
by a changing seed, work chained across scan steps, forced scalar readback.

Usage: python tools/bench_beam_perm.py [--batch 24] [--steps 26] [--t 34]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--beams", type=int, default=3)
    ap.add_argument("--t", type=int, default=34)
    ap.add_argument("--layers", type=int, default=13)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--steps", type=int, default=26)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/prismer_tpu_jax_cache")

    b, k = args.batch, args.beams
    n = b * k
    nl, t, d = args.layers, args.t, args.d
    bytes_per_step = 2 * nl * t * n * d * 2  # two caches, bf16
    print(f"# shapes: 2x ({nl},{t},{n},{d}) bf16, "
          f"{bytes_per_step / 1e6:.1f} MB per step", flush=True)

    def make_program(mode):
        def perm(x, flat_beam):
            if mode == "matmul":
                p = (flat_beam[:, None] == jnp.arange(n)[None, :]
                     ).astype(x.dtype)
                return jnp.einsum("nm,ltmd->ltnd", p, x)
            return jnp.take(x, flat_beam, axis=2)

        def program(seed):
            key = jax.random.key(seed)
            ck = jax.random.normal(jax.random.fold_in(key, 0),
                                   (nl, t, n, d), jnp.bfloat16)
            cv = jax.random.normal(jax.random.fold_in(key, 1),
                                   (nl, t, n, d), jnp.bfloat16)

            def body(carry, s):
                ck, cv = carry
                beam = jax.random.randint(
                    jax.random.fold_in(key, 2 + s), (b, k), 0, k)
                flat = (beam + jnp.arange(b)[:, None] * k).reshape(-1)
                ck = perm(ck, flat)
                cv = perm(cv, flat)
                # chain a data dependency so steps cannot overlap/CSE
                ck = ck + jnp.bfloat16(s * 1e-8)
                return (ck, cv), ck[0, 0, 0, 0]

            (ck, cv), _ = jax.lax.scan(body, (ck, cv),
                                       jnp.arange(args.steps))
            return (jnp.sum(ck[:, :, 0, :].astype(jnp.float32))
                    + jnp.sum(cv[:, :, 0, :].astype(jnp.float32)))

        return jax.jit(program)

    results = {}
    for mode in ("gather", "matmul"):
        fn = make_program(mode)
        t0 = time.perf_counter()
        float(fn(0))  # compile
        print(f"# {mode}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for r in range(args.repeats):
            t0 = time.perf_counter()
            float(fn(1 + r))
            best = min(best, time.perf_counter() - t0)
        per_step = best / args.steps * 1e3
        gbps = bytes_per_step * 2 / (best / args.steps) / 1e9  # rd+wr
        results[mode] = per_step
        print(f"{mode}: {per_step:.3f} ms/step ({gbps:.0f} GB/s eff rd+wr)",
              flush=True)

    g, m = results["gather"], results["matmul"]
    print(f"matmul/gather: {m / g:.3f}x "
          f"({'matmul wins' if m < g else 'gather wins'})", flush=True)


if __name__ == "__main__":
    main()
