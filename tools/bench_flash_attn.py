"""Standalone microbenchmark of the Pallas flash-attention kernel at the
encoder's hot shape (B=32, H=12, L=964, Dh=64, bf16).

Usage: python tools/bench_flash_attn.py [--xla]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xla", action="store_true",
                    help="time the XLA reference path instead")
    ap.add_argument("--shape", type=int, nargs=4, default=[32, 12, 964, 64])
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prismer_tpu.ops.flash_attention import flash_attention, mha_reference

    b, h, l, d = args.shape
    fn = mha_reference if args.xla else flash_attention

    make = jax.jit(lambda s: tuple(
        jax.random.normal(jax.random.fold_in(jax.random.key(s), i),
                          (b, h, l, d), jnp.bfloat16) for i in range(3)))
    q, k, v = make(0)

    @jax.jit
    def prog(q, k, v, seed):
        def body(c, i):
            eps = (1.0 + 1e-6 * (i + 1).astype(jnp.float32)
                   ).astype(jnp.bfloat16)
            out = fn(q * eps, k, v)
            return c + jnp.sum(out.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.iters))
        return out

    t0 = time.perf_counter()
    float(prog(q, k, v, jnp.int32(0)))
    print(f"# compile+first {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        float(prog(q, k, v, jnp.int32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    per = best / args.iters
    flops = 4 * b * h * l * l * d
    print(f"{'xla' if args.xla else 'flash'} {tuple(args.shape)}: "
          f"{per * 1000:.3f} ms/call  ({flops / per / 1e12:.1f} TFLOP/s eff)")


if __name__ == "__main__":
    main()
