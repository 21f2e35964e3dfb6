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
    ap.add_argument("--official", action="store_true",
                    help="time jax.experimental.pallas.ops.tpu "
                         "flash_attention (upstream kernel) instead")
    ap.add_argument("--shape", type=int, nargs=4, default=[32, 12, 964, 64])
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--blocks", type=int, nargs=2, default=None,
                    help="block_q block_k override (ours and official)")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from prismer_tpu.ops import flash_attention as fa_mod
    from prismer_tpu.ops.flash_attention import flash_attention, mha_reference

    b, h, l, d = args.shape
    if args.blocks and not args.official:
        bq, bk = args.blocks
        fn = lambda q, k, v: fa_mod._flash_forward(
            q, k, v, None, False, block_q=bq, block_k=bk)[0]
    elif args.official:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as official_fa)
        lp = -(-l // 128) * 128
        obq, obk = args.blocks or (min(1024, lp), min(512, lp))
        bs = BlockSizes(block_q=min(obq, lp), block_k_major=min(obk, lp),
                        block_k=min(obk, lp), block_b=1)
        scale = 1.0 / (d ** 0.5)

        def fn(q, k, v):
            pad = ((0, 0), (0, 0), (0, lp - l), (0, 0))
            qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
            out = official_fa(qp, kp, vp, sm_scale=scale, block_sizes=bs)
            return out[:, :, :l, :]
    else:
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
    name = ("official" if args.official else
            "xla" if args.xla else "flash")
    print(f"{name} {tuple(args.shape)}: "
          f"{per * 1000:.3f} ms/call  ({flops / per / 1e12:.1f} TFLOP/s eff)")


if __name__ == "__main__":
    main()
