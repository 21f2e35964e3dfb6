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
                         "flash_attention (upstream kernel) instead. "
                         "TIMING ONLY: K/V are zero-padded to the block "
                         "multiple without a mask, so its outputs include "
                         "the padded keys — never compare values")
    ap.add_argument("--shape", type=int, nargs=4, default=[32, 12, 964, 64])
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--blocks", type=int, nargs=2, default=None,
                    help="block_q block_k override (ours and official)")
    ap.add_argument("--bh", type=int, default=None,
                    help="batch*head rows per program (ours only)")
    ap.add_argument("--interleave", type=int, default=0,
                    help="N>0: experimental N-way interleaved-halves kernel")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prismer_tpu.ops import flash_attention as fa_mod
    from prismer_tpu.ops.flash_attention import flash_attention, mha_reference

    b, h, l, d = args.shape
    if args.interleave:
        fn = lambda q, k, v: interleaved_forward(q, k, v, args.interleave)
    elif (args.blocks or args.bh) and not args.official:
        bq, bk = args.blocks or (None, None)
        fn = lambda q, k, v: fa_mod._flash_forward(
            q, k, v, None, False, block_q=bq, block_k=bk,
            bh_block=args.bh)[0]
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
    name = (f"interleave{args.interleave}" if args.interleave else
            "official" if args.official else
            "xla" if args.xla else "flash")
    print(f"{name} {tuple(args.shape)}: "
          f"{per * 1000:.3f} ms/call  ({flops / per / 1e12:.1f} TFLOP/s eff)")




def interleaved_forward(q, k, v, halves=2):
    """EXPERIMENT (measured: NO WIN): whole-K single-block kernel with the
    q rows split into independent chains, giving Mosaic's scheduler MXU
    work (next half's score matmul) to overlap with VPU work (previous
    half's softmax). Grid-level splits can't do this — compute does not
    overlap across grid programs, only DMA does (measured: (512,1024)
    blocks = 6.28 ms vs (968,1024) = 3.77).

    Result at 32x12x964x64: interleave2 = 3.85 ms vs 3.77-3.98 for the
    production single-chain kernel — within run-to-run noise. Either
    Mosaic already extracts this overlap from the single chain or the
    kernel is bound elsewhere (VMEM bandwidth on the (968,1024) fp32
    score tile); ~3.8-4.0 ms is the practical plateau for this shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, l, d = q.shape
    lp = -(-l // 128) * 128
    qp = -(-l // (8 * halves)) * 8 * halves
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, qp - l), (0, 0))
                 ).reshape(b * h, qp, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, lp - l), (0, 0))
                 ).reshape(b * h, lp, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, lp - l), (0, 0))
                 ).reshape(b * h, lp, d)
    scale = 1.0 / np.sqrt(d)
    hq = qp // halves

    def kernel(q_ref, k_ref, v_ref, o_ref):
        kb = k_ref[0]
        vb = v_ref[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (hq, lp), 1)
        # independent per-half chains, written half-by-half so the
        # scheduler can overlap half i+1's MXU with half i's VPU
        ss = []
        for i in range(halves):
            qh = q_ref[0, i * hq:(i + 1) * hq, :]
            s = jax.lax.dot_general(
                qh, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            ss.append(jnp.where(cols < l, s, -1e9))
        for i in range(halves):
            s = ss[i]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2((s - m) * 1.4426950408889634)
            den = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, i * hq:(i + 1) * hq, :] = (
                o / jnp.maximum(den, 1e-30)).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, qp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qp, d), lambda bh: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, qp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * qp * lp * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * 2,
            transcendentals=b * h * qp * lp,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, qp, d)[:, :, :l, :]


if __name__ == "__main__":
    main()
