"""MSDeformAttn microbenchmark: XLA-gather vs Pallas one-hot-matmul, at the
real Mask2Former shapes (VERDICT round-2 item #7; SURVEY hard-part #3).

Shapes: 480px Swin-L pixel decoder — 3 levels (60x60, 30x30, 15x15),
Lq = S = 4725 (encoder deformable self-attention), 8 heads, head dim 32,
4 points. Measurement discipline per CLAUDE.md: inputs generated ON DEVICE
from a per-iteration seed inside a lax.scan (identical cost for both
variants), scalar checksum readback ends every timed call.

Run on the TPU:   python tools/bench_deform_attn.py [--batch 1 4] [--iters 8]
Prints one JSON line per (variant, batch).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = ((60, 60), (30, 30), (15, 15))
H, D, P = 8, 32, 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="debug on CPU (interpret mode for pallas)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from prismer_tpu.experts.ops.deform_attn import ms_deform_attn
    from prismer_tpu.experts.ops.deform_attn_pallas import \
        ms_deform_attn_onehot

    s = sum(hl * wl for hl, wl in SHAPES)
    lq = s
    nl = len(SHAPES)
    print(f"# device: {jax.devices()[0].platform}, S=Lq={s}, "
          f"H={H} D={D} P={P}", file=sys.stderr)

    def inputs(key, batch):
        k1, k2, k3 = jax.random.split(key, 3)
        value = jax.random.normal(k1, (batch, s, H, D), jnp.float32)
        loc = jax.random.uniform(k2, (batch, lq, H, nl, P, 2), jnp.float32)
        attn = jax.nn.softmax(
            jax.random.normal(k3, (batch, lq, H, nl, P)).reshape(
                batch, lq, H, nl * P), axis=-1).reshape(
                    batch, lq, H, nl, P)
        return value, loc, attn

    def bench(fn, name, batch):
        def step(carry, seed):
            value, loc, attn = inputs(jax.random.key(seed), batch)
            out = fn(value, SHAPES, loc, attn)
            return carry + jnp.sum(out) * 1e-6, ()

        @jax.jit
        def run(seed0):
            seeds = seed0 + jnp.arange(args.iters)
            total, _ = jax.lax.scan(step, jnp.float32(0), seeds)
            return total

        float(run(jnp.int32(0)))  # compile + warm
        times = []
        for r in range(args.repeats):
            t0 = time.perf_counter()
            float(run(jnp.int32(100 * (r + 1))))
            times.append(time.perf_counter() - t0)
        per_call_ms = 1e3 * float(np.median(times)) / args.iters
        print(json.dumps({
            "metric": f"ms_deform_attn_{name}_480px_b{batch}",
            "value": round(per_call_ms, 3),
            "unit": "ms/call",
            "imgs_per_sec": round(1e3 * batch / per_call_ms, 1),
        }), flush=True)
        return per_call_ms

    for batch in args.batch:
        if args.cpu:
            import functools
            onehot = functools.partial(ms_deform_attn_onehot, interpret=True)
        else:
            onehot = ms_deform_attn_onehot
        t_gather = bench(ms_deform_attn, "xla_gather", batch)
        t_onehot = bench(onehot, "pallas_onehot", batch)
        print(json.dumps({
            "metric": f"speedup_pallas_vs_gather_b{batch}",
            "value": round(t_gather / t_onehot, 2), "unit": "x"}),
            flush=True)


if __name__ == "__main__":
    main()
