"""Microbenchmark of the decode-time beam-grouped cross-attention chain —
the largest decode component (ablation share 69.4 ms of the b32 pipeline,
tools/profile_decode_parts.py 2026-08-16).

Mimics the real decode traffic pattern: STEPS sequential decode steps, each
running NL layer-chained grouped cross-attentions against per-layer stacked
caches kt (NL, B, H, Dh, L) / v (NL, B, H, L, Dh), with the layer input
depending on the previous layer's output (no cross-layer parallelism, as in
the real network). Speed of light = reading kt+v once per layer per step:
NL * STEPS * 2 * B*H*Dh*L * 2 bytes = 18.1 GB at the default shape
-> ~22 ms at the v5e's 819 GB/s.

MEASURED (2026-08-17, full 12x16 shape, scan): xla 51.65 ms total
(352 GB/s effective of 18.2 GB) | pallas 209.08 ms (87 GB/s) |
pallas --samples_per_block 4: 240.5 ms (76 GB/s), 8: 243.9 ms (75 GB/s,
vmem limit raised) — block size is irrelevant; the kernel is bound by
serialized per-head tiny-matmul issue latency. The
shipped kernel is 4x slower than the einsum chain even standalone; see
ops/decode_attention.py RETRY VERDICT for the implications.

Variants:
  xla         the production einsum chain (models/roberta.py attend_grouped)
  pallas      bf16-operand kernel, grid (B,), heads unrolled in-kernel
              (the round-2 rejected kernel used fp32 operand casts)
  --loop while  run the step loop as lax.while_loop (the real decode loop)
              instead of lax.scan, to expose any custom-call serialization
              specific to while bodies

BUG POSTMORTEM (fixed): the first revision's `step` closure captured the
CONCRETE cache arrays from the enclosing scope (the jit function's
same-named parameters shadowed but went unused), embedding ~2.4 GB of
constants into the program — the relay buffered the upload for 25+ min or
rejected it with HTTP 413. Symptom of a too-big program on this relay:
remote_compile 'length limit exceeded'. Caches are now threaded through
the jit arguments properly. The authoritative
adopt/reject numbers come from the END-TO-END pipeline A/B anyway
(PRISMER_DECODE_CROSS=pallas: 126.7 vs 171.0 img/s at b32 — see
prismer_tpu/ops/decode_attention.py).

Usage: python tools/bench_grouped_cross.py [--variants xla pallas] \
           [--loop scan|while]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=5, default=[32, 12, 3, 64, 964],
                    help="B H beams Dh L")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--variants", nargs="+", default=["xla", "pallas"])
    ap.add_argument("--samples_per_block", type=int, default=1,
                    help="pallas variant: samples per grid program "
                         "(DMA granularity probe)")
    ap.add_argument("--loop", choices=["scan", "while"], default="scan")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    b, h, beams, dh, l = args.shape
    nl, steps = args.layers, args.steps
    scale = 1.0 / np.sqrt(dh)

    make = jax.jit(lambda s: (
        jax.random.normal(jax.random.key(s), (nl, b, h, dh, l),
                          jnp.bfloat16),
        jax.random.normal(jax.random.fold_in(jax.random.key(s), 1),
                          (nl, b, h, l, dh), jnp.bfloat16),
        jax.random.normal(jax.random.fold_in(jax.random.key(s), 2),
                          (b, h, beams, dh), jnp.bfloat16)))
    kt_all, v_all, q0 = make(0)

    def xla_layer(q, kt, v):
        s = jnp.einsum("bhqd,bhdl->bhql", q, kt,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhql,bhld->bhqd", p.astype(v.dtype), v)

    from prismer_tpu.ops.decode_attention import grouped_cross_attention_t

    def pallas_layer(q, kt, v):
        # the SHIPPED kernel (PRISMER_DECODE_CROSS=pallas selects it in
        # production) — never a local copy, so adopt/reject verdicts always
        # measure the real code
        return grouped_cross_attention_t(
            q, kt, v, interpret=False,
            samples_per_block=args.samples_per_block)

    layer_fns = {"xla": xla_layer, "pallas": pallas_layer}

    for variant in args.variants:
        layer = layer_fns[variant]

        def step(q, i, kts, vs):
            # perturb so nothing is loop-invariant; caches MUST come in as
            # jit arguments (see BUG POSTMORTEM above)
            q = q + (1e-6 * i.astype(jnp.float32)).astype(q.dtype)
            for li in range(nl):
                q = layer(q, kts[li], vs[li])
            return q

        @jax.jit
        def prog(kts, vs, q0, seed):
            q0 = q0 + (1e-6 * seed.astype(jnp.float32)).astype(q0.dtype)
            if args.loop == "scan":
                def body(q, i):
                    return step(q, i, kts, vs), None
                q, _ = jax.lax.scan(body, q0, jnp.arange(steps))
            else:
                def cond(c):
                    return c[1] < steps

                def body(c):
                    q, i = c
                    return step(q, i, kts, vs), i + 1
                q, _ = jax.lax.while_loop(cond, body, (q0, jnp.int32(0)))
            return jnp.sum(q.astype(jnp.float32))

        t0 = time.perf_counter()
        float(prog(kt_all, v_all, q0, jnp.int32(0)))
        print(f"# {variant}/{args.loop}: compile+first "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            float(prog(kt_all, v_all, q0, jnp.int32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        gb = nl * steps * 2 * b * h * dh * l * 2 / 1e9
        print(f"{variant}/{args.loop}: {best * 1000:.2f} ms total "
              f"({gb / best:.0f} GB/s effective of {gb:.1f} GB)", flush=True)


if __name__ == "__main__":
    main()
