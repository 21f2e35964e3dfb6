"""Flash-attention BACKWARD block-size sweep at the encoder training shape.

The forward sweep (ops/flash_attention._block_sizes docstring) was worth
1.6x; the dq/dkv kernels inherited its whole-QxK policy untested. This
times value_and_grad of flash_attention (both backward kernels + the delta
prologue) per (block_q, block_k) via the PRISMER_FLASH_BWD_BQ/BK env knobs
— each combo must run in its OWN process (trace-time env), so this tool
re-execs itself per combo.

Honest timing per CLAUDE.md: device-generated inputs keyed by a changing
seed + forced scalar readback; null-program overhead subtracted.

  python tools/bench_flash_bwd.py                 # sweep default combos
  python tools/bench_flash_bwd.py --one 512 1024  # single combo (child)
  python tools/bench_flash_bwd.py --xla           # XLA reference backward
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

COMBOS = [(1024, 1024), (512, 1024), (1024, 512), (512, 512), (256, 1024)]


def run_one(shape, iters, use_xla):
    import jax
    import jax.numpy as jnp
    import numpy as np

    b, h, l, d = shape
    print(f"[flash-bwd] shape {shape} "
          f"bq={os.environ.get('PRISMER_FLASH_BWD_BQ', 'default')} "
          f"bk={os.environ.get('PRISMER_FLASH_BWD_BK', 'default')} "
          f"xla={use_xla} dev={jax.devices()[0]}", flush=True)

    if use_xla:
        from prismer_tpu.ops.flash_attention import mha_reference as attn
    else:
        from prismer_tpu.ops.flash_attention import flash_attention as attn

    def loss(q, k, v):
        return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)

    @jax.jit
    def step(seed):
        ks = jax.random.split(jax.random.key(seed), 3)
        q = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)
        val, (dq, dk, dv) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            q, k, v)
        return val + dq.astype(jnp.float32).sum() \
            + dk.astype(jnp.float32).sum() + dv.astype(jnp.float32).sum()

    @jax.jit
    def null_run(seed):
        return jnp.sum(seed)

    float(null_run(jnp.int32(0)))
    samples = []
    for r in range(5):
        t0 = time.perf_counter()
        float(null_run(jnp.int32(r + 1)))
        samples.append(time.perf_counter() - t0)
    overhead = float(np.median(samples))

    t0 = time.time()
    float(step(99))
    print(f"  compile+first {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    for i in range(iters):
        float(step(100 + i))
    ms = ((time.time() - t0) / iters - overhead) * 1e3
    print(f"  {ms:.3f} ms/step (fwd+bwd, null {overhead * 1e3:.1f} ms)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=4, default=[16, 12, 964, 64])
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--one", type=int, nargs=2, default=None,
                    help="run a single (bq, bk) combo in-process")
    ap.add_argument("--xla", action="store_true")
    args = ap.parse_args()

    if args.one or args.xla:
        if args.one:
            os.environ["PRISMER_FLASH_BWD_BQ"] = str(args.one[0])
            os.environ["PRISMER_FLASH_BWD_BK"] = str(args.one[1])
        run_one(tuple(args.shape), args.iters, args.xla)
        return

    for bq, bk in COMBOS:
        cmd = [sys.executable, __file__, "--one", str(bq), str(bk),
               "--shape", *map(str, args.shape), "--iters", str(args.iters)]
        subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
