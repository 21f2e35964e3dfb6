"""TPU parity + timing of the packed-layout flash kernel vs the
transposing path at the encoder / resampler hot shapes.

Honest-timing discipline per CLAUDE.md: device-generated inputs keyed by
a changing seed, scan-amortized iterations, forced scalar readback.

Usage: python tools/bench_packed_flash.py [--iters 20] [--shape encoder|resampler]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--shape", default="encoder",
                    choices=["encoder", "resampler"])
    ap.add_argument("--parity_only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prismer_tpu.ops.flash_attention import (flash_attention,
                                                 flash_attention_packed)

    if args.shape == "encoder":
        b, h, l, lk, dh = 32, 12, 964, 964, 64
    else:
        b, h, l, lk, dh = 32, 8, 64, 1240, 96
    width = h * dh

    @jax.jit
    def make(seed):
        ks = jax.random.split(jax.random.key(seed), 3)
        q = jax.random.normal(ks[0], (b, l, width), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, lk, width), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, lk, width), jnp.bfloat16)
        return q, k, v

    def split(t):
        return t.reshape(b, t.shape[1], h, dh).transpose(0, 2, 1, 3)

    # --- parity on-chip (one dispatch each) ---
    q, k, v = make(0)
    t0 = time.time()
    got = jax.jit(lambda q, k, v: flash_attention_packed(q, k, v, h))(q, k, v)
    got = jax.device_get(got)
    print(f"# packed compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    want4 = jax.jit(lambda q, k, v: flash_attention(
        split(q), split(k), split(v)))(q, k, v)
    want = jax.device_get(want4).transpose(0, 2, 1, 3).reshape(b, l, width)
    print(f"# split compile+first {time.time() - t0:.1f}s")
    import numpy as np
    err = np.max(np.abs(np.asarray(got, np.float32) -
                        np.asarray(want, np.float32)))
    print(f"parity max|delta| = {err:.5f}  (bf16 tolerance ~0.06)")
    assert err < 0.0625, err
    if args.parity_only:
        return

    # --- timing: packed kernel alone vs split path (incl. its transposes,
    # which is what the model actually pays) ---
    def timed(fn, tag):
        @jax.jit
        def step(seed):
            def body(c, i):
                q, k, v = make(seed + i)
                o = fn(q, k, v)
                return c + jnp.sum(o.astype(jnp.float32)), ()
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(args.iters))
            return c
        float(step(jnp.int32(1)))          # compile + warm
        t0 = time.time()
        float(step(jnp.int32(100)))
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"{tag}: {dt:.3f} ms/call")
        return dt

    t_packed = timed(lambda q, k, v: flash_attention_packed(q, k, v, h),
                     "packed   ")
    t_split = timed(
        lambda q, k, v: flash_attention(split(q), split(k), split(v))
        .transpose(0, 2, 1, 3).reshape(b, l, width),
        "split+T  ")
    print(f"speedup {t_split / t_packed:.3f}x")


if __name__ == "__main__":
    main()
