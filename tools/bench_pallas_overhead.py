"""Measure the per-invocation overhead of pallas_call inside a jitted loop.

MEASURED (v5e, 2026-08-16): per-call overhead is ZERO within noise —
n_calls=1: -164 us, n=8: -16 us, n=32: -2 us vs the same arithmetic as
plain XLA adds (the ~3.4 ms/iter floor is the scan dispatch itself).
This REFUTES the earlier inference that custom calls serialize expensively
(+0.42 ms/invocation was inferred from the grouped-decode-attention
end-to-end regression). The real cost of the rejected decode kernels must
be fusion breakage around the call (operands materialized to HBM that XLA
previously kept inside a fusion), not call overhead — so a fused
MULTI-OP decode kernel (amortizing operand round-trips over more work)
remains viable where a single-op replacement was not.

Usage: python tools/bench_pallas_overhead.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tiny_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def tiny(x):
    return pl.pallas_call(
        tiny_kernel,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


def measure(n_calls, use_pallas):
    @jax.jit
    def prog(x, seed):
        def body(c, i):
            y = c + 1e-9 * i.astype(jnp.float32)
            for _ in range(n_calls):
                y = tiny(y) if use_pallas else y + 1.0
            return y, None
        out, _ = jax.lax.scan(body, x, jnp.arange(8))
        return jnp.sum(out)

    x = jnp.zeros((8, 128), jnp.float32)
    t0 = time.perf_counter()
    float(prog(x, jnp.int32(0)))
    print(f"# n={n_calls} pallas={use_pallas}: compile "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        float(prog(x, jnp.int32(r)))
        best = min(best, time.perf_counter() - t0)
    return best / 8  # per scan iteration


def main():
    for n in (1, 8, 32):
        tp = measure(n, True)
        tx = measure(n, False)
        print(f"n_calls={n:3}: pallas {tp * 1000:8.3f} ms/iter | "
              f"xla add {tx * 1000:8.3f} ms/iter | "
              f"per-call {(tp - tx) / n * 1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
