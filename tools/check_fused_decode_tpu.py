"""Decoder-only on-chip check of the fused whole-step decode kernel.

Compiles fast (no ViT encoder program) so Mosaic issues surface cheaply:
  1. one decode step fused vs XLA on identical inputs -> max |dlogits|
  2. a 16-step decode scan timed for both paths (bench.py discipline:
     device-generated inputs keyed by seed, scalar readback)

The 16-step scan of the XLA path is the measured 72.1 ms b32 layer-body
budget's direct stand-in (tools/profile_decode_parts.py); the fused kernel
must land near the ~30 ms traffic floor.

Usage: python tools/check_fused_decode_tpu.py [--batch 32] [--steps 16]
       [--mode both|fused|xla] [--check/--no-check]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--beams", type=int, default=3)
    ap.add_argument("--enc_len", type=int, default=964)
    ap.add_argument("--max_len", type=int, default=20)
    ap.add_argument("--prompt", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--model", default="prismer_base")
    ap.add_argument("--mode", default="both",
                    choices=["both", "fused", "xla"])
    ap.add_argument("--check", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--slope", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="also time a steps//4 program and report the "
                         "per-decode-step slope (isolates the step cost "
                         "from prefill/packing/LM-head fixed cost)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/prismer_tpu_jax_cache")

    from bench import make_model, timed_value
    from prismer_tpu.models import roberta as rb
    from prismer_tpu.models.roberta import RobertaCausalDecoder

    _, cfg = make_model(args.model, False)
    dcfg = cfg.decoder
    b, k, p, t, l = args.batch, args.beams, args.prompt, args.max_len, args.enc_len
    n = b * k
    dv = dcfg.vision_hidden_size
    dec = RobertaCausalDecoder(dcfg, dtype=jnp.bfloat16)

    print(f"# init decoder params (N={n}, L={l}, D={dcfg.hidden_size})",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()

    @jax.jit
    def make_vars(key):
        ids = jnp.ones((2, p), jnp.int32)   # tiny shapes: init only
        m = jnp.ones((2, p), jnp.int32)
        enc = jnp.zeros((2, 8, dv), jnp.float32)
        v = dec.init(key, ids, m, enc)
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                            if jnp.issubdtype(x.dtype, jnp.floating) else x, v)

    from prismer_tpu.models.layers import xla_attention
    with xla_attention():  # no flash kernel compile for the one-off init
        variables = jax.tree.map(lambda x: x, make_vars(jax.random.key(0)))
    print(f"# init done in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    def make_program(mode):
      # fresh function object per mode: jax's tracing cache is keyed on
      # function identity and would otherwise silently reuse the first
      # mode's trace after the flag flip (verified — an earlier version of
      # this script reported identical 'fused' and 'xla' numbers that were
      # both the XLA path)
      rb.set_fused_decode("on" if mode == "fused" else "off")

      def decode_program(variables, seed):
        key = jax.random.key(seed)
        enc = jax.random.normal(jax.random.fold_in(key, 0),
                                (b, l, dv), jnp.bfloat16)
        prompt = jax.random.randint(jax.random.fold_in(key, 1),
                                    (b, p), 4, 1000)
        ids = jnp.repeat(prompt, k, axis=0)
        m = jnp.ones((n, p), jnp.int32)
        logits0, cache = dec.apply(variables, ids, m, enc, t, k,
                                   method=RobertaCausalDecoder.init_cache)

        def body(carry, s):
            tot, cache = carry
            index = p + s
            tokens = jax.random.randint(jax.random.fold_in(key, 2 + s),
                                        (n,), 4, 1000)
            pos = jnp.full((n,), 0, jnp.int32) + p + s + 2
            positions = jnp.arange(t)[None, :]
            key_mask = jnp.broadcast_to(
                (positions <= index).astype(jnp.int32), (n, t))
            step_logits, cache = dec.apply(
                variables, tokens, index.astype(jnp.int32), pos, key_mask,
                cache, k, l, method=RobertaCausalDecoder.decode_step)
            return (tot + jnp.sum(step_logits.astype(jnp.float32)) * 1e-6,
                    cache), step_logits[0, :8]
        (tot, _), last = jax.lax.scan(
            body, (jnp.sum(logits0.astype(jnp.float32)) * 1e-6, cache),
            jnp.arange(args.steps))
        return tot, last

      return jax.jit(decode_program)

    results = {}
    lasts = {}
    slopes = {}
    modes = ["xla", "fused"] if args.mode == "both" else [args.mode]
    for mode in modes:
        program = make_program(mode)
        t0 = time.perf_counter()
        try:
            timed_value(lambda v, s: program(v, s)[0],
                        variables, jnp.int32(0))
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)
            raise
        print(f"# {mode}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for r in range(args.repeats):
            tt, _ = timed_value(lambda v, s: program(v, s)[0],
                                variables, jnp.int32(r + 1))
            times.append(tt)
        results[mode] = min(times)
        if args.check:
            lasts[mode] = jax.device_get(program(variables, jnp.int32(99))[1])
        print(f"{mode}: {min(times) * 1000:.2f} ms "
              f"({args.steps} steps, prefill included)", flush=True)

        if args.slope:
            short = max(1, args.steps // 4)
            saved = args.steps
            args.steps = short
            prog_s = make_program(mode)
            t0 = time.perf_counter()
            timed_value(lambda v, s: prog_s(v, s)[0], variables, jnp.int32(0))
            print(f"# {mode} short({short}): compile+first "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
                  flush=True)
            ts = min(timed_value(lambda v, s: prog_s(v, s)[0], variables,
                                 jnp.int32(r + 31))[0]
                     for r in range(args.repeats))
            args.steps = saved
            per_step = (results[mode] - ts) / (saved - short)
            slopes[mode] = per_step
            print(f"{mode}: {per_step * 1e3:.3f} ms/step (slope), "
                  f"fixed {1e3 * (ts - short * per_step):.2f} ms", flush=True)

    if len(results) == 2:
        print(f"fused/xla: {results['fused'] / results['xla']:.3f}", flush=True)
    if len(slopes) == 2:
        print(f"fused/xla per-step: {slopes['fused'] / slopes['xla']:.3f}",
              flush=True)
    if args.check and len(lasts) == 2:
        import numpy as np
        d = np.abs(np.asarray(lasts["fused"], np.float32)
                   - np.asarray(lasts["xla"], np.float32))
        print(f"max |dlogits| over steps (row 0, 8 cols): {d.max():.4f}",
              flush=True)


if __name__ == "__main__":
    main()
