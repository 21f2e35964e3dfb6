"""On-chip parity + isolated timing of the fused LN->projection kernels
(ops/ln_proj.py) at the encoder's real shapes, vs the XLA composition they
replace (fp32 LN op + separate Dense matmuls).

Honest timing per CLAUDE.md: device-generated inputs keyed by a changing
seed + forced scalar readback. Run ONE variant per invocation if the relay
is loaded; e2e adoption A/Bs go through bench.py with PRISMER_LN_PROJ=0/1
in separate processes (trace-time flag).

  python tools/check_ln_proj_tpu.py --rows 23136 --mode parity
  python tools/check_ln_proj_tpu.py --rows 23136 --mode slope --which qkv
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=23136)  # b24 x 964 tokens
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block_r", type=int, default=512)
    ap.add_argument("--mode", default="parity", choices=["parity", "slope"])
    ap.add_argument("--which", default="all",
                    choices=["all", "qkv", "fc", "adaptor"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prismer_tpu.ops import ln_proj as lp

    r, d = args.rows, args.dim
    dt = jnp.bfloat16
    print(f"[ln_proj] R={r} D={d} block_r={args.block_r} "
          f"dev={jax.devices()[0]}", flush=True)

    kw = jax.random.key(7)
    ws3 = tuple((jax.random.normal(jax.random.fold_in(kw, i), (d, d),
                                   jnp.float32) / np.sqrt(d)).astype(dt)
                for i in range(3))
    bs3 = tuple((0.1 * jax.random.normal(jax.random.fold_in(kw, 10 + i),
                                         (d,), jnp.float32)).astype(dt)
                for i in range(3))
    wfc = (jax.random.normal(jax.random.fold_in(kw, 20), (d, 4 * d),
                             jnp.float32) / np.sqrt(d)).astype(dt)
    bfc = jnp.zeros((4 * d,), dt)
    scale = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(kw, 30), (d,),
                                          jnp.float32)
    bias = 0.1 * jax.random.normal(jax.random.fold_in(kw, 31), (d,),
                                   jnp.float32)
    jax.block_until_ready((ws3, wfc))

    def make_x(seed):
        return (jax.random.normal(jax.random.key(seed), (r, d),
                                  jnp.float32) * 2.0).astype(dt)

    cases = {
        "qkv": (
            lambda x: lp.ln_proj(x, scale, bias, ws3, bs3,
                                 block_r=args.block_r, interpret=False),
            lambda x: lp._ln_proj_ref(x, scale, bias, ws3, bs3, None, 1e-5),
        ),
        "fc": (
            lambda x: lp.ln_proj(x, scale, bias, (wfc,), (bfc,),
                                 activation="quick_gelu",
                                 block_r=args.block_r, interpret=False),
            lambda x: lp._ln_proj_ref(x, scale, bias, (wfc,), (bfc,),
                                      "quick_gelu", 1e-5),
        ),
        "adaptor": (
            lambda x: (lp.adaptor_fused(x, scale, bias, ws3[0], bs3[0],
                                        ws3[1], bs3[1],
                                        block_r=args.block_r,
                                        interpret=False),),
            lambda x: (lp._adaptor_ref(x, scale, bias, ws3[0], bs3[0],
                                       ws3[1], bs3[1], 1e-5),),
        ),
    }
    names = list(cases) if args.which == "all" else [args.which]

    if args.mode == "parity":
        for nm in names:
            kfn, rfn = cases[nm]
            x = make_x(0)
            got = jax.block_until_ready(jax.jit(kfn)(x))
            want = jax.block_until_ready(jax.jit(rfn)(x))
            got = got if isinstance(got, tuple) else tuple(got)
            for i, (g, w) in enumerate(zip(got, want)):
                g32 = np.asarray(g, np.float32)
                w32 = np.asarray(w, np.float32)
                amax = float(np.abs(g32 - w32).max())
                denom = float(np.abs(w32).max()) or 1.0
                print(f"  {nm}[{i}]: max|diff|={amax:.3e} "
                      f"(rel {amax / denom:.2e})", flush=True)
                assert amax / denom < 3e-2, (nm, i, amax)
        print("PARITY OK", flush=True)
        return

    for nm in names:
        kfn, rfn = cases[nm]
        for label, fn in (("kernel", kfn), ("xla", rfn)):
            f = jax.jit(lambda s, fn=fn: sum(
                jnp.sum(o.astype(jnp.float32)) for o in fn(make_x(s))))
            float(f(0))  # compile + warm
            t0 = time.perf_counter()
            for i in range(args.iters):
                float(f(i + 1))
            dt_ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"  {nm:8s} {label:6s}: {dt_ms:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
