"""On-chip check + isolated timing of the fused LM-head+top-k kernel
(ops/lm_topk.py) at real serving shapes, vs the XLA composition it replaces
(LM-head einsum + generation.lazy_top_candidates).

Honest timing per CLAUDE.md: device-generated inputs keyed by a changing
seed + forced scalar readback. Run ONE variant per invocation if the relay
is loaded.

  python tools/check_lm_topk_tpu.py --batch 24 --iters 20
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--beams", type=int, default=3)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--vocab", type=int, default=50265)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", default="both", choices=["both", "kernel",
                                                       "xla"])
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prismer_tpu.models.generation import lazy_top_candidates
    from prismer_tpu.ops.lm_topk import lm_topk, pad_embedding

    b, k, d, v = args.batch, args.beams, args.dim, args.vocab
    n = b * k
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    kk = 2 * k
    print(f"[lm_topk] N={n} D={d} V={v} dtype={args.dtype} "
          f"dev={jax.devices()[0]}", flush=True)

    key = jax.random.key(0)
    emb_t = (jax.random.normal(key, (d, v), jnp.float32) * 0.05).astype(dt)
    bias = jax.random.normal(jax.random.key(1), (v,), jnp.float32) * 0.1
    emb_tp, bias_p = pad_embedding(emb_t, bias, v)
    jax.block_until_ready((emb_tp, bias_p))

    def make_h(seed):
        hk = jax.random.key(seed)
        h = jax.random.normal(hk, (n, d), jnp.float32).astype(dt)
        alive = jax.random.normal(jax.random.fold_in(hk, 1), (b, k),
                                  jnp.float32)
        return h, alive

    @jax.jit
    def run_kernel(seed):
        h, alive = make_h(seed)
        vals, beam, tok = lm_topk(h, emb_tp, bias_p, alive,
                                  jnp.asarray(False), vocab=v, beams=k,
                                  kk=kk, eos_token_id=2)
        return vals.sum() + beam.sum() + tok.sum(), vals, beam, tok

    @jax.jit
    def run_xla(seed):
        h, alive = make_h(seed)
        logits = jnp.einsum("nd,dv->nv", h, emb_t,
                            preferred_element_type=jnp.float32) + bias
        vals, beam, tok = lazy_top_candidates(logits.reshape(b, k, v),
                                              alive, kk, 2,
                                              jnp.asarray(False))
        return vals.sum() + beam.sum() + tok.sum(), vals, beam, tok

    runners = {"kernel": run_kernel, "xla": run_xla}
    modes = ["kernel", "xla"] if args.mode == "both" else [args.mode]
    outs = {}
    for m in modes:
        t0 = time.time()
        s, vals, beam, tok = runners[m](1234)
        _ = float(s)
        print(f"[{m}] first call (compile) {time.time() - t0:.1f} s",
              flush=True)
        outs[m] = (np.asarray(vals), np.asarray(beam), np.asarray(tok))
        t0 = time.time()
        for i in range(args.iters):
            s_i, *_ = runners[m](5000 + i)
            _ = float(s_i)          # forced scalar readback per iter
        dt_ms = (time.time() - t0) / args.iters * 1e3
        gbs = (emb_tp.size * emb_tp.dtype.itemsize) / (dt_ms * 1e-3) / 1e9
        print(f"[{m}] {dt_ms:.3f} ms/call  (emb stream ~{gbs:.0f} GB/s)",
              flush=True)

    if len(modes) == 2:
        kv, kb, kt = outs["kernel"]
        xv, xb, xt = outs["xla"]
        mism = (kb != xb) | (kt != xt)
        if mism.any():
            # index flips are acceptable ONLY as near-ties: the two picks'
            # values must agree to fp32 tolerance (MXU contraction order
            # in-kernel differs from the XLA einsum in the last ulp)
            idx = np.argwhere(mism)
            for r, c in idx:
                print(f"[mismatch] row {r} slot {c}: kernel "
                      f"(beam {kb[r, c]}, tok {kt[r, c]}, val {kv[r, c]:.7f})"
                      f" vs xla (beam {xb[r, c]}, tok {xt[r, c]}, "
                      f"val {xv[r, c]:.7f}) dval={kv[r, c] - xv[r, c]:.3e}",
                      flush=True)
            gap = np.abs(kv[mism] - xv[mism])
            assert gap.max() < 3e-3, f"non-tie index mismatch: {gap.max()}"
            print(f"[parity] {mism.sum()}/{mism.size} near-tie index flips "
                  f"(max val gap {gap.max():.2e}) — numeric, not logical",
                  flush=True)
        else:
            print("[parity] beam/token indices EXACT", flush=True)
        np.testing.assert_allclose(kv, xv, rtol=3e-3, atol=3e-3)


if __name__ == "__main__":
    main()
