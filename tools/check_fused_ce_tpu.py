"""On-chip parity + isolated timing of the fused LM-head+CE kernel
(ops/fused_ce.py) at real training shapes, vs the XLA composition it
replaces (LM-head einsum -> label_smoothed_loss), forward AND backward.

Honest timing per CLAUDE.md: device-generated inputs keyed by a changing
seed + forced scalar readback. Run ONE variant per invocation if the relay
is loaded.

  python tools/check_fused_ce_tpu.py --batch 16 --seq 30 --iters 20
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=30)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--vocab", type=int, default=50265)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", default="both",
                    choices=["both", "kernel", "xla"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--grad", action="store_true", default=True)
    ap.add_argument("--no-grad", dest="grad", action="store_false")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prismer_tpu.models.roberta import label_smoothed_loss
    from prismer_tpu.ops.fused_ce import fused_label_smoothed_loss

    b, l, d, v = args.batch, args.seq, args.dim, args.vocab
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"[fused_ce] B={b} L={l} D={d} V={v} dtype={args.dtype} "
          f"grad={args.grad} dev={jax.devices()[0]}", flush=True)

    key = jax.random.key(0)
    emb = (jax.random.normal(key, (v, d), jnp.float32) * 0.05).astype(dt)
    bias = jax.random.normal(jax.random.key(1), (v,), jnp.float32) * 0.1
    labels_base = jax.random.randint(jax.random.key(2), (b, l), 0, v)
    labels_base = labels_base.at[:, :4].set(-100)
    jax.block_until_ready((emb, bias, labels_base))

    def make_h(seed):
        return jax.random.normal(jax.random.key(seed), (b, l, d),
                                 jnp.float32).astype(dt)

    def loss_kernel(h, emb_, bias_):
        return jnp.mean(fused_label_smoothed_loss(
            h, emb_, bias_, labels_base, interpret=False))

    def loss_xla(h, emb_, bias_):
        logits = jnp.einsum("bld,vd->blv", h, emb_,
                            preferred_element_type=jnp.float32) + bias_
        return jnp.mean(label_smoothed_loss(logits, labels_base))

    def wrap(loss_fn):
        if args.grad:
            @jax.jit
            def run(seed):
                h = make_h(seed)
                val, (dh, demb, dbias) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2))(h, emb, bias)
                return (val, dh.astype(jnp.float32).sum(), demb, dbias)
            return run

        @jax.jit
        def run(seed):
            return (loss_fn(make_h(seed), emb, bias), jnp.float32(0),
                    jnp.float32(0), jnp.float32(0))
        return run

    runners = {"kernel": wrap(loss_kernel), "xla": wrap(loss_xla)}
    modes = ["kernel", "xla"] if args.mode == "both" else [args.mode]
    outs = {}
    for m in modes:
        t0 = time.time()
        val, dhs, demb, dbias = runners[m](1234)
        _ = float(val)
        print(f"[{m}] first call (compile) {time.time() - t0:.1f} s",
              flush=True)
        outs[m] = (float(val), float(dhs),
                   np.asarray(demb, np.float32), np.asarray(dbias,
                                                            np.float32))
        t0 = time.time()
        for i in range(args.iters):
            v_i, *_ = runners[m](5000 + i)
            _ = float(v_i)          # forced scalar readback per iter
        dt_ms = (time.time() - t0) / args.iters * 1e3
        passes = 3 if args.grad else 1
        gbs = passes * emb.size * emb.dtype.itemsize / (dt_ms * 1e-3) / 1e9
        print(f"[{m}] {dt_ms:.3f} ms/call  (~{gbs:.0f} GB/s emb-stream "
              f"equiv)", flush=True)

    if len(modes) == 2:
        kv, kd, kde, kdb = outs["kernel"]
        xv, xd, xde, xdb = outs["xla"]
        print(f"[parity] loss kernel={kv:.6f} xla={xv:.6f} "
              f"d={abs(kv - xv):.2e}", flush=True)
        assert abs(kv - xv) < 5e-3 * max(1.0, abs(xv)), (kv, xv)
        if args.grad:
            print(f"[parity] sum(dh) kernel={kd:.6f} xla={xd:.6f}",
                  flush=True)
            rel = np.abs(kde - xde) / (np.abs(xde).max() + 1e-9)
            print(f"[parity] demb max rel dev {rel.max():.2e}", flush=True)
            relb = np.abs(kdb - xdb) / (np.abs(xdb).max() + 1e-9)
            print(f"[parity] dbias max rel dev {relb.max():.2e}", flush=True)
            assert rel.max() < 2e-2 and relb.max() < 2e-2
        print("[parity] OK", flush=True)


if __name__ == "__main__":
    main()
