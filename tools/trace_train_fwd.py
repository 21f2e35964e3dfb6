"""Per-op device-time breakdown of the TRAIN path (round-5 item: the train
forward runs ~28.5% MFU vs the serving encoder's ~37% and the gap was never
attributed — VERDICT r4 weak #2).

Traces, at the bench train config (b16, 480px, freeze_vision, seq 30):
  * fwd   — the loss-only forward program bench.py's --attribution times
  * step  — the full train step (remat forward + backward + optimizer)
and aggregates device op durations by (collapsed) fusion name, exactly like
tools/trace_breakdown.py does for serving.

Usage: python tools/trace_train_fwd.py [--batch 16] [--stage fwd|step|both]
"""

import argparse
import glob
import gzip
import json
import re
import sys
import time

sys.path.insert(0, ".")

from bench import device_experts, init_variables, make_model
from tools.trace_breakdown import is_device_event


def aggregate(logdir, top):
    files = sorted(glob.glob(logdir + "/plugins/profile/*/*.json.gz"))
    if not files:
        print("no trace file produced")
        return
    d = json.load(gzip.open(files[-1]))
    agg, count = {}, {}
    total = 0.0
    for e in d.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        if not is_device_event(name):
            continue
        base = re.sub(r"[.\d]+$", "", name)
        agg[base] = agg.get(base, 0.0) + e.get("dur", 0)
        count[base] = count.get(base, 0) + 1
        total += e.get("dur", 0)
    print(f"device events total: {total / 1000:.2f} ms")
    for n, t in sorted(agg.items(), key=lambda x: -x[1])[:top]:
        print(f"{t / 1000:>9.2f} ms  x{count[n]:>5}  {n[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--stage", default="both", choices=["fwd", "step", "both"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--seq_len", type=int, default=30)
    ap.add_argument("--logdir", default="/tmp/xprof_train")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from prismer_tpu.data.device import materialize_experts
    from prismer_tpu.models.prismer import _DTYPES as _DTYPES_MAT
    from prismer_tpu.models.prismer import Prismer
    from prismer_tpu.train import build_train_step
    from prismer_tpu.train.optim import freeze_labels, make_optimizer
    from prismer_tpu.train.state import TrainState
    from prismer_tpu.train.profiling import trace

    model, cfg = make_model("prismer_base", False, "full", resolution=480,
                            freeze="freeze_vision")
    b = args.batch
    variables = init_variables(model, cfg, 1)
    params = variables["params"]
    labels = freeze_labels(params, "freeze_vision")
    tx = make_optimizer(optax.constant_schedule(1e-5), 0.05, params,
                        "freeze_vision")
    state = TrainState.create(params=params, tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(0))
    state = jax.device_put(state, jax.devices()[0])
    step_fn = build_train_step(model, tx, freeze_tree=labels, donate=False)

    @jax.jit
    def make_batch(seed):
        key = jax.random.key(seed)
        experts = device_experts(cfg, key, b)
        ids = jax.random.randint(jax.random.fold_in(key, 1),
                                 (b, args.seq_len), 4,
                                 cfg.decoder.vocab_size)
        targets = ids.at[:, :4].set(-100)
        return {"experts": experts, "input_ids": ids,
                "attention_mask": jnp.ones((b, args.seq_len), jnp.int32),
                "targets": targets}

    @jax.jit
    def fwd_only(variables, batch):
        experts = materialize_experts(batch["experts"],
                                  _DTYPES_MAT[cfg.dtype])
        per = model.apply(variables, experts, batch["input_ids"],
                          batch["attention_mask"], batch["targets"],
                          train=False, method=Prismer.forward_loss)
        return jnp.mean(per)

    v_infer = {"params": state.params, "batch_stats": state.batch_stats}

    if args.stage in ("fwd", "both"):
        print(f"=== fwd-only (b{b}) ===", flush=True)
        t0 = time.perf_counter()
        float(fwd_only(v_infer, make_batch(jnp.int32(0))))
        print(f"# compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        float(fwd_only(v_infer, make_batch(jnp.int32(1))))
        print(f"# second call: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr, flush=True)
        with trace(args.logdir + "_fwd"):
            float(fwd_only(v_infer, make_batch(jnp.int32(2))))
        aggregate(args.logdir + "_fwd", args.top)

    if args.stage in ("step", "both"):
        print(f"=== full step (b{b}) ===", flush=True)
        t0 = time.perf_counter()
        state2, m = step_fn(state, make_batch(jnp.int32(0)))
        float(m["loss"])
        print(f"# compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        state2, m = step_fn(state2, make_batch(jnp.int32(1)))
        float(m["loss"])
        print(f"# second call: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr, flush=True)
        with trace(args.logdir + "_step"):
            _, m = step_fn(state2, make_batch(jnp.int32(2)))
            float(m["loss"])
        aggregate(args.logdir + "_step", args.top)


if __name__ == "__main__":
    main()
