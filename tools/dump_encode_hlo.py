"""Dump the optimized TPU HLO of the encode program and summarize the
copy / pad / convert instructions with shapes — evidence for hunting the
~18 ms of `copy` and ~10 ms of `pad` the device trace attributes to the
b32 encode (tools/trace_breakdown.py).

Usage: python tools/dump_encode_hlo.py [--batch 32] [--out /tmp/encode_hlo.txt]
"""

import argparse
import collections
import re
import sys

sys.path.insert(0, ".")

from bench import device_experts, init_variables, make_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="/tmp/encode_hlo.txt")
    ap.add_argument("--ops", nargs="+",
                    default=["copy", "pad", "convert", "transpose"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prismer_tpu.models.prismer import Prismer

    model, cfg = make_model("prismer_base", False)
    variables = init_variables(model, cfg, args.batch)
    experts = device_experts(cfg, jax.random.key(0), args.batch)

    def encode(variables, experts):
        return model.apply(variables, experts, method=Prismer.encode)

    print("# lowering + compiling...", flush=True)
    compiled = jax.jit(encode).lower(variables, experts).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"# optimized HLO -> {args.out} ({len(txt)} bytes)")

    # Aggregate by (op, shape) so repeated per-layer instances collapse.
    pat = re.compile(r"^\s*(?:ROOT )?%?[\w.\-]+ = (\S+) (copy|pad|convert|"
                     r"transpose)\(", re.M)
    counts = collections.Counter()
    for m in pat.finditer(txt):
        shape, op = m.group(1), m.group(2)
        if op in args.ops:
            counts[(op, shape)] += 1

    def nbytes(shape):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if not m:
            return 0
        dt, dims = m.groups()
        sz = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
              "pred": 1, "f16": 2}.get(dt.split("{")[0], 4)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * sz

    rows = sorted(counts.items(),
                  key=lambda kv: -nbytes(kv[0][1]) * kv[1])
    total = 0
    for (op, shape), c in rows:
        mb = nbytes(shape) * c / 1e6
        total += mb
        print(f"{mb:10.1f} MB  x{c:4d}  {op:10s} {shape}")
    print(f"# total bytes written by these ops: {total:.0f} MB")


if __name__ == "__main__":
    main()
