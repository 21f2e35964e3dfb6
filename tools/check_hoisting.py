"""Check whether XLA hoists the loop-invariant encoder out of the bench's
scan-amortized pipeline (WhileLoopInvariantCodeMotion would inflate the
throughput reading: N iterations would pay for one encode).

Dumps the optimized HLO of the bench program and reports whether the
convolution ops (the encoder stems — only present in encode) sit inside the
while-loop body computation or outside it.
"""

import re
import sys

sys.path.insert(0, ".")

from bench import device_experts, init_variables, make_model


def main():
    import jax
    import jax.numpy as jnp

    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer

    quick = "--quick" in sys.argv
    model, cfg = make_model("prismer_base", quick)
    batch = 4 if quick else 32
    max_length = 10 if quick else 20
    variables = init_variables(model, cfg, batch)
    experts_fixed = jax.jit(
        lambda s: device_experts(cfg, jax.random.key(s), batch))(jnp.int32(0))

    def one_pass(variables, experts, key):
        prompt = jax.random.randint(key, (batch, 4), 4, 1000)
        mask = jnp.ones((batch, 4), jnp.int32)
        enc = model.apply(variables, experts, method=Prismer.encode)
        seqs, _ = beam_search(
            model, variables, enc, prompt, mask, num_beams=3,
            max_length=max_length, min_length=8,
            length_penalty=1.0, eos_token_id=cfg.decoder.eos_token_id,
            pad_token_id=cfg.decoder.pad_token_id)
        return jnp.sum(seqs, dtype=jnp.int32)

    @jax.jit
    def program(variables, experts, seed):
        def body(c, i):
            key = jax.random.fold_in(jax.random.key(seed), i)
            return c + one_pass(variables, experts, key), None
        out, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(4))
        return out

    compiled = program.lower(variables, experts_fixed, jnp.int32(0)).compile()
    hlo = compiled.as_text()
    with open("/tmp/bench_hlo.txt", "w") as f:
        f.write(hlo)
    print(f"HLO dumped: {len(hlo)} chars -> /tmp/bench_hlo.txt")

    # parse computations and build a call graph, then check reachability of
    # convolution ops from each while-loop body
    comp = None
    conv_comps = {}
    refs = {}
    while_bodies = []
    entry = None
    for line in hlo.splitlines():
        m = re.match(r"^(ENTRY )?%?([\w\.\-]+)(?:\.v\d+)? \(.*\{", line)
        if m:
            comp = m.group(2)
            refs.setdefault(comp, set())
            if m.group(1):
                entry = comp
            continue
        if comp is None:
            continue
        if "convolution(" in line:
            conv_comps[comp] = conv_comps.get(comp, 0) + 1
        for r in re.findall(r"(?:calls=|to_apply=|body=|condition=)%?([\w\.\-]+)", line):
            refs[comp].add(r)
        wm = re.search(r"body=%?([\w\.\-]+)", line)
        if wm and " while(" in line:
            while_bodies.append((comp, wm.group(1)))

    def reachable(start):
        seen, stack = set(), [start]
        while stack:
            c = stack.pop()
            if c in seen:
                continue
            seen.add(c)
            stack.extend(refs.get(c, ()))
        return seen

    print("while loops (in computation -> body):", while_bodies)
    total_convs = sum(conv_comps.values())
    inside = 0
    for _, body in while_bodies:
        r = reachable(body)
        inside += sum(n for c, n in conv_comps.items() if c in r)
    print(f"convolution ops: total={total_convs}, "
          f"reachable from while bodies={inside}")
    if total_convs and not inside:
        print("VERDICT: encoder HOISTED out of the scan "
              "(bench amortization invalid)")
    elif inside:
        print("VERDICT: encoder runs inside the loop (bench valid)")


if __name__ == "__main__":
    main()
