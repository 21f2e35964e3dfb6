#!/bin/bash
# Round-5 serving A/B: fused LN->projection kernels (ops/ln_proj.py),
# same session, sequential (ONE TPU job at a time; host to itself).
# Each variant is its own process (PRISMER_LN_PROJ is a trace-time flag).
# Round-4 attempt died at the 1500s timeout on the "on" side with output
# filtered to silence — this version keeps FULL output and a 3600s budget.
# Usage: bash tools/ab_ln_proj_r5.sh [batch] >> ab_ln_proj.log 2>&1
set -u
B=${1:-24}
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name (b$B) $(date -u +%H:%M:%S) ==="
  env "$@" timeout 3600 python bench.py --batch "$B" --skip-baseline \
      --repeats 3 2>&1 | sed "s/^/[$name] /"
  echo "[$name] exit=$?"
}
run lnproj_off PRISMER_LN_PROJ=0
run lnproj_on  PRISMER_LN_PROJ=1
echo "=== done $(date -u +%H:%M:%S) ==="
