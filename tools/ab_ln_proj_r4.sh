#!/bin/bash
# Round-4 serving A/B: fused LN->projection kernels (ops/ln_proj.py),
# same session, sequential (ONE TPU job at a time; host to itself).
# Each variant is its own process (PRISMER_LN_PROJ is a trace-time flag).
# Usage: bash tools/ab_ln_proj_r4.sh [batch] >> ab_ln_proj.log 2>&1
set -u
B=${1:-24}
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name (b$B) $(date -u +%H:%M:%S) ==="
  env "$@" timeout 1500 python bench.py --batch "$B" --skip-baseline \
      --repeats 3 2>&1 | grep -E "img/s|pipeline compile|metric" | sed "s/^/[$name] /"
}
run lnproj_off PRISMER_LN_PROJ=0
run lnproj_on  PRISMER_LN_PROJ=1
echo "=== done $(date -u +%H:%M:%S) ==="
