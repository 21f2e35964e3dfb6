#!/bin/bash
# Round-4 VQA A/B, same session, sequential: fused CE on/off on the rank
# pass-2 (the (B*k_test, L, V) logits are the last big HBM materialization
# on the VQA path). Host to itself during runs.
# Usage: bash tools/ab_vqa_r4.sh >> ab_vqa_r4.log 2>&1
set -u
cd /root/repo
run() {
  name=$1; shift
  echo "=== vqa/$name $(date -u +%H:%M:%S) ==="
  env "$@" timeout 2400 python bench.py --task vqa --skip-baseline 2>&1 | \
      grep -E "img/s|compile|metric|p50|ms" | sed "s/^/[$name] /"
}
run ce_on  PRISMER_FUSED_CE=on
run ce_off PRISMER_FUSED_CE=off
echo "=== done $(date -u +%H:%M:%S) ==="
