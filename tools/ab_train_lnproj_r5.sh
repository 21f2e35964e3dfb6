#!/bin/bash
# MOOT (round 5): ln_proj was REJECTED on the serving A/B (-9.2% e2e,
# ab_ln_proj.log) — this train-path A/B is retained only for provenance
# (custom_vjp backward recomputes via the identical XLA composition).
# Run ONLY after the serving A/B adopts ln_proj. One TPU job at a time.
# Usage: bash tools/ab_train_lnproj_r5.sh [batch] >> ab_train_lnproj.log 2>&1
set -u
B=${1:-16}
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name (train b$B) $(date -u +%H:%M:%S) ==="
  env "$@" timeout 3600 python bench.py --task train --batch "$B" \
      --freeze freeze_vision --repeats 4 2>&1 \
      | grep -vE "cpu_aot_loader|Machine type" | sed "s/^/[$name] /"
  echo "[$name] exit done $(date -u +%H:%M:%S)"
}
run train_lnproj_off PRISMER_LN_PROJ=0
run train_lnproj_on  PRISMER_LN_PROJ=1
echo "=== done $(date -u +%H:%M:%S) ==="
