#!/bin/bash
# Round-4 train-path A/B, same session, sequential: fused CE on/off (the
# round-3 A/B was VOID — flag aliases), remat on/off, at the fine-tune
# shape (b16/480px freeze_vision). Host to itself during runs.
# Usage: bash tools/ab_train_r4.sh >> ab_train_r4.log 2>&1
set -u
cd /root/repo
run() {
  name=$1; shift
  echo "=== train/$name $(date -u +%H:%M:%S) ==="
  env "$@" timeout 1800 python bench.py --task train --batch 16 \
      --skip-baseline --repeats 3 2>&1 | \
      grep -E "img/s|compile|metric|mfu|MFU" | sed "s/^/[$name] /"
}
run ce_on_remat_on   PRISMER_FUSED_CE=on  PRISMER_REMAT=1
run ce_off_remat_on  PRISMER_FUSED_CE=off PRISMER_REMAT=1
run ce_on_remat_off  PRISMER_FUSED_CE=on  PRISMER_REMAT=0
run ce_off_remat_off PRISMER_FUSED_CE=off PRISMER_REMAT=0
echo "=== done $(date -u +%H:%M:%S) ==="
