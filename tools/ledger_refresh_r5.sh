#!/bin/bash
# Round-5 one-session ledger refresh: every headline mode at adopted
# defaults, sequentially (ONE TPU job at a time; host to itself).
# The 2026-08-20 round-5 session ran these pieces individually
# (ab_ln_proj.log, sweep_models.log, ab_stack.log, /tmp/train_v2*.log,
# /tmp/vqa_r5.log); this script reproduces the full set in one run for
# future sessions. Usage: bash tools/ledger_refresh_r5.sh >> ledger_r5.log 2>&1
set -u
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name $(date -u +%H:%M:%S) ==="
  timeout 3600 "$@" 2>&1 | grep -avE "cpu_aot_loader|Machine type|SIGILL" \
    | sed "s/^/[$name] /"
  echo "[$name] done $(date -u +%H:%M:%S)"
}
run caption_base    python bench.py --skip-baseline --northstar off
run caption_zbase   python bench.py --skip-baseline --northstar off --experts none
run caption_large   python bench.py --skip-baseline --northstar off --model prismer_large --batches 16 24 32
run caption_huge    python bench.py --skip-baseline --northstar off --model prismer_huge --batches 4 8 16
run vqa_p50         python bench.py --task vqa --vqa_samples 100
run train_caption   python bench.py --task train --batch 16 --freeze freeze_vision --attribution
run train_pretrain  python bench.py --task train --batch 32 --resolution 224 --freeze freeze_lang_vision
run train_full      python bench.py --task train --batch 16 --freeze none
echo "=== done $(date -u +%H:%M:%S) ==="
