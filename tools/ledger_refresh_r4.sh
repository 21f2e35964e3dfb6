#!/bin/bash
# One-session perf ledger refresh (VERDICT r3 task 2): every bench mode,
# sequentially, with the adopted defaults (no env overrides), so README
# numbers are same-session comparable. Takes ~2h of remote compiles.
# Usage: bash tools/ledger_refresh_r4.sh > ledger_r4.log 2>&1
set -u
cd /root/repo
stamp() { echo "=== $* $(date -u +%Y-%m-%dT%H:%M:%S) ==="; }
stamp caption-base-sweep
timeout 3600 python bench.py --batches 16 24 32 --skip-baseline --repeats 3
stamp prismerz-base
timeout 2400 python bench.py --experts none --batches 32 48 --skip-baseline --repeats 3
stamp prismer-large
timeout 2400 python bench.py --model prismer_large --batches 8 16 --skip-baseline --repeats 3
stamp vqa-base
timeout 2400 python bench.py --task vqa --skip-baseline
stamp train-freeze-vision-b16-480
timeout 2400 python bench.py --task train --batch 16 --skip-baseline --attribution
stamp train-pretrain-b32-224
timeout 2400 python bench.py --task train --freeze freeze_lang_vision --resolution 224 --batch 32 --skip-baseline
stamp train-freeze-none-b16
timeout 2400 python bench.py --task train --freeze none --batch 16 --skip-baseline
stamp prismer-huge
timeout 4800 python bench.py --model prismer_huge --batches 4 8 --skip-baseline --repeats 3
stamp done
