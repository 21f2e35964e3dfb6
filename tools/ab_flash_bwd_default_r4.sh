#!/bin/bash
# Same-session A/B: flash-attention backward block defaults.
#   incumbent = forward policy (whole-Q 8-rounded x whole-K), pinned via env
#   candidate = _bwd_block_sizes (1024-tile q, bk=512) — no env
# Train freeze=none exercises the encoder self-attn backward at the swept
# shape; fresh process per mode (trace-time env + jit identity rules).
# Usage: bash tools/ab_flash_bwd_default_r4.sh > ab_flash_bwd_default_r4.log 2>&1
set -u
cd /root/repo
stamp() { echo "=== $* $(date -u +%Y-%m-%dT%H:%M:%S) ==="; }
stamp incumbent-968x1024
PRISMER_FLASH_BWD_BQ=968 PRISMER_FLASH_BWD_BK=1024 \
  timeout 2400 python bench.py --task train --freeze none --batch 16 --skip-baseline
stamp candidate-default
timeout 2400 python bench.py --task train --freeze none --batch 16 --skip-baseline
stamp done
