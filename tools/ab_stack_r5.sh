#!/bin/bash
# Round-5 full opt-in stack A/B (VERDICT r4 item #6): defaults vs the whole
# serving stack (int8 cross-KV x ln_proj-if-adopted) at b24 and b32, same
# session. One TPU job at a time.
# Usage: bash tools/ab_stack_r5.sh >> ab_stack.log 2>&1
set -u
cd /root/repo
run() {
  name=$1; batch=$2; envs=$3; shift 3
  echo "=== $name (b$batch) $(date -u +%H:%M:%S) ==="
  env $envs timeout 3600 python bench.py --batch "$batch" --skip-baseline \
      --repeats 3 "$@" 2>&1 \
      | grep -vE "cpu_aot_loader|Machine type" | sed "s/^/[$name] /"
  echo "[$name] done $(date -u +%H:%M:%S)"
}
run defaults_b24 24 "PRISMER_KV_QUANT=off"
run stack_b24    24 "PRISMER_KV_QUANT=int8" --kv_quant int8
run defaults_b32 32 "PRISMER_KV_QUANT=off"
run stack_b32    32 "PRISMER_KV_QUANT=int8" --kv_quant int8
echo "=== done $(date -u +%H:%M:%S) ==="
