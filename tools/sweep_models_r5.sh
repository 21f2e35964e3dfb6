#!/bin/bash
# Round-5 model-scale serving sweep (VERDICT r4 weak #5): prismer_huge at
# b4 (exercises the new misaligned-batch padding into the fused path) and
# b16 (HBM-fit attempt), prismer_large at b24/b32. One TPU job at a time;
# host to itself. Usage: bash tools/sweep_models_r5.sh >> sweep_models.log 2>&1
set -u
cd /root/repo
run() {
  name=$1; model=$2; batch=$3; shift 3
  echo "=== $name (b$batch) $(date -u +%H:%M:%S) ==="
  env "$@" timeout 3600 python bench.py --model "$model" --batch "$batch" \
      --skip-baseline --repeats 3 2>&1 \
      | grep -vE "cpu_aot_loader|Machine type" | sed "s/^/[$name] /"
  echo "[$name] done $(date -u +%H:%M:%S)"
}
run huge_b4   prismer_huge  4
run huge_b16  prismer_huge 16
run large_b24 prismer_large 24
run large_b32 prismer_large 32
echo "=== done $(date -u +%H:%M:%S) ==="
