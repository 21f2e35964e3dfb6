#!/bin/bash
# Round-4 serving A/B: beam_update kernel + LN one-pass, same session,
# sequential (ONE TPU job at a time; host to itself — no concurrent CPU
# jobs, see CLAUDE.md). Each variant is its own process (trace-time flags).
# Usage: bash tools/ab_serving_r4.sh [batch] >> ab_r4.log 2>&1
set -u
B=${1:-24}
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name (b$B) $(date -u +%H:%M:%S) ==="
  env "$@" timeout 1500 python bench.py --batch "$B" --skip-baseline \
      --repeats 3 2>&1 | grep -E "img/s|pipeline compile|metric" | sed "s/^/[$name] /"
}
run base    PRISMER_BEAM_UPDATE=xla    PRISMER_LN_ONEPASS=0
run beamupd PRISMER_BEAM_UPDATE=kernel PRISMER_LN_ONEPASS=0
run ln1pass PRISMER_BEAM_UPDATE=xla    PRISMER_LN_ONEPASS=1
run both    PRISMER_BEAM_UPDATE=kernel PRISMER_LN_ONEPASS=1
echo "=== done $(date -u +%H:%M:%S) ==="
