"""Driver-artifact safety: `python bench.py` (the driver's exact command)
must emit ONE final JSON line carrying all three BASELINE.md north-star
metrics — caption img/s (+nested train img/s+MFU and the VQA latency
distribution). A composition bug here silently degrades BENCH_r{N}.json,
so the full quick-mode pipeline is exercised as a subprocess on CPU."""

import json
import os
import subprocess
import sys

def test_bench_quick_northstar_emits_all_three_metrics():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # sitecustomize force-registers the axon TPU backend whenever
    # PALLAS_AXON_POOL_IPS is set, OVERRIDING JAX_PLATFORMS=cpu — drop it
    # so the subprocess really runs on CPU (discovered round 5: every
    # subprocess test was silently hitting the TPU relay)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # --northstar on: quick mode is excluded from `auto` (the driver runs
    # full mode), so force the composition explicitly
    proc = subprocess.run(
        [sys.executable, "bench.py", "--quick", "--batch", "2",
         "--skip-baseline", "--northstar", "on", "--iters", "2",
         "--repeats", "1", "--vqa_samples", "3"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    out = json.loads(lines[-1])

    # caption headline
    assert out["unit"] == "images/sec/chip"
    assert out["value"] > 0
    assert "sweep" in out and "harness" in out

    # nested train north-star
    tr = out["train"]
    assert "error" not in tr, tr
    assert tr["unit"] == "images/sec/chip"
    assert tr["value"] > 0
    assert tr["harness"] == "train-scan-v2"
    assert tr["steps_per_dispatch"] >= 2

    # nested VQA latency distribution
    vqa = out["vqa"]
    assert "error" not in vqa, vqa
    assert vqa["unit"] == "ms/image"
    assert vqa["samples"] >= 3
    assert set(vqa) >= {"p90_ms", "mean_ms", "min_ms", "relay_overhead_ms"}
