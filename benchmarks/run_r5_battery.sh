#!/bin/bash
# Round-5 TPU measurement battery. Run from anywhere when the TPU tunnel is
# healthy; each stage appends to benchmarks/r5_battery.log and refreshes the
# committed JSON artifacts — every committed number is reproducible from
# this one script (VERDICT r4 item 9).
set -euo pipefail
set -x
cd "$(dirname "$0")/.."
LOG=benchmarks/r5_battery.log

stage() {  # stage <timeout-s> <label> <cmd...>
  local t="$1" label="$2"; shift 2
  echo "=== $(date -u) ${label} ===" >> "$LOG"
  if ! timeout "$t" "$@" 2>&1 | grep -v WARN | tail -40 >> "$LOG"; then
    echo "STAGE FAILED: ${label}" | tee -a "$LOG"
    exit 1
  fi
}

# Essential artifacts first (results/engine_system/serving_deltas/bench),
# micro-probes and A/Bs after — a truncated run still refreshes every
# committed JSON the README/BASELINE tables cite.
stage 7200 "benchmark_all (writes benchmarks/results.json)" python scripts/benchmark_all.py
stage 7200 "benchmark_all --large" python scripts/benchmark_all.py --large
stage 7200 "engine system-level battery (writes engine_system.json)" python benchmarks/engine_system.py
stage 10800 "validate_serving, all six families (writes serving_deltas.json)" python scripts/validate_serving.py
stage 3600 "bench.py" python bench.py
stage 3600 "VPU/MXU micro-roofline (writes benchmarks/micro_vpu.json)" python benchmarks/micro_vpu.py
stage 3600 "lane-layout probe (MobileNet HBM story)" python benchmarks/probe_lane_layout.py
stage 3600 "MobileNet micro-op decomposition" python benchmarks/micro_mobilenet.py
stage 1800 "analytic MobileNet roofline (writes roofline_mobilenet.json)" python benchmarks/roofline_mobilenet.py
stage 3600 "A/B: phase-IO FPN-MobileNet serving" python benchmarks/ab_phase_io.py
stage 3600 "A/B: packed Inception tail" python benchmarks/ab_inception_tail.py
stage 5400 "A/B: folded FPN tail (fold2 alone; superseded by phase path)" python benchmarks/ab_fold_tail.py
echo "=== $(date -u) DONE ===" >> "$LOG"
