#!/bin/bash
# Round-4 TPU measurement battery. Run from anywhere when the TPU tunnel is
# healthy; each stage appends to benchmarks/r4_battery.log and refreshes the
# committed JSON artifacts. Every stage is a committed script — a missing
# stage aborts the battery loudly (ADVICE r3 #1).
set -euo pipefail
set -x
cd "$(dirname "$0")/.."
LOG=benchmarks/r4_battery.log

stage() {  # stage <timeout-s> <label> <cmd...>
  local t="$1" label="$2"; shift 2
  echo "=== $(date -u) ${label} ===" >> "$LOG"
  if ! timeout "$t" "$@" 2>&1 | grep -v WARN | tail -30 >> "$LOG"; then
    echo "STAGE FAILED: ${label}" | tee -a "$LOG"
    exit 1
  fi
}

stage 3600 "VPU/MXU micro-roofline (writes benchmarks/micro_vpu.json)" python benchmarks/micro_vpu.py
stage 3600 "A/B: stripe vs take @128 (MaIR + MaIRUNet)" python benchmarks/ab_stripe.py
stage 3600 "MaIR rest-bucket decomposition" python benchmarks/decomp_mair2.py
stage 5400 "large shapes @384" python benchmarks/large_stripe.py
stage 7200 "benchmark_all (writes benchmarks/results.json)" python scripts/benchmark_all.py
stage 7200 "benchmark_all --large" python scripts/benchmark_all.py --large
stage 7200 "validate_serving (writes benchmarks/serving_deltas.json)" python scripts/validate_serving.py
stage 3600 "bench.py" python bench.py
echo "=== $(date -u) DONE ===" >> "$LOG"
