#!/bin/bash
# Round-3 TPU measurement battery. Run from the repo root when the TPU
# SUPERSEDED by run_r4_battery.sh (set -euo pipefail, loud stage failures);
# kept for the round-3 record. Stage scripts are the committed benchmarks/*.py.
# tunnel is healthy; each stage appends to benchmarks/r3_battery.log and
# refreshes the committed JSON artifacts.
set -x
cd "$(dirname "$0")/.."
LOG=benchmarks/r3_battery.log
{
  echo "=== $(date -u) A/B: stripe vs take @128 (MaIR + MaIRUNet) ==="
  timeout 3600 python benchmarks/ab_stripe.py 2>&1 | grep -v WARN | tail -8
  echo "=== $(date -u) MaIR rest-bucket decomposition ==="
  timeout 3600 python benchmarks/decomp_mair2.py 2>&1 | grep -v WARN | tail -10
  echo "=== $(date -u) large shapes @384 ==="
  timeout 5400 python benchmarks/large_stripe.py 2>&1 | grep -v WARN | tail -6
  echo "=== $(date -u) benchmark_all (writes benchmarks/results.json) ==="
  timeout 7200 python scripts/benchmark_all.py 2>&1 | grep -v WARN | tail -30
  echo "=== $(date -u) benchmark_all --large ==="
  timeout 7200 python scripts/benchmark_all.py --large 2>&1 | grep -v WARN | tail -20
  echo "=== $(date -u) validate_serving (writes benchmarks/serving_deltas.json) ==="
  timeout 7200 python scripts/validate_serving.py 2>&1 | grep -v WARN | tail -30
  echo "=== $(date -u) bench.py ==="
  timeout 3600 python bench.py 2>&1 | grep -v WARN | tail -5
  echo "=== $(date -u) DONE ==="
} >> "$LOG" 2>&1
