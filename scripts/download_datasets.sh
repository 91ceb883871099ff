#!/usr/bin/env bash
# Thin wrapper kept for CLI parity with the reference harness.
set -e
cd "$(dirname "$0")/.."
python scripts/download.py datasets "$@"
