#!/bin/bash
# Rerun of the round-4 on-chip phases with the struct-kernel hardware gate
# in place (bench first: the official metric). Fresh process per phase.
set -u
cd "$(dirname "$0")/.."
mkdir -p tmp/r4_onchip
phase() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "tmp/r4_onchip/$name.log" 2>&1
  echo "rc=$?"
  tail -3 "tmp/r4_onchip/$name.log"
}
phase bench 3600 python bench.py
phase mp_onchip2 1200 python tmp/exp_r4_mp_onchip.py
phase roofline2 1800 python tmp/exp_r4_roofline.py
phase giant_bf16 3000 python tmp/exp_r4_giant_bf16.py
echo "=== all phases done ==="
