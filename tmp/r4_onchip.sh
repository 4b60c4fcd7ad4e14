#!/bin/bash
# Round-4 on-chip measurement playbook. Run when the tunnel is back:
#   bash tmp/r4_onchip.sh
# Each phase runs in a FRESH process with a hard timeout (a killed giant
# compile once wedged the remote compile service — never share a process
# between heavy compile experiments). Logs land in tmp/r4_onchip/.
set -u
cd "$(dirname "$0")/.."
mkdir -p tmp/r4_onchip

phase() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "tmp/r4_onchip/$name.log" 2>&1
  rc=$?
  echo "rc=$rc"
  tail -5 "tmp/r4_onchip/$name.log"
}

# 0. liveness
phase probe 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('ALIVE', jax.default_backend(), float((x@x)[0,0]))"
grep -q ALIVE tmp/r4_onchip/probe.log || { echo 'TUNNEL STILL DOWN'; exit 3; }

# 1. struct-kernel compile + on-chip parity (the big new Mosaic surface)
phase struct_parity 1200 python tmp/exp_r4_struct_onchip.py

# 2. step-kernel + mp=1 sharded-pallas on-chip number
phase mp_onchip 1200 python tmp/exp_r4_mp_onchip.py

# 3. roofline reconciliation (D=64 / D=128)
phase roofline 1800 python tmp/exp_r4_roofline.py

# 4. full bench (the official metric; also value-checks every timed path)
phase bench 3600 python bench.py

# 5. giant-circuit bf16 HBM streaming at N~102k
phase giant_bf16 3000 python tmp/exp_r4_giant_bf16.py

echo "=== all phases done ==="
