#!/bin/bash
# Round-5 on-chip sweep: {tier on/off} x {one-hot chunk width}.
# Fresh process per arm (CLAUDE.md: repeated Pallas compiles in one process
# can wedge the tunnel); run with NOTHING else on the 1-core host.
cd /root/repo
mkdir -p tmp/r5_onchip
for tier in on off; do
  for nc in default 1024 512 256; do
    tag="tier${tier}_nc${nc}"
    env_args=()
    [ "$tier" = off ] && env_args+=(MGVAE_NO_TIER=1)
    [ "$nc" != default ] && env_args+=(MGVAE_NCHUNK=$nc)
    echo "=== $tag ==="
    timeout 1200 env "${env_args[@]}" python tmp/exp_r5_chunk.py \
      > tmp/r5_onchip/$tag.log 2>&1
    grep -E "RESULT|rel" tmp/r5_onchip/$tag.log || tail -3 tmp/r5_onchip/$tag.log
  done
done
