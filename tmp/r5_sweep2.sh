#!/bin/bash
# Round-5 CLEAN tier/chunk A/B: the first sweep's tier-on arms ran while
# the pytest suite shared the 1-core host (CLAUDE.md forbids this) and are
# invalid. Quiet host, fresh process per arm, K=16.
cd /root/repo
mkdir -p tmp/r5_onchip
for arm in "on_512:" "off_512:MGVAE_NO_TIER=1" "on_1536:MGVAE_NCHUNK=1536" "off_1536:MGVAE_NO_TIER=1 MGVAE_NCHUNK=1536"; do
  tag="${arm%%:*}"; envs="${arm#*:}"
  echo "=== tier_$tag ==="
  timeout 1500 env $envs python tmp/exp_r5_chunk.py > tmp/r5_onchip/clean_tier_$tag.log 2>&1
  grep -E "RESULT|rel|roundtrip" tmp/r5_onchip/clean_tier_$tag.log || tail -3 tmp/r5_onchip/clean_tier_$tag.log
done
