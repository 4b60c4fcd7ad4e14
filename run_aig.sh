#!/bin/bash
# TPU launch for AIG (reference: run_aig.sh used torchrun + NCCL; here one JAX
# process drives all local TPU devices via shard_map data parallelism).
# Multi-host: set JAX_COORDINATOR_ADDRESS etc. and run one process per host.
python train.py \
  --exp_id DG_AE_NORM_AIG \
  --model DG_AE \
  --batch_size 16 \
  --layernorm \
  --type aig \
  --distributed \
  "$@"
