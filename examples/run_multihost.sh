#!/bin/bash
# Multi-host launch (the torchrun replacement, run_mig.sh:8-16).
#
# One process per host; each sees its local TPU chips, jax.distributed glues
# them into one global mesh. On managed clusters (GKE TPU slices, SLURM,
# OpenMPI) the three env vars are auto-detected and can be omitted.
#
#   host0$ COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=2 PROCESS_ID=0 \
#            bash examples/run_multihost.sh
#   host1$ COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=2 PROCESS_ID=1 \
#            bash examples/run_multihost.sh
#
# Every process computes identical shuffles (shared seed) and feeds only its
# local devices' shards; gradients pmean over the global 'dp' axis; process 0
# writes checkpoints/logs. See tests/test_multihost.py for a 2-process CPU
# smoke you can run anywhere.
set -e
cd "$(dirname "$0")/.."
python train.py \
  --exp_id MH_MIG --model DG_AE --type mig \
  --batch_size 16 --layernorm --distributed \
  --stage_epochs 100,60,60 "$@"
