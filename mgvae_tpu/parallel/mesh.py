"""Device-mesh helpers: the distributed-communication backend of the rebuild.

Replaces the reference's torchrun + NCCL process-group machinery
(trainer.py:54-66, run_mig.sh:8) with JAX single/multi-controller meshes.
Collectives (gradient pmean) ride ICI inside the jitted step; multi-host
launch only needs jax.distributed.initialize() before mesh creation.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_dp_mesh(num_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the fastest interconnect axis."""
    devs = jax.devices()
    n = num_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("dp",))


def maybe_initialize_distributed():
    """Multi-host rendezvous (the torchrun equivalent). Safe no-op when the
    cluster env vars are absent (single-process debug mode, README.md:29).

    Launch recipe (per process):
      COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=N PROCESS_ID=i \
        python train.py ... --distributed
    On managed clusters (GKE TPU slices, SLURM, OpenMPI) the explicit vars
    are unnecessary: jax.distributed.initialize() auto-detects.
    """
    import os

    def env(*names):
        for n in names:
            if n in os.environ:
                return os.environ[n]
        return None

    addr = env("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    nproc = env("NUM_PROCESSES", "JAX_NUM_PROCESSES")
    pid = env("PROCESS_ID", "JAX_PROCESS_ID")
    if addr is not None:
        # fail LOUDLY on a partial launch config: silently proceeding
        # single-process would make every host chief and skip grad sync
        if nproc is None or pid is None:
            raise RuntimeError(
                "COORDINATOR_ADDRESS is set but NUM_PROCESSES/PROCESS_ID are "
                "missing — set all three (see examples/run_multihost.sh)"
            )
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(nproc), process_id=int(pid)
        )
    elif env("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE") is not None:
        # managed-cluster auto-detection; single-host tunnels (axon) set
        # TPU_WORKER_HOSTNAMES=localhost, so that var must NOT trigger this
        try:
            jax.distributed.initialize()
        except ValueError:
            pass  # not actually a multi-process launch
    return jax.process_index(), jax.process_count()
