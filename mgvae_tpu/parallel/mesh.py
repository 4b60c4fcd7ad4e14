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
    cluster env vars are absent (single-process debug mode, README.md:29)."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
