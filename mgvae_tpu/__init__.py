"""mgvae_tpu: TPU-native rebuild of 959AI994/Multi-Gate-VAE.

A multi-modal circuit representation-learning framework (AIG/XAG/MIG/XMG
netlists -> per-gate structural/functional embeddings) redesigned for TPU:
JAX/XLA/Pallas compute, static-shape level-bucketed batches, lax.scan level
recurrence, stacked gate-type experts, shard_map data parallelism.

Public surface (parity with the reference's deepgate package,
DG_VAE/deepgate/__init__.py:1-11):
"""

from .api import Model
from .data.aiger import AigParser
from .data.bench import BenchParser
from .data.graph import MODALITY_GATES, CircuitGraph, build_graph
from .data.npz import NpzParser
from .data.synthetic import random_circuit
from .data.batching import collate, collate_shards
from .models.dg_ae import DGConfig, forward, init_params
from .train.trainer import Trainer

__version__ = "0.1.0"

__all__ = [
    "Model", "Trainer", "NpzParser", "BenchParser", "AigParser",
    "CircuitGraph", "DGConfig", "forward", "init_params", "collate",
    "collate_shards", "build_graph", "random_circuit", "MODALITY_GATES",
    "__version__",
]
