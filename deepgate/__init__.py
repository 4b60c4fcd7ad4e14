"""Drop-in compatibility shim: ``import deepgate`` works like the reference.

The reference exports Model/Trainer/NpzParser/BenchParser and utils from
DG_VAE/deepgate/__init__.py:1-11. Note: in the reference, four
``from .dg_ae_model_* import Model`` lines shadow each other so
``deepgate.Model`` is the XAG model (SURVEY.md §8 quirk 2) — mgvae_tpu.Model
defaults to modality='xag' accordingly.
"""
from mgvae_tpu import (  # noqa: F401
    AigParser,
    BenchParser,
    CircuitGraph,
    DGConfig,
    Model,
    NpzParser,
    Trainer,
    build_graph,
    collate,
)
from mgvae_tpu.data.levelize import levelize, return_order_info  # noqa: F401
from mgvae_tpu.utils.logger import AverageMeter, Logger  # noqa: F401
