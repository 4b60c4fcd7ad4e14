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
from mgvae_tpu.train.trainer_early_stop import EarlyTrainer  # noqa: F401
from mgvae_tpu.data.dataset import Dataset  # noqa: F401
from mgvae_tpu.train.trainer_balancer import BalancerTrainer  # noqa: F401
from mgvae_tpu.train.trainer_gradnorm import GradNormTrainer  # noqa: F401
from mgvae_tpu.train.gradnorm import GradNormConfig, BalancerConfig  # noqa: F401
from mgvae_tpu.utils.logger import AverageMeter, Logger  # noqa: F401


def parse_pyg_mlpgate(x, edge_index, y, tt_dis, tt_pair_index, num_gate_types=6):
    """Reference-signature graph constructor (parser_func.py:43 /
    parser_func_others.py:43): x is the [N, >=2] node table with gate ids in
    column 1; returns a CircuitGraph. Layout quirks (transposed vs raw
    edge/pair storage) must be resolved by the caller, exactly as in the
    reference where the two parser_func variants differ."""
    import numpy as _np

    x = _np.asarray(x)
    return build_graph(
        "parsed",
        x[:, 1].astype(_np.int32),
        _np.asarray(edge_index).reshape(2, -1),
        _np.asarray(y, dtype=_np.float32).reshape(-1),
        _np.asarray(tt_pair_index).reshape(2, -1) if _np.asarray(tt_pair_index).size else None,
        _np.asarray(tt_dis, dtype=_np.float32).reshape(-1) if _np.asarray(tt_dis).size else None,
    )
