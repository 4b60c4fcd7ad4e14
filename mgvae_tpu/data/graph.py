"""Host-side circuit graph container (numpy) + constructors.

Replaces the reference's PyG ``OrderedData`` + ``parse_pyg_mlpgate``
(DG_VAE/deepgate/parser_func.py:10-70, parser_func_others.py:10-79) with a
plain numpy dataclass: no torch, no PyG. Batching for the device is done
separately in ``batching.py`` (the TPU analogue of PyG's disjoint-union
collation driven by ``__inc__``/``__cat_dim__``).

Gate-id conventions (SURVEY.md §8 quirk 4):
  AIG:               {PI: 0, AND: 1, NOT: 2}
  MIG/XMG/XAG/.bench {INPUT: 0, MAJ: 1, NOT: 2, AND: 3, OR: 4, XOR: 5}
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .levelize import levelize

NUM_GATE_TYPES = 6

# gate -> expert sets per modality (reference model masks):
#   aig: AND=1, NOT=2            (dg_ae_model_aig.py:67-68)
#   mig: NOT=2, AND=3, OR=4, MAJ=1  (dg_ae_model_mig.py:79-82)
#   xag: AND=3, NOT=2, XOR=5     (dg_ae_model_xag.py)
#   xmg: AND=3, NOT=2, XOR=5, MAJ=1, OR=4 (dg_ae_model_xmg.py)
MODALITY_GATES = {
    "aig": (1, 2),
    "mig": (2, 3, 4, 1),
    "xag": (3, 2, 5),
    "xmg": (3, 2, 5, 1, 4),
}


@dataclasses.dataclass
class CircuitGraph:
    """One parsed circuit. All arrays are numpy; edges are directed src->dst."""

    name: str
    gate: np.ndarray          # [N] int32 gate-type ids
    edge_index: np.ndarray    # [2, E] int64
    forward_level: np.ndarray   # [N] int32
    backward_level: np.ndarray  # [N] int32
    prob: np.ndarray          # [N] float32 signal probability labels
    tt_pair_index: np.ndarray  # [2, P] int64 node pairs with truth-table labels
    tt_dis: np.ndarray        # [P] float32 pairwise truth-table distance/similarity
    # DeepGate2-style extras carried by the legacy Dataset front-end
    # (data/dataset.py; the reference's dataset.py labels): optional.
    min_tt_dis: np.ndarray | None = None   # [P] float32
    rc_pair_index: np.ndarray | None = None  # [2, R] int64 reconvergence pairs
    is_rc: np.ndarray | None = None        # [R] float32 0/1 labels

    @property
    def num_nodes(self) -> int:
        return int(self.gate.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    @property
    def num_levels(self) -> int:
        return int(self.forward_level.max()) + 1 if self.num_nodes else 0

    # API parity with OrderedData consumers (BenchParser.read_bench masks,
    # parser.py:163-165)
    @property
    def forward_index(self) -> np.ndarray:
        return np.arange(self.num_nodes, dtype=np.int64)

    @property
    def backward_index(self) -> np.ndarray:
        return np.arange(self.num_nodes, dtype=np.int64)

    @property
    def PIs(self) -> np.ndarray:
        return np.flatnonzero((self.forward_level == 0) & (self.backward_level != 0))

    @property
    def POs(self) -> np.ndarray:
        return np.flatnonzero((self.backward_level == 0) & (self.forward_level != 0))

    @property
    def no_connect(self) -> np.ndarray:
        return np.flatnonzero((self.forward_level == 0) & (self.backward_level == 0))

    @property
    def x(self) -> np.ndarray:
        """One-hot node features, reconstructed on demand (construct_node_feature
        parity, utils/data_utils.py:77-85)."""
        x = np.zeros((self.num_nodes, NUM_GATE_TYPES), dtype=np.float32)
        x[np.arange(self.num_nodes), self.gate] = 1.0
        return x


def build_graph(
    name: str,
    gate: np.ndarray,
    edge_index: np.ndarray,
    prob: np.ndarray | None = None,
    tt_pair_index: np.ndarray | None = None,
    tt_dis: np.ndarray | None = None,
) -> CircuitGraph:
    """parse_pyg_mlpgate equivalent: levelize + package.

    ``tt_pair_index`` must already be [2, P] — the storage-layout quirk
    (AIG npz stores [2,P] raw, others store [P,2] and are transposed on
    load; SURVEY.md §8 quirk 5) is handled by the npz loader, not here.
    """
    gate = np.asarray(gate, dtype=np.int32).reshape(-1)
    n = gate.shape[0]
    edge_index = np.asarray(edge_index, dtype=np.int64).reshape(2, -1)
    fwd = levelize(edge_index, n)
    bwd = levelize(edge_index[::-1] if edge_index.size else edge_index, n)
    if prob is None:
        prob = np.zeros(n, dtype=np.float32)
    if tt_pair_index is None:
        tt_pair_index = np.zeros((2, 0), dtype=np.int64)
    if tt_dis is None:
        tt_dis = np.zeros(0, dtype=np.float32)
    return CircuitGraph(
        name=name,
        gate=gate,
        edge_index=edge_index,
        forward_level=fwd,
        backward_level=bwd,
        prob=np.asarray(prob, dtype=np.float32).reshape(-1),
        tt_pair_index=np.asarray(tt_pair_index, dtype=np.int64).reshape(2, -1),
        tt_dis=np.asarray(tt_dis, dtype=np.float32).reshape(-1),
    )


def add_edge_attr(num_edge: int, ehs: int, ll_diff=1):
    """Sinusoidal positional edge attributes (utils/data_utils.py:101-112):
    even dims sin, odd dims cos of ll_diff / 10000^(2i/ehs)."""
    import math

    out = np.zeros((num_edge, ehs), dtype=np.float32)
    for i in range(0, ehs, 2):
        out[:, i] = math.sin(ll_diff / (10000 ** ((2 * i) / ehs)))
        if i + 1 < ehs:
            out[:, i + 1] = math.cos(ll_diff / (10000 ** ((2 * (i + 1)) / ehs)))
    return out


def one_hot(idx, length: int):
    """utils/data_utils.py:67-73 parity."""
    idx = np.asarray(idx, dtype=np.int64).reshape(-1)
    out = np.zeros((len(idx), length), dtype=np.float32)
    out[np.arange(len(idx)), idx] = 1.0
    return out


def construct_node_feature(x, num_gate_types: int):
    """utils/data_utils.py:77-85 parity: one-hot of gate-id column 1."""
    return one_hot(np.asarray(x)[:, 1].astype(np.int64), num_gate_types)
