"""Topological (longest-path) levelization of circuit DAGs.

Vectorized-numpy replacement for the reference's ``top_sort`` /
``return_order_info`` (DG_VAE/deepgate/utils/dag_utils.py:10-37,80-88),
which re-scans every edge per level via ``numpy.isin``. This version is a
Kahn propagation over in-degrees: O(V + E) total instead of O(levels * E).

A node's level is the length of the longest path from any source to it —
identical semantics to the reference (a node is placed once all of its
parents are placed). Consequently for every edge u->v:
``level[u] < level[v]``, which is the invariant the level-scan forward pass
relies on (all message sources are finalized before their destinations).
"""
from __future__ import annotations

import numpy as np


def levelize(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Longest-path level per node.

    Args:
      edge_index: [2, E] int array (src row 0, dst row 1).
      num_nodes: node count.
    Returns:
      [num_nodes] int32 levels (sources = 0).
    Raises:
      ValueError on cycles (never terminates in the reference; we fail fast).
    """
    level = np.zeros(num_nodes, dtype=np.int32)
    if edge_index.size == 0:
        return level
    try:  # C++ fast path (mgvae_tpu/native); identical semantics
        from ..native import levelize_native

        out = levelize_native(np.asarray(edge_index), num_nodes)
        if out is not None:
            return out
    except ImportError:
        pass
    src = np.asarray(edge_index[0], dtype=np.int64)
    dst = np.asarray(edge_index[1], dtype=np.int64)
    indeg = np.bincount(dst, minlength=num_nodes).astype(np.int64)

    # CSR of out-edges for frontier expansion
    order = np.argsort(src, kind="stable")
    src_sorted, dst_sorted = src[order], dst[order]
    out_ptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(np.bincount(src_sorted, minlength=num_nodes), out=out_ptr[1:])

    frontier = np.flatnonzero(indeg == 0)
    placed = frontier.size
    cur = 0
    while frontier.size:
        # gather all out-edges of the frontier
        starts, ends = out_ptr[frontier], out_ptr[frontier + 1]
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            break
        # flat indices of the frontier's out-edge block
        idx = np.repeat(starts, counts) + (
            np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        children = dst_sorted[idx]
        np.subtract.at(indeg, children, 1)
        ready = np.unique(children[indeg[children] == 0])
        cur += 1
        level[ready] = cur
        frontier = ready
        placed += ready.size
    if placed != num_nodes and (indeg > 0).any():
        raise ValueError("levelize: graph contains a cycle")
    return level


def return_order_info(edge_index: np.ndarray, num_nodes: int):
    """API-parity port of dag_utils.return_order_info (dag_utils.py:80-88).

    Returns (forward_level, forward_index, backward_level, backward_index);
    the index arrays are arange(num_nodes) exactly as in the reference.
    """
    forward_level = levelize(edge_index, num_nodes)
    backward_level = levelize(np.stack([edge_index[1], edge_index[0]]) if edge_index.size else edge_index, num_nodes)
    idx = np.arange(num_nodes, dtype=np.int64)
    return forward_level, idx, backward_level, idx.copy()
