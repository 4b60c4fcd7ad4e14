"""Static-shape, level-bucketed batch construction (host side).

This is the TPU replacement for three reference mechanisms at once:
  1. PyG disjoint-union batching (OrderedData.__inc__/__cat_dim__,
     parser_func.py:28-40): graphs are concatenated with node offsets.
  2. The per-level python ``subgraph`` edge filtering in the model forward
     (dg_ae_model_mig.py:89-126 + utils/dag_utils.py:91-105): edges are
     pre-sorted by destination level into padded [L, Ep] tables so the
     device-side forward is a single ``lax.scan`` with no dynamic shapes.
  3. The O(N^2) ``train_neg_adj_mask`` allocation (preprocessing.py:56):
     gone entirely; negative sampling happens in-graph with fixed shapes.

All dims are rounded up to ~25%-granular buckets (4/5/6/7 * 2^k) so repeated
batches hit the jit cache instead of triggering recompilation storms
(SURVEY.md §7.4 hard part #1).

Valid nodes are contiguous at the front ([0, n_nodes)); at least one padding
node always exists and slot ``n_nodes`` is the scatter dump for padded
level-table entries.
"""
from __future__ import annotations

import numpy as np

from .graph import CircuitGraph


BLOCK_D = 128  # dst-block width for blocked-CSR aggregation (one MXU tile)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket(x: int, minimum: int = 8) -> int:
    """Smallest m * 2^e >= x with m in {4,5,6,7} (<= 25% padding waste)."""
    if x <= minimum:
        return minimum
    e = max(0, (x - 1).bit_length() - 3)
    for m in (4, 5, 6, 7, 8):
        v = m << e
        if v >= x:
            return v
    raise AssertionError


def collate(graphs: list[CircuitGraph], dims: dict | None = None) -> dict:
    """Disjoint-union + pad a list of circuits into one static-shape batch.

    Returns a dict of numpy arrays (see keys below); convert with
    jax.tree.map(jnp.asarray, batch) or feed directly to jitted fns.

    ``dims``: optional {'N','E','P','L','NP','EP'} overrides so several
    shards (one per device) can share identical padded shapes.
    """
    assert graphs, "empty batch"
    n_graphs = len(graphs)
    sizes = np.array([g.num_nodes for g in graphs], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    n = int(offsets[-1])

    gate = np.concatenate([g.gate for g in graphs])
    fwd = np.concatenate([g.forward_level for g in graphs]).astype(np.int32)
    prob = np.concatenate([g.prob for g in graphs])
    graph_id = np.repeat(np.arange(n_graphs, dtype=np.int32), sizes)

    edge = np.concatenate(
        [g.edge_index + offsets[i] for i, g in enumerate(graphs)], axis=1
    ) if any(g.num_edges for g in graphs) else np.zeros((2, 0), dtype=np.int64)
    e = edge.shape[1]

    tt_pairs = np.concatenate(
        [g.tt_pair_index + offsets[i] for i, g in enumerate(graphs)], axis=1
    ) if any(g.tt_pair_index.size for g in graphs) else np.zeros((2, 0), dtype=np.int64)
    tt_dis = np.concatenate([g.tt_dis for g in graphs]) if tt_pairs.size else np.zeros(0, np.float32)
    p = tt_pairs.shape[1]

    # ---- level tables -------------------------------------------------
    max_level = int(fwd.max()) if n else 0  # update levels are 1..max_level
    lv_real = max_level
    # nodes per level (levels >= 1)
    node_order = np.argsort(fwd, kind="stable")
    lv_counts = np.bincount(fwd, minlength=max_level + 1)
    lv_node_lists = []
    start = int(lv_counts[0])
    for l in range(1, max_level + 1):
        cnt = int(lv_counts[l])
        lv_node_lists.append(np.sort(node_order[start : start + cnt]))
        start += cnt
    # in-edges grouped by destination level
    dst_level = fwd[edge[1]] if e else np.zeros(0, np.int32)
    lv_edge_lists = []
    if e:
        edge_order = np.argsort(dst_level, kind="stable")
        ecounts = np.bincount(dst_level, minlength=max_level + 1)
        estart = int(ecounts[0])  # edges into level-0 nodes cannot exist
        for l in range(1, max_level + 1):
            cnt = int(ecounts[l])
            lv_edge_lists.append(edge_order[estart : estart + cnt])
            estart += cnt
    else:
        lv_edge_lists = [np.zeros(0, np.int64) for _ in range(max_level)]

    np_real = max((len(x) for x in lv_node_lists), default=0)
    ep_real = max((len(x) for x in lv_edge_lists), default=0)

    # ---- padded dims ---------------------------------------------------
    dims = dims or {}
    # N is a multiple of the dst-block size so whole-graph aggregation can
    # run as blocked dense matmuls (see agg_* tables below).
    N = dims.get("N", _round_up(bucket(n + 1), BLOCK_D))
    E = dims.get("E", bucket(e))
    P = dims.get("P", bucket(p))
    L = dims.get("L", bucket(max(lv_real, 1)))
    NP = dims.get("NP", bucket(max(np_real, 1)))
    EP = dims.get("EP", bucket(max(ep_real, 1)))
    assert N > n and E >= e and P >= p and L >= lv_real and NP >= np_real and EP >= ep_real, (
        "dims overrides too small for this shard"
    )
    dump = n  # first padding node

    out = {
        "gate": _pad(gate.astype(np.int32), N),
        "node_valid": _mask(n, N),
        "forward_level": _pad(fwd, N),
        "graph_id": _pad(graph_id, N, fill=-1),
        "prob": _pad(prob.astype(np.float32), N),
        "edge_src": _pad(edge[0].astype(np.int32), E),
        "edge_dst": _pad(edge[1].astype(np.int32), E),
        "edge_valid": _mask(e, E),
        "tt_pair_a": _pad(tt_pairs[0].astype(np.int32), P),
        "tt_pair_b": _pad(tt_pairs[1].astype(np.int32), P),
        "tt_valid": _mask(p, P),
        "tt_dis": _pad(tt_dis.astype(np.float32), P),
        "n_nodes": np.int32(n),
        "n_edges": np.int32(e),
        "n_tt": np.int32(p),
        "n_graphs": np.int32(n_graphs),
    }

    lv_nodes = np.full((L, NP), dump, dtype=np.int32)
    lv_node_valid = np.zeros((L, NP), dtype=bool)
    lv_edge_src = np.full((L, EP), dump, dtype=np.int32)
    lv_edge_dst_slot = np.zeros((L, EP), dtype=np.int32)
    lv_edge_valid = np.zeros((L, EP), dtype=bool)
    lv_edge_id = np.full((L, EP), E - 1, dtype=np.int32)  # index into edge arrays
    slot_of = np.zeros(N, dtype=np.int32)
    for i in range(lv_real):
        nodes = lv_node_lists[i]
        k = len(nodes)
        lv_nodes[i, :k] = nodes
        lv_node_valid[i, :k] = True
        slot_of[nodes] = np.arange(k, dtype=np.int32)
        eidx = lv_edge_lists[i]
        m = len(eidx)
        lv_edge_src[i, :m] = edge[0][eidx]
        lv_edge_dst_slot[i, :m] = slot_of[edge[1][eidx]]
        lv_edge_valid[i, :m] = True
        lv_edge_id[i, :m] = eidx
    out.update(
        lv_nodes=lv_nodes,
        lv_node_valid=lv_node_valid,
        lv_edge_src=lv_edge_src,
        lv_edge_dst_slot=lv_edge_dst_slot,
        lv_edge_valid=lv_edge_valid,
        lv_edge_id=lv_edge_id,
    )

    # ---- blocked-CSR whole-graph aggregation tables ----------------------
    # The struct encoder sums messages over all in-edges (and, reversed,
    # all out-edges) every round. TPU scatter-add serializes; instead we
    # block destination nodes into BLOCK_D-wide tiles and pad each tile's
    # edge list, so the sum becomes a batched one-hot matmul on the MXU
    # (see models/encoder.py). EBF/EBR = max per-block edge count, bucketed.
    nb = N // BLOCK_D
    fa_src, fa_slot, fa_valid, ebf = _blocked_tables(
        by=edge[1] if e else np.zeros(0, np.int64),
        other=edge[0] if e else np.zeros(0, np.int64),
        nb=nb, dims_key=dims.get("EBF"), dump=dump,
    )
    ra_src, ra_slot, ra_valid, ebr = _blocked_tables(
        by=edge[0] if e else np.zeros(0, np.int64),
        other=edge[1] if e else np.zeros(0, np.int64),
        nb=nb, dims_key=dims.get("EBR"), dump=dump,
    )
    deg_in = np.zeros(N, np.float32)
    deg_out = np.zeros(N, np.float32)
    if e:
        deg_in[: n] = np.bincount(edge[1], minlength=n)[:n]
        deg_out[: n] = np.bincount(edge[0], minlength=n)[:n]
    out.update(
        fa_src=fa_src, fa_slot=fa_slot, fa_valid=fa_valid,
        ra_src=ra_src, ra_slot=ra_slot, ra_valid=ra_valid,
        deg_in=deg_in, deg_out=deg_out,
    )
    return out


def _blocked_tables(by, other, nb, dims_key, dump):
    """Group edges by ``by``-node block of width BLOCK_D; returns padded
    [nb, Eb] tables: message-source node, local slot (by - block_start),
    valid mask."""
    order = np.argsort(by, kind="stable")
    by_s, other_s = by[order], other[order]
    blk = (by_s // BLOCK_D).astype(np.int64)
    counts = np.bincount(blk, minlength=nb) if len(blk) else np.zeros(nb, np.int64)
    eb_real = int(counts.max()) if len(counts) else 0
    eb = dims_key if dims_key is not None else bucket(max(eb_real, 1))
    assert eb >= eb_real, "EBF/EBR override too small"
    src = np.full((nb, eb), dump, dtype=np.int32)
    slot = np.zeros((nb, eb), dtype=np.int32)
    valid = np.zeros((nb, eb), dtype=bool)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for b in range(nb):
        s, c = int(starts[b]), int(counts[b])
        if c == 0:
            continue
        src[b, :c] = other_s[s : s + c]
        slot[b, :c] = by_s[s : s + c] - b * BLOCK_D
        valid[b, :c] = True
    return src, slot, valid, eb


def _pad(a: np.ndarray, size: int, fill=0) -> np.ndarray:
    out = np.full((size,) + a.shape[1:], fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


def _mask(k: int, size: int) -> np.ndarray:
    m = np.zeros(size, dtype=bool)
    m[:k] = True
    return m


def natural_dims(graphs: list[CircuitGraph]) -> dict:
    """The padded dims collate() would pick for this shard."""
    b = collate(graphs)
    return {
        "N": b["gate"].shape[0],
        "E": b["edge_src"].shape[0],
        "P": b["tt_pair_a"].shape[0],
        "L": b["lv_nodes"].shape[0],
        "NP": b["lv_nodes"].shape[1],
        "EP": b["lv_edge_src"].shape[1],
        "EBF": b["fa_src"].shape[1],
        "EBR": b["ra_src"].shape[1],
    }


def collate_shards(shards: list[list[CircuitGraph]]) -> dict:
    """Collate one shard per device with COMMON padded dims and stack a
    leading 'dp' axis — the host-side half of shard_map data parallelism
    (the DistributedSampler equivalent, trainer.py:179-192)."""
    all_dims = [natural_dims(s) for s in shards]
    dims = {k: max(d[k] for d in all_dims) for k in all_dims[0]}
    batches = [collate(s, dims=dims) for s in shards]
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def batch_shape_key(batch: dict) -> tuple:
    """Hashable static-shape signature (jit cache key for diagnostics)."""
    return tuple(
        (k, v.shape) for k, v in sorted(batch.items()) if isinstance(v, np.ndarray)
    )
