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

    # ---- level-major renumbering -----------------------------------------
    # Nodes are reordered so each forward level occupies a CONTIGUOUS id
    # range. Consequences the device code exploits: (a) a level's state
    # update is a dense row-slice write instead of a scatter; (b) all
    # message sources of level l have ids < level_start[l], so gathers can
    # skip everything past that prefix. ``node_perm`` maps new->original ids
    # (the public API uses it to return embeddings in input order).
    node_perm = np.argsort(fwd, kind="stable").astype(np.int64)  # new -> orig
    inv_perm = np.empty(n, dtype=np.int64)
    inv_perm[node_perm] = np.arange(n)
    gate = gate[node_perm]
    prob = prob[node_perm]
    graph_id = graph_id[node_perm]
    fwd = fwd[node_perm]
    if e:
        edge = inv_perm[edge]
    if p:
        tt_pairs = inv_perm[tt_pairs]

    # ---- level tables -------------------------------------------------
    max_level = int(fwd.max()) if n else 0  # update levels are 1..max_level
    lv_real = max_level
    # nodes / in-edges grouped by (destination) level, all vectorized
    node_order = np.argsort(fwd, kind="stable")
    lv_counts = np.bincount(fwd, minlength=max_level + 1)
    dst_level = fwd[edge[1]] if e else np.zeros(0, np.int32)
    edge_order = np.argsort(dst_level, kind="stable") if e else np.zeros(0, np.int64)
    ecounts = np.bincount(dst_level, minlength=max_level + 1) if e else np.zeros(max_level + 1, np.int64)

    np_real = int(lv_counts[1:].max()) if max_level else 0
    ep_real = int(ecounts[1:].max()) if max_level else 0

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

    perm_pad = np.arange(N, dtype=np.int32)
    perm_pad[:n] = node_perm
    inv_pad = np.arange(N, dtype=np.int32)
    inv_pad[:n] = inv_perm
    out = {
        "node_perm": perm_pad,   # new id -> original id (padding: identity)
        "node_inv": inv_pad,     # original id -> new id
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

    # vectorized fill: rank-within-level for nodes and edges (no python loop)
    slot_of = np.zeros(N, dtype=np.int32)
    lv_start = np.full(L, n, dtype=np.int32)  # first node id of each level
    if lv_real:
        upd_nodes = node_order[int(lv_counts[0]) :]          # sorted by level
        lv_of_node = fwd[upd_nodes].astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(lv_counts[1:])])
        lv_start[:lv_real] = (int(lv_counts[0]) + starts[:lv_real]).astype(np.int32)
        rank = np.arange(len(upd_nodes)) - starts[lv_of_node - 1]
        lv_nodes[lv_of_node - 1, rank] = upd_nodes
        lv_node_valid[lv_of_node - 1, rank] = True
        slot_of[upd_nodes] = rank.astype(np.int32)
        if e:
            eidx = edge_order[int(ecounts[0]) :]
            lv_of_edge = dst_level[eidx].astype(np.int64)
            estarts = np.concatenate([[0], np.cumsum(ecounts[1:])])
            erank = np.arange(len(eidx)) - estarts[lv_of_edge - 1]
            lv_edge_src[lv_of_edge - 1, erank] = edge[0][eidx]
            lv_edge_dst_slot[lv_of_edge - 1, erank] = slot_of[edge[1][eidx]]
            lv_edge_valid[lv_of_edge - 1, erank] = True
            lv_edge_id[lv_of_edge - 1, erank] = eidx
    out.update(
        lv_nodes=lv_nodes,
        lv_node_valid=lv_node_valid,
        lv_edge_src=lv_edge_src,
        lv_edge_dst_slot=lv_edge_dst_slot,
        lv_edge_valid=lv_edge_valid,
        lv_edge_id=lv_edge_id,
        lv_start=lv_start,
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
    if len(blk):
        starts = np.concatenate([[0], np.cumsum(counts)])
        rank = np.arange(len(blk)) - starts[blk]
        src[blk, rank] = other_s
        slot[blk, rank] = by_s - blk * BLOCK_D
        valid[blk, rank] = True
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


_PAD_FILL = {  # fill values preserving batch invariants when extending dims
    "gate": 0, "node_valid": False, "forward_level": 0, "graph_id": -1, "prob": 0.0,
    "edge_src": 0, "edge_dst": 0, "edge_valid": False,
    "tt_pair_a": 0, "tt_pair_b": 0, "tt_valid": False, "tt_dis": 0.0,
    "lv_node_valid": False, "lv_edge_dst_slot": 0, "lv_edge_valid": False,
    "lv_upd": 0, "fa_slot": 0, "fa_valid": False, "ra_slot": 0, "ra_valid": False,
    "deg_in": 0.0, "deg_out": 0.0,
}
_PAD_DUMP = {"lv_nodes", "lv_edge_src", "fa_src", "ra_src"}  # point at dump node
_PAD_LASTE = {"lv_edge_id"}  # point at last (padding) edge


def _pad_batch_to(batch: dict, shapes: dict) -> dict:
    """Extend a collated batch's padded dims (fills keep masks false and
    indices on the dump slots) — cheaper than re-collating a shard."""
    dump = int(batch["n_nodes"])
    out = {}
    for k, v in batch.items():
        tgt = shapes.get(k)
        if tgt is None or not isinstance(v, np.ndarray) or v.shape == tgt:
            out[k] = v
            continue
        pad = [(0, t - s) for s, t in zip(v.shape, tgt)]
        if k in ("node_perm", "node_inv"):
            ext = np.arange(v.shape[0], tgt[0], dtype=v.dtype)
            out[k] = np.concatenate([v, ext])
            continue
        if k in _PAD_DUMP or k == "lv_start":
            fill = dump
        elif k in _PAD_LASTE:
            fill = shapes["edge_src"][0] - 1
        else:
            fill = _PAD_FILL.get(k, 0)
        out[k] = np.pad(v, pad, constant_values=fill)
    return out


def collate_shards(shards: list[list[CircuitGraph]]) -> dict:
    """Collate one shard per device with COMMON padded dims and stack a
    leading 'dp' axis — the host-side half of shard_map data parallelism
    (the DistributedSampler equivalent, trainer.py:179-192)."""
    batches = [collate(s) for s in shards]
    shapes = {
        k: tuple(max(b[k].shape[i] for b in batches) for i in range(b0[k].ndim))
        if isinstance((b0 := batches[0])[k], np.ndarray) else None
        for k in batches[0]
    }
    shapes = {k: v for k, v in shapes.items() if v is not None}
    batches = [_pad_batch_to(b, shapes) for b in batches]
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def batch_shape_key(batch: dict) -> tuple:
    """Hashable static-shape signature (jit cache key for diagnostics)."""
    return tuple(
        (k, v.shape) for k, v in sorted(batch.items()) if isinstance(v, np.ndarray)
    )
