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

from ..utils.hostmem import tune_malloc
from .graph import CircuitGraph

# batch buffers are a few MB and re-allocated per step: keep them on the
# glibc heap instead of mmap round trips (~2.4x collate_shards; see hostmem)
tune_malloc()

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


def collate(graphs: list[CircuitGraph], dims: dict | None = None, mp: int = 1,
            out: dict | None = None) -> dict:
    """Disjoint-union + pad a list of circuits into one static-shape batch.

    Returns a dict of numpy arrays (see keys below); convert with
    jax.tree.map(jnp.asarray, batch) or feed directly to jitted fns.

    ``dims``: optional {'N','E','P','L','NP','EP'} overrides so several
    shards (one per device) can share identical padded shapes.

    ``mp``: within-level model-parallel degree hint (parallel/sharded.py).
    Rounds N up to a multiple of mp*BLOCK_D and the level-edge axis EP up to
    a multiple of mp so the sharded forward's divisibility requirements hold
    by construction.

    ``out``: optional dict of preallocated arrays matching this batch's
    shapes (see collate_shards): every array key is written IN PLACE (the
    returned dict aliases them), so a caller can collate straight into views
    of a stacked multi-shard buffer with no second copy.
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

    # native C++ fast path (mgvae_tpu/native): identical outputs, ~5x less
    # host time — the process collates num_devices shards per step, which is
    # otherwise host-bound on a v5e-8 (27 ms/step numpy vs ~4 ms device step)
    nat = _collate_native(gate, fwd, prob, graph_id, edge, tt_pairs, tt_dis,
                          n_graphs, n, e, p, dims, mp, out=out)
    if nat is not None:
        return nat

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
    # edges ordered by (dst level, SOURCE id, original idx): within a level,
    # src-sorted rows give the fused kernel tight per-SEGMENT source windows
    # (sorted sources cluster, so each Ep-segment's [smin, smax) spans a
    # fraction of the prefix even when PI fanins drag the global min to 0)
    edge_order = (np.lexsort((np.arange(e), edge[0], dst_level))
                  if e else np.zeros(0, np.int64))
    ecounts = np.bincount(dst_level, minlength=max_level + 1) if e else np.zeros(max_level + 1, np.int64)

    np_real = int(lv_counts[1:].max()) if max_level else 0
    ep_real = int(ecounts[1:].max()) if max_level else 0

    # ---- padded dims ---------------------------------------------------
    dims = dims or {}
    # N is a multiple of the dst-block size so whole-graph aggregation can
    # run as blocked dense matmuls (see agg_* tables below).
    N = dims.get("N", _round_up(bucket(n + 1), BLOCK_D * mp))
    E = dims.get("E", bucket(e))
    P = dims.get("P", bucket(p))
    L = dims.get("L", bucket(max(lv_real, 1)))
    NP = dims.get("NP", bucket(max(np_real, 1)))
    EP = dims.get("EP", _round_up(bucket(max(ep_real, 1)), mp))
    assert N > n and E >= e and P >= p and L >= lv_real and NP >= np_real and EP >= ep_real, (
        "dims overrides too small for this shard"
    )
    dump = n  # first padding node

    perm_pad = np.arange(N, dtype=np.int32)
    perm_pad[:n] = node_perm
    inv_pad = np.arange(N, dtype=np.int32)
    inv_pad[:n] = inv_perm
    res = {
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
    edge_lv_row = np.zeros(E, dtype=np.int32)  # edge -> flat (level, rank) slot

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
            # inverse of lv_edge_id over VALID edges: each edge sits in
            # exactly one level slot, so the transpose of the upfront
            # pack[lv_edge_id] gather is a plain (masked) gather by this
            # table — no TPU scatter (models/dg_ae._level_scan_pallas)
            edge_lv_row[eidx] = ((lv_of_edge - 1) * EP + erank).astype(np.int32)
    res.update(
        lv_nodes=lv_nodes,
        lv_node_valid=lv_node_valid,
        lv_edge_src=lv_edge_src,
        lv_edge_dst_slot=lv_edge_dst_slot,
        lv_edge_valid=lv_edge_valid,
        lv_edge_id=lv_edge_id,
        edge_lv_row=edge_lv_row,
        lv_start=lv_start,
    )

    # ---- blocked-CSR whole-graph aggregation tables ----------------------
    # The struct encoder sums messages over all in-edges (and, reversed,
    # all out-edges) every round. TPU scatter-add serializes; instead we
    # block destination nodes into BLOCK_D-wide tiles and pad each tile's
    # edge list, so the sum becomes a batched one-hot matmul on the MXU
    # (see models/encoder.py). EBF/EBR = max per-block edge count, bucketed.
    nb = N // BLOCK_D
    fa_src, fa_slot, fa_valid, fa_eid, ebf = _blocked_tables(
        by=edge[1] if e else np.zeros(0, np.int64),
        other=edge[0] if e else np.zeros(0, np.int64),
        nb=nb, dims_key=dims.get("EBF"), dump=dump, eid_fill=E - 1,
    )
    ra_src, ra_slot, ra_valid, ra_eid, ebr = _blocked_tables(
        by=edge[0] if e else np.zeros(0, np.int64),
        other=edge[1] if e else np.zeros(0, np.int64),
        nb=nb, dims_key=dims.get("EBR"), dump=dump, eid_fill=E - 1,
    )
    deg_in = np.zeros(N, np.float32)
    deg_out = np.zeros(N, np.float32)
    if e:
        deg_in[: n] = np.bincount(edge[1], minlength=n)[:n]
        deg_out[: n] = np.bincount(edge[0], minlength=n)[:n]
    res.update(
        fa_src=fa_src, fa_slot=fa_slot, fa_valid=fa_valid, fa_eid=fa_eid,
        ra_src=ra_src, ra_slot=ra_slot, ra_valid=ra_valid, ra_eid=ra_eid,
        deg_in=deg_in, deg_out=deg_out,
    )
    if out is not None:  # no native lib: honor the in-place contract anyway
        for k, v in res.items():
            if isinstance(v, np.ndarray):
                np.copyto(out[k], v)
                res[k] = out[k]
    return res


_FILL_KEYS = {  # batch key -> collate_fill_native key
    "node_perm": "perm", "node_inv": "inv",
    "edge_src": "edge_src", "edge_dst": "edge_dst",
    "lv_nodes": "lv_nodes", "lv_node_valid": "lv_node_valid",
    "lv_edge_src": "lv_edge_src", "lv_edge_dst_slot": "lv_edge_dst_slot",
    "lv_edge_valid": "lv_edge_valid", "lv_edge_id": "lv_edge_id",
    "edge_lv_row": "edge_lv_row",
    "lv_start": "lv_start",
    "fa_src": "fa_src", "fa_slot": "fa_slot", "fa_valid": "fa_valid",
    "ra_src": "ra_src", "ra_slot": "ra_slot", "ra_valid": "ra_valid",
    "fa_eid": "fa_eid", "ra_eid": "ra_eid",
    "deg_in": "deg_in", "deg_out": "deg_out",
}


def _pad_into(dst: np.ndarray, a: np.ndarray, fill=0) -> np.ndarray:
    dst[: a.shape[0]] = a
    dst[a.shape[0] :] = fill
    return dst


def _mask_into(dst: np.ndarray, k: int) -> np.ndarray:
    dst[:k] = True
    dst[k:] = False
    return dst


def _collate_native(gate, fwd, prob, graph_id, edge, tt_pairs, tt_dis,
                    n_graphs, n, e, p, dims, mp, out=None):
    """C++-accelerated table construction (mgvae_tpu/native). Returns the
    full batch dict, or None when the native lib is unavailable (the numpy
    path in collate() is the always-available fallback and the reference
    implementation for tests/test_native.py parity).

    ``out``: optional dict of preallocated arrays (one per batch key) filled
    in place — the zero-copy collate_shards path."""
    from ..native import collate_fill_native, collate_stats_native

    fwd32 = fwd.astype(np.int32, copy=False)
    stats = collate_stats_native(fwd32, edge[0], edge[1], BLOCK_D)
    if stats is None:
        return None
    lv_real, np_real, ep_real, ebf_real, ebr_real = stats
    dims = dims or {}
    N = dims.get("N", _round_up(bucket(n + 1), BLOCK_D * mp))
    E = dims.get("E", bucket(e))
    P = dims.get("P", bucket(p))
    L = dims.get("L", bucket(max(lv_real, 1)))
    NP = dims.get("NP", bucket(max(np_real, 1)))
    EP = dims.get("EP", _round_up(bucket(max(ep_real, 1)), mp))
    EBF = dims.get("EBF", bucket(max(ebf_real, 1)))
    EBR = dims.get("EBR", bucket(max(ebr_real, 1)))
    assert N > n and E >= e and P >= p and L >= lv_real and NP >= np_real and EP >= ep_real, (
        "dims overrides too small for this shard"
    )
    dump = n
    t = collate_fill_native(
        fwd32, edge[0], edge[1],
        {"N": N, "E": E, "L": L, "NP": NP, "EP": EP, "EBF": EBF, "EBR": EBR},
        BLOCK_D, dump,
        out={fk: out[bk] for bk, fk in _FILL_KEYS.items()} if out is not None else None,
    )
    if t is None:
        return None
    perm_n = t["perm"][:n]
    inv = t["inv"]
    tt_a = inv[tt_pairs[0]].astype(np.int32) if p else np.zeros(0, np.int32)
    tt_b = inv[tt_pairs[1]].astype(np.int32) if p else np.zeros(0, np.int32)
    if out is not None:
        res = dict(out)
        _pad_into(res["gate"], gate[perm_n].astype(np.int32))
        _mask_into(res["node_valid"], n)
        _pad_into(res["forward_level"], fwd32[perm_n])
        _pad_into(res["graph_id"], graph_id[perm_n], fill=-1)
        _pad_into(res["prob"], prob[perm_n].astype(np.float32))
        _mask_into(res["edge_valid"], e)
        _pad_into(res["tt_pair_a"], tt_a)
        _pad_into(res["tt_pair_b"], tt_b)
        _mask_into(res["tt_valid"], p)
        _pad_into(res["tt_dis"], tt_dis.astype(np.float32))
    else:
        res = {bk: t[fk] for bk, fk in _FILL_KEYS.items()}
        res.update(
            gate=_pad(gate[perm_n].astype(np.int32), N),
            node_valid=_mask(n, N),
            forward_level=_pad(fwd32[perm_n], N),
            graph_id=_pad(graph_id[perm_n], N, fill=-1),
            prob=_pad(prob[perm_n].astype(np.float32), N),
            edge_valid=_mask(e, E),
            tt_pair_a=_pad(tt_a, P),
            tt_pair_b=_pad(tt_b, P),
            tt_valid=_mask(p, P),
            tt_dis=_pad(tt_dis.astype(np.float32), P),
        )
    res.update(
        n_nodes=np.int32(n), n_edges=np.int32(e),
        n_tt=np.int32(p), n_graphs=np.int32(n_graphs),
    )
    return res


def _blocked_tables(by, other, nb, dims_key, dump, eid_fill=0):
    """Group edges by ``by``-node block of width BLOCK_D; returns padded
    [nb, Eb] tables: message-source node, local slot (by - block_start),
    valid mask, and the ORIGINAL edge index of each slot (the
    gather-transpose table consumed by train/losses; padding slots point at
    ``eid_fill``, the last padded edge)."""
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
    eid = np.full((nb, eb), eid_fill, dtype=np.int32)
    if len(blk):
        starts = np.concatenate([[0], np.cumsum(counts)])
        rank = np.arange(len(blk)) - starts[blk]
        src[blk, rank] = other_s
        slot[blk, rank] = by_s - blk * BLOCK_D
        valid[blk, rank] = True
        eid[blk, rank] = order.astype(np.int32)
    return src, slot, valid, eid, eb


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
    "deg_in": 0.0, "deg_out": 0.0, "edge_lv_row": 0,
}
_PAD_DUMP = {"lv_nodes", "lv_edge_src", "fa_src", "ra_src"}  # point at dump node
_PAD_LASTE = {"lv_edge_id", "fa_eid", "ra_eid"}  # point at last (padding) edge


def _pad_batch_to(batch: dict, shapes: dict) -> dict:
    """Extend a collated batch's padded dims (fills keep masks false and
    indices on the dump slots) — cheaper than re-collating a shard."""
    dump = int(batch["n_nodes"])
    # edge_lv_row flattens (level, rank) with the OLD EP stride: remap it
    # whenever the EP dim grows (values for padding edges stay 0 — their
    # cotangent is masked anyway)
    ep_old = batch["lv_edge_src"].shape[-1]
    ep_new = shapes.get("lv_edge_src", (0, ep_old))[-1]
    if "edge_lv_row" in batch and ep_new != ep_old:
        r = batch["edge_lv_row"]
        batch = dict(batch, edge_lv_row=((r // ep_old) * ep_new + r % ep_old).astype(r.dtype))
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


def shard_dims(graphs: list[CircuitGraph], mp: int = 1) -> dict | None:
    """Padded dims collate() would pick, computed WITHOUT building tables
    (native stats pass). None when the native lib is unavailable."""
    from ..native import collate_stats_native

    sizes = np.array([g.num_nodes for g in graphs], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    n = int(offsets[-1])
    fwd = np.concatenate([g.forward_level for g in graphs]).astype(np.int32)
    edge = np.concatenate(
        [g.edge_index + offsets[i] for i, g in enumerate(graphs)], axis=1
    ) if any(g.num_edges for g in graphs) else np.zeros((2, 0), dtype=np.int64)
    stats = collate_stats_native(fwd, edge[0], edge[1], BLOCK_D)
    if stats is None:
        return None
    lv_real, np_real, ep_real, ebf_real, ebr_real = stats
    e = edge.shape[1]
    p = sum(int(g.tt_pair_index.shape[1]) if g.tt_pair_index.size else 0 for g in graphs)
    return {
        "N": _round_up(bucket(n + 1), BLOCK_D * mp),
        "E": bucket(e),
        "P": bucket(p),
        "L": bucket(max(lv_real, 1)),
        "NP": bucket(max(np_real, 1)),
        "EP": _round_up(bucket(max(ep_real, 1)), mp),
        "EBF": bucket(max(ebf_real, 1)),
        "EBR": bucket(max(ebr_real, 1)),
    }


_ALL_DIM_KEYS = ("N", "E", "P", "L", "NP", "EP", "EBF", "EBR")


def stacked_batch_buffers(dp: int, dims: dict) -> dict:
    """Uninitialized [dp, ...] buffers for ``dp`` shards collated at the
    given padded dims — the destination of collate_shards' zero-copy path
    (each shard is collated straight into ``buf[k][d]`` views)."""
    N, E, P, L, NP, EP, EBF, EBR = (dims[k] for k in _ALL_DIM_KEYS)
    nb = N // BLOCK_D

    def a(shape, dt):
        return np.empty((dp,) + shape, dt)

    return {
        "node_perm": a((N,), np.int32), "node_inv": a((N,), np.int32),
        "gate": a((N,), np.int32), "node_valid": a((N,), bool),
        "forward_level": a((N,), np.int32), "graph_id": a((N,), np.int32),
        "prob": a((N,), np.float32),
        "edge_src": a((E,), np.int32), "edge_dst": a((E,), np.int32),
        "edge_valid": a((E,), bool),
        "tt_pair_a": a((P,), np.int32), "tt_pair_b": a((P,), np.int32),
        "tt_valid": a((P,), bool), "tt_dis": a((P,), np.float32),
        "n_nodes": a((), np.int32), "n_edges": a((), np.int32),
        "n_tt": a((), np.int32), "n_graphs": a((), np.int32),
        "lv_nodes": a((L, NP), np.int32), "lv_node_valid": a((L, NP), bool),
        "lv_edge_src": a((L, EP), np.int32),
        "lv_edge_dst_slot": a((L, EP), np.int32),
        "lv_edge_valid": a((L, EP), bool), "lv_edge_id": a((L, EP), np.int32),
        "edge_lv_row": a((E,), np.int32),
        "lv_start": a((L,), np.int32),
        "fa_src": a((nb, EBF), np.int32), "fa_slot": a((nb, EBF), np.int32),
        "fa_valid": a((nb, EBF), bool),
        "ra_src": a((nb, EBR), np.int32), "ra_slot": a((nb, EBR), np.int32),
        "ra_valid": a((nb, EBR), bool),
        "fa_eid": a((nb, EBF), np.int32), "ra_eid": a((nb, EBR), np.int32),
        "deg_in": a((N,), np.float32), "deg_out": a((N,), np.float32),
    }


class GroupStatsCache:
    """Dataset-wide concatenated per-graph arrays for the batched native
    stats pass (mg_group_stats). The trainer's fixed-dims mode probes the
    padded dims of every (step, shard, chunk) group before each epoch; with
    this cache the whole epoch's probe is ONE threaded C++ call addressing
    graphs by id — the per-graph concatenation is paid once per dataset.

    The cache snapshots sizes/levels/edges at construction; rebuild it if
    the underlying graphs are mutated (the Trainer keys it on dataset
    identity)."""

    def __init__(self, graphs: list[CircuitGraph]):
        self.num_graphs = len(graphs)
        self.n = np.array([g.num_nodes for g in graphs], np.int64)
        self.e = np.array([g.num_edges for g in graphs], np.int64)
        self.p = np.array(
            [g.tt_pair_index.shape[1] if g.tt_pair_index.size else 0 for g in graphs],
            np.int64,
        )
        self.node_off = np.concatenate([[0], np.cumsum(self.n)])
        self.edge_off = np.concatenate([[0], np.cumsum(self.e)])
        c = lambda arrs, dt: (
            np.ascontiguousarray(np.concatenate(arrs), dtype=dt)
            if arrs else np.zeros(0, dt)
        )
        self.fwd_all = c([g.forward_level for g in graphs], np.int32)
        self.esrc_all = c([g.edge_index[0] for g in graphs if g.num_edges], np.int64)
        self.edst_all = c([g.edge_index[1] for g in graphs if g.num_edges], np.int64)
        # per-graph max forward level: the split-partition sort key
        # (split_groups_by_shape) without touching the graphs again
        if len(graphs) and self.fwd_all.size:
            self.lmax = np.maximum.reduceat(self.fwd_all, self.node_off[:-1])
        else:
            self.lmax = np.zeros(len(graphs), np.int32)
        self._level_hists = None  # lazy [num_graphs, Lmax+1] histograms

    def level_hists(self):
        """Per-graph per-level histograms ``(Hn, He)``, each shaped
        [num_graphs, Lmax_global + 1]: Hn[i, l] = nodes of graph i at
        forward level l, He[i, l] = edges of graph i whose DST sits at
        level l — the per-level quantities whose batch maxima become the
        NP / EP padded dims (see the stats pass around line 124). Built
        lazily (one bincount each), cached on the stats cache."""
        if self._level_hists is None:
            G = self.num_graphs
            L = int(self.lmax.max(initial=0))
            w = L + 1
            if self.fwd_all.size:
                gid_n = np.repeat(np.arange(G, dtype=np.int64), self.n)
                Hn = np.bincount(gid_n * w + self.fwd_all,
                                 minlength=G * w).reshape(G, w)
            else:
                Hn = np.zeros((G, w), np.int64)
            if self.edst_all.size:
                gid_e = np.repeat(np.arange(G, dtype=np.int64), self.e)
                dst_glb = self.edst_all + np.repeat(self.node_off[:-1], self.e)
                He = np.bincount(gid_e * w + self.fwd_all[dst_glb],
                                 minlength=G * w).reshape(G, w)
            else:
                He = np.zeros((G, w), np.int64)
            self._level_hists = (Hn, He)
        return self._level_hists

    def level_sup(self, ids: np.ndarray, m: int) -> tuple[int, int]:
        """Exact sup of (np_real, ep_real) over every m-subset of ``ids``:
        per-level counts are ADDITIVE across a group's members, so the sup
        of the level-max is, per level, the sum of the m largest member
        values — attained (per level) by a real subset. Levels >= 1 only,
        matching the stats pass (level-0 rows never enter NP/EP)."""
        Hn, He = self.level_hists()
        ids = np.asarray(ids)
        m = min(int(m), len(ids))
        if m == 0 or Hn.shape[1] <= 1:
            return 0, 0

        def sup(H):
            sub = H[ids, 1:]
            if m < sub.shape[0]:
                sub = np.partition(sub, sub.shape[0] - m, axis=0)[-m:]
            return int(sub.sum(axis=0).max(initial=0))

        return sup(Hn), sup(He)

    def group_dims(self, groups: list[np.ndarray], mp: int = 1) -> list[dict] | None:
        """shard_dims() for every group of graph ids in one native call, or
        None when the native lib is unavailable."""
        import os

        from ..native import group_stats_native

        ids = np.ascontiguousarray(np.concatenate([np.asarray(g) for g in groups]),
                                   dtype=np.int64)
        group_ptr = np.zeros(len(groups) + 1, np.int64)
        np.cumsum([len(g) for g in groups], out=group_ptr[1:])
        threads = int(os.environ.get("MGVAE_COLLATE_THREADS", "0")) or (os.cpu_count() or 1)
        stats = group_stats_native(
            group_ptr, ids, self.n, self.e, self.node_off, self.edge_off,
            self.fwd_all, self.esrc_all, self.edst_all, BLOCK_D,
            num_threads=min(threads, len(groups)),
        )
        if stats is None:
            return None
        out = []
        for gi, g in enumerate(groups):
            g = np.asarray(g)
            lv, np_r, ep, ebf, ebr = (int(x) for x in stats[gi])
            n = int(self.n[g].sum())
            out.append({
                "N": _round_up(bucket(n + 1), BLOCK_D * mp),
                "E": bucket(int(self.e[g].sum())),
                "P": bucket(int(self.p[g].sum())),
                "L": bucket(max(lv, 1)),
                "NP": bucket(max(np_r, 1)),
                "EP": _round_up(bucket(max(ep, 1)), mp),
                "EBF": bucket(max(ebf, 1)),
                "EBR": bucket(max(ebr, 1)),
            })
        return out


def collate_shards(shards: list[list[CircuitGraph]], mp: int = 1,
                   dims: dict | None = None, num_chunks: int = 1) -> dict:
    """Collate one shard per device with COMMON padded dims and stack a
    leading 'dp' axis — the host-side half of shard_map data parallelism
    (the DistributedSampler equivalent, trainer.py:179-192). ``mp`` passes
    the model-parallel divisibility hint through to collate().

    ``dims``: explicit common dims (the trainer's fixed-dims mode passes a
    running dataset-wide max so every step hits ONE compiled shape).
    Otherwise, with the native lib, per-shard dims come from a cheap stats
    pass and every shard collates straight into the agreed shapes."""
    if num_chunks > 1:
        # dp x chunked composition: each device's shard is itself C
        # sub-batches; leaves stack to [dp, C, L, ...] etc. and the train
        # step's per-device slice is a normal chunked batch
        if dims is None:
            pre = [chunked_shard_dims(s, num_chunks) for s in shards]
            if all(d is not None for d in pre):
                dims = {k: max(d[k] for d in pre) for k in pre[0]}
            else:
                # numpy fallback (no native lib): trial-collate each shard
                # and take the elementwise max of the per-chunk dims
                trials = [collate_chunked(s, num_chunks) for s in shards]
                per = [_chunked_dims_of(b, num_chunks) for b in trials]
                dims = {k: max(d[k] for d in per) for k in per[0]}
        batches = [collate_chunked(s, num_chunks, dims=dims) for s in shards]
        return {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    if dims is not None:
        if all(k in dims for k in _ALL_DIM_KEYS):
            return _collate_shards_zero_copy(shards, dims, mp)
        batches = [collate(s, dims=dims, mp=mp) for s in shards]
        return {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    pre = [shard_dims(s, mp=mp) for s in shards]
    if all(d is not None for d in pre):
        common = {k: max(d[k] for d in pre) for k in pre[0]}
        return _collate_shards_zero_copy(shards, common, mp)
    batches = [collate(s, mp=mp) for s in shards]
    shapes = {
        k: tuple(max(b[k].shape[i] for b in batches) for i in range(b0[k].ndim))
        if isinstance((b0 := batches[0])[k], np.ndarray) else None
        for k in batches[0]
    }
    shapes = {k: v for k, v in shapes.items() if v is not None}
    batches = [_pad_batch_to(b, shapes) for b in batches]
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def _collate_shards_zero_copy(shards, dims: dict, mp: int) -> dict:
    """Collate every shard directly into ONE stacked [dp, ...] buffer — no
    per-shard allocations, no np.stack pass. With the native lib the WHOLE
    step is a single C++ call (mg_collate_step) that parallelizes over
    shards with std::thread (ctypes drops the GIL); otherwise each shard is
    collated into views of the buffer (still skipping the stack copy)."""
    big = stacked_batch_buffers(len(shards), dims)
    if _collate_step_native(shards, dims, big) is not None:
        return big
    for d, s in enumerate(shards):
        b = collate(s, dims=dims, mp=mp, out={k: big[k][d] for k in big})
        for k in ("n_nodes", "n_edges", "n_tt", "n_graphs"):
            big[k][d] = b[k]
    return big


def _collate_step_native(shards, dims: dict, big: dict):
    """Concatenate the step's graphs (raw per-graph ids, shard order) and
    hand the whole step to mg_collate_step. Returns ``big`` or None when the
    native lib is unavailable."""
    import os

    from ..native import collate_step_native, get_lib

    if get_lib() is None:
        return None
    graphs = [g for s in shards for g in s]
    shard_graphs = np.array([len(s) for s in shards], np.int64)
    graph_nodes = np.array([g.num_nodes for g in graphs], np.int64)
    graph_edges = np.array([g.num_edges for g in graphs], np.int64)
    graph_tt = np.array(
        [g.tt_pair_index.shape[1] if g.tt_pair_index.size else 0 for g in graphs],
        np.int64,
    )
    c = lambda arrs, dt: (
        np.ascontiguousarray(np.concatenate(arrs), dtype=dt)
        if arrs else np.zeros(0, dt)
    )
    gate_all = c([g.gate for g in graphs], np.int32)
    fwd_all = c([g.forward_level for g in graphs], np.int32)
    prob_all = c([g.prob for g in graphs], np.float32)
    esrc_all = c([g.edge_index[0] for g in graphs if g.num_edges], np.int64)
    edst_all = c([g.edge_index[1] for g in graphs if g.num_edges], np.int64)
    tta_all = c([g.tt_pair_index[0] for g in graphs if g.tt_pair_index.size], np.int64)
    ttb_all = c([g.tt_pair_index[1] for g in graphs if g.tt_pair_index.size], np.int64)
    ttdis_all = c([g.tt_dis for g in graphs if g.tt_pair_index.size], np.float32)
    threads = int(os.environ.get("MGVAE_COLLATE_THREADS", "0")) or min(
        len(shards), os.cpu_count() or 1
    )
    out = collate_step_native(
        shard_graphs, graph_nodes, graph_edges, graph_tt,
        gate_all, fwd_all, prob_all, esrc_all, edst_all,
        tta_all, ttb_all, ttdis_all, dims, BLOCK_D, big,
        num_threads=threads,
    )
    if out is None:
        return None
    big["n_graphs"][:] = shard_graphs
    return big


def _partition_chunks(graphs: list[CircuitGraph], num_chunks: int) -> list[list[int]]:
    """Greedy node-count balance into num_chunks bins, deterministic, input
    order preserved within each bin."""
    return _partition_by_size([g.num_nodes for g in graphs], num_chunks)


def _partition_by_size(sizes, num_chunks: int) -> list[list[int]]:
    assert len(sizes) >= num_chunks, "fewer graphs than chunks"
    order = sorted(range(len(sizes)), key=lambda i: -int(sizes[i]))
    bins: list[list[int]] = [[] for _ in range(num_chunks)]
    loads = [0] * num_chunks
    for gi in order:
        k = loads.index(min(loads))
        bins[k].append(gi)
        loads[k] += int(sizes[gi])
    for b in bins:
        b.sort()
    return bins


def _chunked_dims_of(batch: dict, C: int) -> dict:
    """Per-chunk padded dims of an existing chunked batch."""
    return {
        "N": batch["gate"].shape[0] // C,
        "E": batch["edge_src"].shape[0] // C,
        "P": batch["tt_pair_a"].shape[0] // C,
        "L": batch["lv_nodes"].shape[1],
        "NP": batch["lv_nodes"].shape[2],
        "EP": batch["lv_edge_src"].shape[2],
        "EBF": batch["fa_src"].shape[1],
        "EBR": batch["ra_src"].shape[1],
    }


def chunked_shard_dims(graphs: list[CircuitGraph], num_chunks: int) -> dict | None:
    """Per-CHUNK dims collate_chunked would use (native stats pass), for
    agreeing dims across devices before chunked collation."""
    if num_chunks == 1:
        return shard_dims(graphs)
    bins = _partition_chunks(graphs, num_chunks)
    pre = [shard_dims([graphs[i] for i in b]) for b in bins]
    if any(d is None for d in pre):
        return None
    return {k: max(d[k] for d in pre) for k in pre[0]}


def collate_chunked(graphs: list[CircuitGraph], num_chunks: int,
                    dims: dict | None = None) -> dict:
    """Partition graphs into ``num_chunks`` balanced groups, collate each
    with COMMON padded dims, and merge into ONE batch whose node space is the
    concatenation of the chunks (chunk k occupies rows
    [k*N_sub, (k+1)*N_sub), keeping its own padding tail and dump slot).

    Why: the fused Pallas level kernel (ops/pallas/level_kernel.py) holds hf
    resident in VMEM, which caps the node count per kernel instance. Graphs
    are disjoint, so a large batch is exactly C independent sub-batches: the
    kernel runs a (chunk, level) grid with the VMEM footprint of ONE chunk,
    while every loss stays global (masked over the concatenated space), so
    training semantics match the unchunked batch bit-for-bit.

    Layout contract (consumed by models/dg_ae.forward and train/losses):
      * node/edge/tt arrays are GLOBAL: per-chunk local ids + k*N_sub (or
        k*E_sub for lv_edge_id) offsets; blocked-CSR tables merge the same
        way, so the struct encoder needs no changes at all;
      * level tables keep LOCAL node ids with a leading [C, L] axis — the
        kernel wants chunk-local ids, the XLA scan adds the offsets;
      * ``chunk_counts`` [C] carries per-chunk valid-node counts so negative
        sampling can skip the interior padding tails.
    """
    assert graphs and num_chunks >= 1
    if num_chunks == 1:
        return collate(graphs, dims=dims)
    bins = _partition_chunks(graphs, num_chunks)
    groups = [[graphs[i] for i in b] for b in bins]
    if dims is None:
        pre = [shard_dims(g) for g in groups]
        if all(d is not None for d in pre):
            dims = {k: max(d[k] for d in pre) for k in pre[0]}
    if dims is not None:
        batches = [collate(g, dims=dims) for g in groups]
    else:
        batches = [collate(g) for g in groups]
        shapes = {
            k: tuple(max(b[k].shape[i] for b in batches) for i in range(b0[k].ndim))
            if isinstance((b0 := batches[0])[k], np.ndarray) else None
            for k in batches[0]
        }
        shapes = {k: v for k, v in shapes.items() if v is not None}
        batches = [_pad_batch_to(b, shapes) for b in batches]

    C = num_chunks
    N_sub = batches[0]["gate"].shape[0]
    E_sub = batches[0]["edge_src"].shape[0]
    nb_sub = batches[0]["fa_src"].shape[0]
    in_sizes = np.array([g.num_nodes for g in graphs], dtype=np.int64)
    in_offsets = np.concatenate([[0], np.cumsum(in_sizes)])

    def cat(key):
        return np.concatenate([b[key] for b in batches])

    def cat_off(key, off):
        return np.concatenate([b[key] + k * off for k, b in enumerate(batches)])

    def stk(key):
        return np.stack([b[key] for b in batches])

    out = {
        "gate": cat("gate"),
        "node_valid": cat("node_valid"),
        "forward_level": cat("forward_level"),
        "prob": cat("prob"),
        "deg_in": cat("deg_in"),
        "deg_out": cat("deg_out"),
        "edge_src": cat_off("edge_src", N_sub),
        "edge_dst": cat_off("edge_dst", N_sub),
        "edge_valid": cat("edge_valid"),
        "tt_pair_a": cat_off("tt_pair_a", N_sub),
        "tt_pair_b": cat_off("tt_pair_b", N_sub),
        "tt_valid": cat("tt_valid"),
        "tt_dis": cat("tt_dis"),
        "fa_src": cat_off("fa_src", N_sub),
        "fa_slot": cat("fa_slot"),
        "fa_valid": cat("fa_valid"),
        "ra_src": cat_off("ra_src", N_sub),
        "ra_slot": cat("ra_slot"),
        "ra_valid": cat("ra_valid"),
        # gather-transpose tables: values are EDGE ids -> offset by E_sub
        "fa_eid": cat_off("fa_eid", E_sub),
        "ra_eid": cat_off("ra_eid", E_sub),
        # level tables: leading [C, L], node ids LOCAL, edge ids GLOBAL
        "lv_nodes": stk("lv_nodes"),
        "lv_node_valid": stk("lv_node_valid"),
        "lv_edge_src": stk("lv_edge_src"),
        "lv_edge_dst_slot": stk("lv_edge_dst_slot"),
        "lv_edge_valid": stk("lv_edge_valid"),
        "lv_edge_id": np.stack([b["lv_edge_id"] + k * E_sub for k, b in enumerate(batches)]),
        # flat (chunk, level, rank) slot of each edge: offset by the chunk's
        # level-table size (the stacked [C, L, EP] tables flatten that way)
        "edge_lv_row": cat_off(
            "edge_lv_row",
            batches[0]["lv_edge_src"].shape[0] * batches[0]["lv_edge_src"].shape[1],
        ),
        "lv_start": stk("lv_start"),
        "n_nodes": np.int32(sum(int(b["n_nodes"]) for b in batches)),
        "n_edges": np.int32(sum(int(b["n_edges"]) for b in batches)),
        "n_tt": np.int32(sum(int(b["n_tt"]) for b in batches)),
        "n_graphs": np.int32(len(graphs)),
        "chunk_counts": np.array([int(b["n_nodes"]) for b in batches], dtype=np.int32),
        # per-chunk edge/tt-pair counts: lets the thin wire rebuild the
        # chunk-local validity masks and level tables on device
        # (data/rehydrate._derive_chunked)
        "chunk_ecounts": np.array([int(b["n_edges"]) for b in batches], dtype=np.int32),
        "chunk_tts": np.array([int(b["n_tt"]) for b in batches], dtype=np.int32),
    }
    # graph ids: chunk-local 0..len-1 -> input indices
    gids = []
    for k, b in enumerate(batches):
        lut = np.asarray(bins[k], dtype=np.int32)
        g = b["graph_id"]
        gids.append(np.where(g >= 0, lut[np.clip(g, 0, len(lut) - 1)], -1))
    out["graph_id"] = np.concatenate(gids)
    # node_perm / node_inv over the GLOBAL original ordering (input graph
    # order, unpadded): new global row -> original id and back
    node_perm = np.arange(C * N_sub, dtype=np.int32)
    node_inv = np.arange(C * N_sub, dtype=np.int32)
    for k, b in enumerate(batches):
        n_k = int(b["n_nodes"])
        orig_to_global = np.concatenate(
            [in_offsets[g] + np.arange(in_sizes[g]) for g in bins[k]]
        ).astype(np.int32)
        node_perm[k * N_sub : k * N_sub + n_k] = orig_to_global[b["node_perm"][:n_k]]
        node_inv[orig_to_global] = k * N_sub + b["node_inv"][:n_k]
    out["node_perm"] = node_perm
    out["node_inv"] = node_inv
    assert nb_sub * BLOCK_D == N_sub
    return out


def collate_fit(
    graphs: list[CircuitGraph],
    max_nodes: int | None = None,
    max_ep: int | None = None,
    max_np: int | None = None,
) -> dict:
    """Collate with the smallest chunking whose per-chunk padded dims fit the
    fused kernel's VMEM gate (ops/pallas/level_kernel.kernel_fits) — C=1
    (plain collate) when the batch already fits. Defaults come from the
    kernel's own gate constants (lazy import keeps the data layer jax-free
    unless this function is used)."""
    if max_nodes is None or max_ep is None or max_np is None:
        from ..ops.pallas.level_kernel import (
            KERNEL_MAX_EP, KERNEL_MAX_NODES, KERNEL_MAX_NP,
        )

        max_nodes = KERNEL_MAX_NODES if max_nodes is None else max_nodes
        max_ep = KERNEL_MAX_EP if max_ep is None else max_ep
        max_np = KERNEL_MAX_NP if max_np is None else max_np
    b = collate(graphs)
    if (
        b["gate"].shape[0] <= max_nodes
        and b["lv_edge_src"].shape[1] <= max_ep
        and b["lv_nodes"].shape[1] <= max_np
    ):
        return b
    total = sum(g.num_nodes for g in graphs)
    biggest = max(g.num_nodes for g in graphs)
    last = None
    for c in range(2, len(graphs) + 1):
        # cheap lower-bound reject before paying for a stats pass
        per = max(biggest + 1, (total + c) // c)
        if _round_up(bucket(per), BLOCK_D) > max_nodes and c < len(graphs):
            continue
        d = chunked_shard_dims(graphs, c)
        if d is not None:  # native stats: probe without collating
            if d["N"] <= max_nodes and d["EP"] <= max_ep and d["NP"] <= max_np:
                return collate_chunked(graphs, c, dims=d)
            continue
        last = collate_chunked(graphs, c)
        if (
            last["gate"].shape[0] // c <= max_nodes
            and last["lv_edge_src"].shape[2] <= max_ep
            and last["lv_nodes"].shape[2] <= max_np
        ):
            return last
    if last is None:
        last = collate_chunked(graphs, len(graphs))
    return last if last is not None else b


def pick_chunks_for(graphs: list[CircuitGraph], dim_hidden: int) -> int:
    """Smallest chunk count C whose per-chunk padded dims pass the fused
    kernel's VMEM gate (the choice the trainer's fixed-dims pass makes);
    1 when the batch already fits or the native stats pass is unavailable."""
    from ..ops.pallas.level_kernel import kernel_fits

    for c in range(1, len(graphs) + 1):
        d = chunked_shard_dims(graphs, c)
        if d is None:
            return 1
        if kernel_fits(d["N"], d["EP"], d["NP"], dim_hidden):
            return c
    return 1


def batch_shape_key(batch: dict) -> tuple:
    """Hashable static-shape signature (jit cache key for diagnostics)."""
    return tuple(
        (k, v.shape) for k, v in sorted(batch.items()) if isinstance(v, np.ndarray)
    )


def shard_levels_by_dst(batch: dict, mp: int) -> dict:
    """Re-group the per-level tables DST-COMPLETE across ``mp`` members for
    within-level model parallelism (parallel/sharded.py use_pallas path).

    Member m owns destination slots [m*Np_m, (m+1)*Np_m) of every level and
    ALL edges pointing at them, so the per-destination softmax is member-
    local and each member can run the Pallas level-step kernel on its slice
    (ops/pallas/level_kernel.pallas_level_step). Destination slots are
    renumbered member-locally; source ordering (src-sorted within a level)
    is preserved, keeping the kernel's per-segment source windows valid.

    Returns a NEW dict = batch + the mp tables:
      mp_lv_edge_src / mp_lv_edge_dst_slot / mp_lv_edge_valid /
      mp_lv_edge_id                                  [L, mp, Ep_m]
      mp_lv_nodes / mp_lv_node_valid                 [L, mp, Np_m]
    Padding follows collate's conventions (src/nodes -> dump node,
    edge_id -> last padding edge, dst_slot -> 0). Accepts a single collate()
    batch ([L, ...] tables) or a dp-stacked collate_shards() batch
    ([dp, L, ...] tables -> [dp, L, mp, ...] outputs, common Ep_m). Unchunked
    batches only.
    """
    lv_src = np.asarray(batch["lv_edge_src"])
    stacked = lv_src.ndim == 3
    if lv_src.ndim not in (2, 3):
        raise ValueError("shard_levels_by_dst expects an unchunked batch")

    def rows(key):
        a = np.asarray(batch[key])
        return a if stacked else a[None]

    lv_src = rows("lv_edge_src")
    lv_dslot = rows("lv_edge_dst_slot")
    lv_evalid = rows("lv_edge_valid")
    lv_eid = rows("lv_edge_id")
    lv_nodes = rows("lv_nodes")
    lv_nvalid = rows("lv_node_valid")
    B, L, EP = lv_src.shape
    NP = lv_nodes.shape[2]
    dumps = np.asarray(batch["n_nodes"]).reshape(-1).astype(np.int64)
    E = int(np.asarray(batch["edge_src"]).shape[-1])

    np_m = _round_up(-(-NP // mp), 8)  # ceil, sublane-aligned

    # per-(shard, level, member) edge counts -> common padded Ep_m
    # (lane-aligned for full MXU one-hot tiles in the kernel)
    emember = np.where(lv_evalid, lv_dslot // np_m, -1)
    ep_m = 0
    for m in range(mp):
        ep_m = max(ep_m, int((emember == m).sum(axis=2).max(initial=0)))
    ep_m = max(_round_up(ep_m, 128), 128)

    e_src = np.empty((B, L, mp, ep_m), dtype=np.int32)
    e_src[:] = dumps[:, None, None, None]
    e_dslot = np.zeros((B, L, mp, ep_m), dtype=np.int32)
    e_valid = np.zeros((B, L, mp, ep_m), dtype=bool)
    e_id = np.full((B, L, mp, ep_m), E - 1, dtype=np.int32)
    for b in range(B):
        for lv in range(L):
            for m in range(mp):
                sel = np.flatnonzero(emember[b, lv] == m)  # preserves src order
                k = len(sel)
                if k == 0:
                    continue
                e_src[b, lv, m, :k] = lv_src[b, lv, sel]
                e_dslot[b, lv, m, :k] = lv_dslot[b, lv, sel] - m * np_m
                e_valid[b, lv, m, :k] = True
                e_id[b, lv, m, :k] = lv_eid[b, lv, sel]

    nodes_pad = np.empty((B, L, mp * np_m), dtype=np.int32)
    nodes_pad[:] = dumps[:, None, None]
    nodes_pad[:, :, :NP] = lv_nodes
    nvalid_pad = np.zeros((B, L, mp * np_m), dtype=bool)
    nvalid_pad[:, :, :NP] = lv_nvalid

    sq = (lambda a: a) if stacked else (lambda a: a[0])
    out = dict(batch)
    out.update(
        mp_lv_edge_src=sq(e_src),
        mp_lv_edge_dst_slot=sq(e_dslot),
        mp_lv_edge_valid=sq(e_valid),
        mp_lv_edge_id=sq(e_id),
        mp_lv_nodes=sq(nodes_pad.reshape(B, L, mp, np_m)),
        mp_lv_node_valid=sq(nvalid_pad.reshape(B, L, mp, np_m)),
    )
    return out


_SPLIT_FWD_DROP = {"tt_pair_a", "tt_pair_b", "tt_valid", "tt_dis", "prob",
                   "node_perm", "node_inv", "graph_id"}


def split_groups_by_shape(lmax, edges, nodes, num_groups: int) -> list[np.ndarray]:
    """The canonical shape-sort partition shared by collate_split,
    split_dims, and the trainer's cached pre-scan: members sorted by
    (max level, edge count, node count) with stable ties (np.lexsort ==
    python sorted on the key tuple), then split into ``num_groups``
    equal-count groups. Keeping this in ONE place guarantees the dims a
    pre-scan computes are the dims collate_split will actually use."""
    order = np.lexsort((np.asarray(nodes), np.asarray(edges), np.asarray(lmax)))
    return [np.asarray(a) for a in np.array_split(order, num_groups)]


def _split_partition(graphs: list[CircuitGraph], num_groups: int) -> list[np.ndarray]:
    lmax = [int(g.forward_level.max(initial=0)) for g in graphs]
    return split_groups_by_shape(lmax, [g.num_edges for g in graphs],
                                 [g.num_nodes for g in graphs], num_groups)


def split_dims(shards: list[list[CircuitGraph]], num_groups: int) -> list[dict]:
    """Per-group dims agreed across several shards (for stacked split
    batches): the elementwise max of each shard's group-g natural dims."""
    per_group: list[list[dict]] = [[] for _ in range(num_groups)]
    for graphs in shards:
        for g, gi in enumerate(_split_partition(graphs, num_groups)):
            per_group[g].append(natural_dims([graphs[i] for i in gi]))
    return [{k: max(d[k] for d in ds) for k in ds[0]} for ds in per_group]


def stack_batches(batches: list[dict]) -> dict:
    """np.stack structurally-identical batch dicts leaf-wise into a leading
    axis (the collate_shards layout for batch kinds without a zero-copy
    path). Split batches stack too: the ``groups`` tuple is stacked
    per-group, per-key. Host-only keys that vary per member (node_inv)
    must be dropped by the caller first."""
    first = batches[0]
    out = {}
    for k, v in first.items():
        if k == "groups":
            out[k] = tuple(
                {kk: np.stack([np.asarray(b["groups"][g][kk]) for b in batches])
                 for kk in v[g]}
                for g in range(len(v))
            )
        else:
            out[k] = np.stack([np.asarray(b[k]) for b in batches])
    return out


def collate_split_step(shards: list[list[CircuitGraph]],
                       dims: list[dict]) -> dict:
    """Zero-copy SPLIT-step collate: the stacked [K, ...] split batch for K
    shards at agreed per-group dims, byte-identical to
    ``stack_batches([collate_split(s, G, dims) for s in shards])`` with the
    host-only ``node_inv`` dropped.

    The win over the python path (measured ~7 ms/step at K=8 bs64 on the
    1-core host): group position g's dims are uniform across the K shards,
    so all K group-g collates go through ONE _collate_shards_zero_copy call
    (C++ mg_collate_step, std::thread over shards, no np.stack pass) — G
    native calls per dispatch group instead of K python collate_split
    calls + a leaf-wise stack. The global loss arrays (concat node order)
    are then assembled with vectorized axis-1 concatenates over the stacked
    group buffers."""
    G = len(dims)
    K = len(shards)
    parts = [_split_partition(s, G) for s in shards]
    gstk = []
    for g in range(G):
        shards_g = [[s[i] for i in p[g]] for s, p in zip(shards, parts)]
        gstk.append(_collate_shards_zero_copy(shards_g, dims[g], mp=1))

    n_pad = [int(gb["gate"].shape[1]) for gb in gstk]
    offs = np.concatenate([[0], np.cumsum(n_pad)]).astype(np.int32)

    def cat(k, off_by=None):
        parts_ = []
        for g, gb in enumerate(gstk):
            a = np.asarray(gb[k])
            if off_by == "node":
                a = a + offs[g]
            parts_.append(a)
        return np.concatenate(parts_, axis=1)

    def tot(k):
        return np.sum([gb[k] for gb in gstk], axis=0).astype(np.int32)

    out = {
        "gate": cat("gate"),
        "node_valid": cat("node_valid"),
        "forward_level": cat("forward_level"),
        "prob": cat("prob"),
        "edge_src": cat("edge_src", off_by="node"),
        "edge_dst": cat("edge_dst", off_by="node"),
        "edge_valid": cat("edge_valid"),
        "tt_pair_a": cat("tt_pair_a", off_by="node"),
        "tt_pair_b": cat("tt_pair_b", off_by="node"),
        "tt_valid": cat("tt_valid"),
        "tt_dis": cat("tt_dis"),
        "n_nodes": tot("n_nodes"),
        "n_edges": tot("n_edges"),
        "n_tt": tot("n_tt"),
        "n_graphs": np.array([len(s) for s in shards], np.int32),
        "chunk_counts": np.stack(
            [gb["n_nodes"].astype(np.int32) for gb in gstk], axis=1),
        "chunk_offsets": np.broadcast_to(offs[:-1], (K, G)).copy(),
    }
    out["groups"] = tuple(
        {k: v for k, v in gb.items() if k not in _SPLIT_FWD_DROP}
        for gb in gstk
    )
    return out


def collate_split(graphs: list[CircuitGraph], num_groups: int,
                  dims: list[dict] | None = None) -> dict:
    """Shape-aware SPLIT batch (VERDICT r3 item 7): graphs sorted by shape
    (levels, edges) and partitioned into ``num_groups`` equal-count groups,
    each collated with its OWN bucketed dims — padded dims hug each group's
    members instead of the whole batch's max. The forward runs per group
    (models/dg_ae handles batches carrying "groups"); the LOSSES stay
    global: this dict's top-level edge/tt/prob arrays are expressed in the
    concatenated (group-offset) node order, so train/losses runs on it
    unchanged and the result is semantically identical to one big batch.

    Negative sampling maps uniform ids through chunk_counts/chunk_offsets
    (per-group valid-node runs), never hitting interior padding.
    """
    gidx = [list(a) for a in _split_partition(graphs, num_groups)]
    gbs = [collate([graphs[i] for i in gi],
                   dims=dims[g] if dims is not None else None)
           for g, gi in enumerate(gidx)]

    n_pad = [gb["gate"].shape[0] for gb in gbs]
    offs = np.concatenate([[0], np.cumsum(n_pad)]).astype(np.int32)
    goff = np.concatenate([[0], np.cumsum([len(gi) for gi in gidx])]).astype(np.int32)

    def cat(k, off_by=None):
        # node-id offsets keep padding entries in-range: each group's dump /
        # fill ids land inside its own padded row range (masked by *_valid)
        parts = []
        for g, gb in enumerate(gbs):
            a = np.asarray(gb[k])
            if off_by == "node":
                a = a + offs[g]
            parts.append(a)
        return np.concatenate(parts)

    out = {
        "gate": cat("gate"),
        "node_valid": cat("node_valid"),
        "forward_level": cat("forward_level"),
        "prob": cat("prob"),
        # edge/tt ids in concat-layout node order; padding entries point at
        # each group's own dump row (offset keeps them in-range and invalid)
        "edge_src": cat("edge_src", off_by="node"),
        "edge_dst": cat("edge_dst", off_by="node"),
        "edge_valid": cat("edge_valid"),
        "tt_pair_a": cat("tt_pair_a", off_by="node"),
        "tt_pair_b": cat("tt_pair_b", off_by="node"),
        "tt_valid": cat("tt_valid"),
        "tt_dis": cat("tt_dis"),
        "n_nodes": np.int32(sum(int(gb["n_nodes"]) for gb in gbs)),
        "n_edges": np.int32(sum(int(gb["n_edges"]) for gb in gbs)),
        "n_tt": np.int32(sum(int(gb["n_tt"]) for gb in gbs)),
        "n_graphs": np.int32(len(graphs)),
        "chunk_counts": np.asarray([int(gb["n_nodes"]) for gb in gbs], np.int32),
        "chunk_offsets": offs[:-1],
    }
    # global node_inv (original-input-order concat id -> split-layout id)
    orig_off = np.concatenate([[0], np.cumsum([g.num_nodes for g in graphs])])
    inv = np.zeros(int(orig_off[-1]), np.int32)
    for g, gi in enumerate(gidx):
        ginv = np.asarray(gbs[g]["node_inv"])
        pos = 0
        for i in gi:
            n = graphs[i].num_nodes
            inv[orig_off[i]:orig_off[i] + n] = ginv[pos:pos + n] + offs[g]
            pos += n
    out["node_inv"] = inv
    out["groups"] = tuple(
        {k: v for k, v in gb.items() if k not in _SPLIT_FWD_DROP} for gb in gbs
    )
    return out
