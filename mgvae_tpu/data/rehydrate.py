"""Device-side rebuild of collate's derived index tables (wire thinning).

Most index tables `data/batching.collate` emits are deterministic functions
of four small inputs — `edge_src`, `edge_dst`, `lv_start`, and the n_*
scalars — because the collate renumbers nodes LEVEL-MAJOR (batching.py:101)
before building any table:

- node rows of a level are the contiguous id range
  [lv_start[l], lv_start[l+1]) -> `lv_nodes`/`lv_node_valid` and the three
  validity masks are closed-form (iota + compare), no data needed;
- the level-edge tables are the edges stable-sorted by
  (dst level, src, original index) (batching.py:131) and the blocked-CSR
  fa/ra tables are the edges stable-sorted by dst (resp. src) node block
  (batching.py:365) -> one multi-operand `lax.sort` each reproduces the
  exact layout (the sort network carries src/dst/eid payloads, so no
  E-sized random gathers), and prefix counts (comparison-sums against the
  sorted keys) replace the host's bincount/cumsum without a single TPU
  scatter.

Why: the tunneled chip moves ~85 MB/s host->device, and the derived tables
are ~65% of a bs16 step's narrowed wire bytes (fa/ra 131 KB + lv_* 127 KB
of a 407 KB step) — all permuted copies of the edge list that is on the
wire anyway. Rebuilding them on device inside the jitted step trades a few
hundred microseconds of sort/gather for those bytes, exactly like
`train/step.rehydrate_split` does for split-batch globals. Measured
on-chip (tmp/exp_r4_thinwire.py): 5.4x wire cut, steady-state bs16 e2e
2029 vs 1892 g/s (+7%). The host keeps building the tables (the C++
collate emits them in one pass); only the WIRE drops them.

Cost calibration (on-chip section profile, tmp/exp_derive_prof*): sorts are
nearly free (~60 us for 4), the cost is gathers + broadcast compare-sums.
`forward_level` and `deg_in/out` therefore STAY on the wire: deriving them
(an [N, L] compare-sum resp. per-block histograms) costs more device time
than their few KB cost on a prefetch-hidden wire.

Byte-identity with the host tables is load-bearing (the fused Pallas kernel
ingests them raw) and is asserted by tests/test_rehydrate.py across
modalities, dims overrides, and mp padding.

Scope: flat UNCHUNKED batches (2-D level tables), split-batch groups, and —
round 5 — CHUNKED batches ([C, L] level tables): a chunked batch is C
disjoint sub-batches at common dims whose derived tables are the same
closed forms per chunk (vmap of the flat derive over chunk-local edge
views) plus the k*N_sub / k*E_sub / k*L*EP global offsets
data/batching.collate_chunked applies. Multihost ships the thin wire too
(the trainer wire_drops BEFORE _globalize; each shard_map member derives
its own slice). Giant graphs whose level sort key would overflow int32
keep the full wire.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

from .batching import BLOCK_D

# keys the device rebuilds bit-exactly (18) plus keys the train step never
# reads (3: graph_id / node_perm / node_inv, see api.py for their only
# consumer) — all safe to leave off the train wire. forward_level and
# deg_in/out are kept on the wire (cheaper to ship than to derive, see
# module docstring).
DERIVED_KEYS = (
    "node_valid", "edge_valid", "tt_valid",
    "lv_nodes", "lv_node_valid",
    "lv_edge_src", "lv_edge_dst_slot", "lv_edge_valid", "lv_edge_id",
    "edge_lv_row",
    "fa_src", "fa_slot", "fa_valid", "fa_eid",
    "ra_src", "ra_slot", "ra_valid", "ra_eid",
)
UNUSED_KEYS = ("graph_id", "node_perm", "node_inv")


def wire_drop(batch: dict) -> dict:
    """Return a thin copy of a collated batch with the derived and
    step-unused keys removed and a zero-byte `tdims` placeholder added whose
    SHAPE carries the four padded dims (NP, EP, EBF, EBR) the rebuild cannot
    read off the remaining arrays. Split batches thin each GROUP (each group
    is an unchunked sub-batch; the split globals are handled separately by
    step.SPLIT_WIRE_DERIVABLE). Leading [dp]/[K] axes pass through untouched
    (the placeholder mirrors them). No-op (returns the same dict object)
    when the batch is chunked, already thin, or the level sort key would
    overflow int32."""
    if "groups" in batch:
        gbs = tuple(wire_drop(gb) for gb in batch["groups"])
        if all(g is o for g, o in zip(gbs, batch["groups"])):
            return batch
        out = dict(batch)
        out["groups"] = gbs
        return out
    lv = batch.get("lv_nodes")
    if lv is None:
        return batch
    chunked = "chunk_counts" in batch
    if chunked and "chunk_ecounts" not in batch:
        return batch  # pre-round-5 cached batch: counts missing, full wire
    # chunked level tables carry a [C] axis before [L, NP]
    lead = lv.ndim - (3 if chunked else 2)  # stacked [dp] / grouped [K, dp]
    if lead < 0:
        return batch
    n_dim = batch["gate"].shape[-1]
    if chunked:
        n_dim //= batch["chunk_counts"].shape[-1]  # per-chunk node space
    l_dim = batch["lv_start"].shape[-1]
    if (l_dim + 1) * n_dim >= 2**31:  # keep the full wire for giant graphs
        return batch
    thin = {k: v for k, v in batch.items() if k not in DERIVED_KEYS and k not in UNUSED_KEYS}
    np_dim, ep_dim = lv.shape[-1], batch["lv_edge_src"].shape[-1]
    ebf, ebr = batch["fa_src"].shape[-1], batch["ra_src"].shape[-1]
    thin["tdims"] = np.zeros(lv.shape[:lead] + (0, np_dim, ep_dim, ebf, ebr), np.int8)
    return thin


def _blocked(edge_valid, by, other, eb: int, n_dim: int, e_dim: int, dump):
    """Device mirror of batching._blocked_tables: edges stable-sorted by
    `by` node (padding edges keyed to N so they sort last), per-block ranks
    from prefix counts against the sorted keys, tables gathered from the
    SORTED payloads (the sort carries them; only [nb, eb]-sized gathers
    remain). Returns (src, slot, valid, eid)."""
    nb = n_dim // BLOCK_D
    iota_e = jnp.arange(e_dim, dtype=jnp.int32)
    key = jnp.where(edge_valid, by, n_dim).astype(jnp.int32)
    # stable: ties keep original edge order, matching np.argsort(kind=stable)
    skey, other_s, order = lax.sort((key, other.astype(jnp.int32), iota_e), num_keys=1)
    # bstart[b] = #edges in blocks < b; bstart[nb] excludes the padding keys
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * BLOCK_D
    bstart = jnp.sum(skey[None, :] < bounds[:, None], axis=1, dtype=jnp.int32)
    cnt = bstart[1:] - bstart[:-1]
    s = jnp.arange(eb, dtype=jnp.int32)[None, :]
    valid = s < cnt[:, None]
    pos = jnp.clip(bstart[:-1, None] + s, 0, e_dim - 1)
    eid = jnp.where(valid, order[pos], e_dim - 1)
    src = jnp.where(valid, other_s[pos], dump)
    blk0 = jnp.arange(nb, dtype=jnp.int32)[:, None] * BLOCK_D
    slot = jnp.where(valid, skey[pos] - blk0, 0)  # valid rows: skey == by
    return src, slot, valid, eid


def _derive_local(edge_src, edge_dst, fwd, lv_start, n, e,
                  *, n_dim, e_dim, l_dim, np_dim, ep_dim, ebf, ebr):
    """All derived tables of ONE flat node space (a whole unchunked batch,
    or one chunk of a chunked batch under vmap), with LOCAL node/edge ids —
    bit-exact vs data/batching.collate's per-space tables."""
    dump = n.astype(jnp.int32)  # first padding node (collate: dump = n)
    out = {}
    iota_n = jnp.arange(n_dim, dtype=jnp.int32)
    iota_e = jnp.arange(e_dim, dtype=jnp.int32)
    node_valid = iota_n < n
    edge_valid = iota_e < e
    out["node_valid"] = node_valid
    out["edge_valid"] = edge_valid

    # node rows: level l+1 occupies [lv_start[l], nxt[l]) (level-major
    # contiguity; padded lv_start rows equal n, so their counts are 0)
    nxt = jnp.concatenate([lv_start[1:], n[None].astype(lv_start.dtype)])
    s_np = jnp.arange(np_dim, dtype=jnp.int32)[None, :]
    lv_cnt = (nxt - lv_start).astype(jnp.int32)[:, None]
    lv_node_valid = s_np < lv_cnt
    out["lv_node_valid"] = lv_node_valid
    out["lv_nodes"] = jnp.where(lv_node_valid, lv_start[:, None].astype(jnp.int32) + s_np, dump)

    # level-edge tables: stable sort by (dst level, src, original index) —
    # batching.py:131's lexsort, as one multi-operand sort carrying the
    # src/dst/eid payloads. Padding edges key to 0 (level 0 holds no real
    # edges: any edge dst has level >= 1) and are skipped by counting from
    # level value 1 up.
    dst_lvl = jnp.where(edge_valid, fwd[edge_dst], 0)
    key = dst_lvl * n_dim + edge_src
    skey, src_s, dst_s, order = lax.sort(
        (key.astype(jnp.int32), edge_src.astype(jnp.int32),
         edge_dst.astype(jnp.int32), iota_e),
        num_keys=1,
    )
    slvl = skey // n_dim
    lv_vals = jnp.arange(l_dim + 1, dtype=jnp.int32)
    # estart_all[v] = #sorted positions with level < v (v in 0..L). Padding
    # edges key to level 0 and sort first, so estart_all[1] == E - e and all
    # later boundaries are consistent; level L's group ends at E.
    estart_all = jnp.sum(slvl[None, :] < lv_vals[:, None], axis=1, dtype=jnp.int32)
    estart = estart_all[1:]  # row l holds level l+1 -> starts at estart_all[l+1]
    ecnt_rows = jnp.concatenate([estart_all[2:], jnp.full((1,), e_dim, jnp.int32)]) - estart
    s_ep = jnp.arange(ep_dim, dtype=jnp.int32)[None, :]
    ev = s_ep < ecnt_rows[:, None]
    pos = jnp.clip(estart[:, None] + s_ep, 0, e_dim - 1)
    out["lv_edge_id"] = jnp.where(ev, order[pos], e_dim - 1)
    out["lv_edge_valid"] = ev
    out["lv_edge_src"] = jnp.where(ev, src_s[pos], dump)
    out["lv_edge_dst_slot"] = jnp.where(ev, dst_s[pos] - lv_start[:, None].astype(jnp.int32), 0)

    # edge -> (level, rank) flat slot: rank = sorted position - level start
    inv = jnp.argsort(order)  # position of each edge in the sorted order
    rank = inv.astype(jnp.int32) - estart_all[dst_lvl]
    out["edge_lv_row"] = jnp.where(edge_valid, (dst_lvl - 1) * ep_dim + rank, 0)

    # blocked-CSR whole-graph aggregation tables
    fa = _blocked(edge_valid, edge_dst, edge_src, ebf, n_dim, e_dim, dump)
    ra = _blocked(edge_valid, edge_src, edge_dst, ebr, n_dim, e_dim, dump)
    out["fa_src"], out["fa_slot"], out["fa_valid"], out["fa_eid"] = fa
    out["ra_src"], out["ra_slot"], out["ra_valid"], out["ra_eid"] = ra
    return out


def _derive_chunked(batch: dict) -> dict:
    """Chunked ([C, L] level tables) mirror of the flat derive: slice the
    GLOBAL edge arrays into their per-chunk rows ([k*E_sub, (k+1)*E_sub)),
    subtract the k*N_sub node offsets, vmap the flat derive over the chunk
    axis, and re-apply data/batching.collate_chunked's exact global layout
    (node/edge/blocked tables offset + flattened; level tables stacked with
    LOCAL node ids and GLOBAL edge ids)."""
    import jax

    np_dim, ep_dim, ebf, ebr = (int(d) for d in batch["tdims"].shape[-4:])
    cnts = batch["chunk_counts"].astype(jnp.int32)
    ecnts = batch["chunk_ecounts"].astype(jnp.int32)
    C = cnts.shape[-1]
    gate, lv_start = batch["gate"], batch["lv_start"]  # lv_start [C, L]
    n_dim, e_dim, l_dim = gate.shape[-1], batch["edge_src"].shape[-1], lv_start.shape[-1]
    n_sub, e_sub = n_dim // C, e_dim // C
    noff = (jnp.arange(C, dtype=jnp.int32) * n_sub)[:, None]
    eoff = (jnp.arange(C, dtype=jnp.int32) * e_sub)[:, None]

    out = dict(batch)
    out.pop("tdims")
    es_l = batch["edge_src"].astype(jnp.int32).reshape(C, e_sub) - noff
    ed_l = batch["edge_dst"].astype(jnp.int32).reshape(C, e_sub) - noff
    fwd_l = batch["forward_level"].reshape(C, n_sub)

    loc = jax.vmap(functools.partial(
        _derive_local, n_dim=n_sub, e_dim=e_sub, l_dim=l_dim,
        np_dim=np_dim, ep_dim=ep_dim, ebf=ebf, ebr=ebr,
    ))(es_l, ed_l, fwd_l, lv_start, cnts, ecnts)

    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    out["node_valid"] = flat(loc["node_valid"])
    out["edge_valid"] = flat(loc["edge_valid"])
    if "tt_pair_a" in batch:
        p_sub = batch["tt_pair_a"].shape[-1] // C
        out["tt_valid"] = flat(
            jnp.arange(p_sub, dtype=jnp.int32)[None, :]
            < batch["chunk_tts"].astype(jnp.int32)[:, None]
        )
    # level tables: stacked [C, L, ...], node ids LOCAL, edge ids GLOBAL
    for k in ("lv_nodes", "lv_node_valid", "lv_edge_src",
              "lv_edge_dst_slot", "lv_edge_valid"):
        out[k] = loc[k]
    out["lv_edge_id"] = loc["lv_edge_id"] + eoff[:, :, None]
    out["edge_lv_row"] = flat(
        loc["edge_lv_row"] + (jnp.arange(C, dtype=jnp.int32) * (l_dim * ep_dim))[:, None]
    )
    # blocked-CSR tables: flattened [C*nb_sub, ...], src/eid values GLOBAL
    for pre in ("fa", "ra"):
        out[f"{pre}_src"] = flat(loc[f"{pre}_src"] + noff[:, :, None])
        out[f"{pre}_slot"] = flat(loc[f"{pre}_slot"])
        out[f"{pre}_valid"] = flat(loc[f"{pre}_valid"])
        out[f"{pre}_eid"] = flat(loc[f"{pre}_eid"] + eoff[:, :, None])
    return out


def derive_tables(batch: dict) -> dict:
    """Rebuild every DERIVED_KEYS table of a thin (wire_drop'ed) batch —
    flat unchunked, split group, or chunked — bit-exact vs
    data/batching.collate(_chunked). Pure jnp, static shapes, scatter-free;
    intended to run inside the jitted train/eval step."""
    if "lv_nodes" in batch or "tdims" not in batch:
        return batch
    if "chunk_counts" in batch:
        return _derive_chunked(batch)
    np_dim, ep_dim, ebf, ebr = (int(d) for d in batch["tdims"].shape[-4:])
    gate, lv_start = batch["gate"], batch["lv_start"]
    edge_src, edge_dst = batch["edge_src"], batch["edge_dst"]
    fwd = batch["forward_level"]  # wire-kept (cheaper shipped than derived)
    n_dim, e_dim, l_dim = gate.shape[-1], edge_src.shape[-1], lv_start.shape[-1]
    n, e = batch["n_nodes"], batch["n_edges"]

    out = dict(batch)
    out.pop("tdims")
    out.update(_derive_local(
        edge_src.astype(jnp.int32), edge_dst.astype(jnp.int32), fwd, lv_start,
        n, e, n_dim=n_dim, e_dim=e_dim, l_dim=l_dim,
        np_dim=np_dim, ep_dim=ep_dim, ebf=ebf, ebr=ebr,
    ))
    if "tt_pair_a" in batch:  # split GROUPS carry no tt keys (global losses)
        p_dim = batch["tt_pair_a"].shape[-1]
        out["tt_valid"] = jnp.arange(p_dim, dtype=jnp.int32) < batch["n_tt"]
    return out
