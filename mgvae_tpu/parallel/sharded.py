"""Within-level model parallelism: the domain's "sequence parallelism".

The reference has no sequence axis; its unbounded dimension is DAG depth,
processed serially, with each level touching a dynamic node set
(SURVEY.md §5.7). When a single level's node/edge population outgrows one
chip, the TPU-native scaling move is to shard WITHIN each level:

  * the level edge tables [L, Ep] shard on the Ep axis across the 'mp' mesh
    axis — each device computes attention scores/messages for its slice;
  * the per-destination softmax needs cross-shard normalization: a pmax of
    per-slot maxima and a psum of exp-sums + weighted values (3 collectives
    per level, riding ICI inside the scan);
  * the struct encoder's blocked-CSR aggregation shards on the node-block
    axis; each device aggregates + GRU-updates its node slice, then
    all-gathers the new state (the state must be replicated for the next
    round's gathers).

Composes with data parallelism as a 2-D mesh ('dp', 'mp'):
``make_sharded_train_step`` runs the FULL training step (three losses,
backward, Adam) with batches sharded over 'dp' and each shard's node/edge
axes sharded over 'mp'. Gradient correctness across the manual collectives
comes from shard_map's replication tracking (check_vma): the transposes of
psum/pmax/all_gather insert the required reductions, and the dp pmean
finishes the sync — verified against the single-device step by
tests/test_sharded.py.

This module implements the num_rounds==1 fast path; numerics match the
single-device forward exactly (tests run on the virtual 8-device CPU mesh).
The batcher emits divisible dims when given the ``mp`` hint
(data/batching.collate(mp=...)), so the divisibility asserts below hold by
construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.dg_ae import DGConfig, _select_expert, struct_input
from ..ops.init import gru_cell_apply, layernorm_apply, linear_apply
from ..train.losses import func_loss, prob_loss, recon_loss

shard_map = jax.shard_map


def _sharded_struct_tower(params, x_feat_l, batch_l, num_rounds, layernorm, n, axis):
    """One MultiGCN tower with node-blocks sharded on ``axis``.

    x_feat_l / deg / fa tables are the local node-block slices; returns the
    REPLICATED [N, D] state (all-gathered each half-round).
    """
    dim = params["aggr"]["w"].shape[1]
    state = jnp.ones((n, dim), x_feat_l.dtype)          # replicated

    def blocked_sum_local(state_repl, src_tbl, slot_tbl, valid_tbl):
        msgs = state_repl[src_tbl]                       # [nb_l, Eb, D]
        slots = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        onehot = ((slot_tbl[..., None] == slots) & valid_tbl[..., None]).astype(state_repl.dtype)
        return jnp.einsum("bes,bed->bsd", onehot, msgs).reshape(-1, dim)

    def half_round(state, aggr_p, gru_p, rev):
        if rev:
            nbr_l = blocked_sum_local(state, batch_l["ra_src"], batch_l["ra_slot"], batch_l["ra_valid"])
            deg_l = batch_l["deg_out"]
        else:
            nbr_l = blocked_sum_local(state, batch_l["fa_src"], batch_l["fa_slot"], batch_l["fa_valid"])
            deg_l = batch_l["deg_in"]
        msg_l = nbr_l @ aggr_p["w"] + deg_l[:, None] * aggr_p["b"]
        n_l = msg_l.shape[0]
        idx = jax.lax.axis_index(axis) * n_l
        state_l = jax.lax.dynamic_slice_in_dim(state, idx, n_l, axis=0)
        new_l = gru_cell_apply(gru_p, jnp.concatenate([msg_l, x_feat_l], axis=-1), state_l)
        if layernorm:
            new_l = layernorm_apply(params["ln"], new_l)
        return jax.lax.all_gather(new_l, axis, axis=0).reshape(n, dim)

    for _ in range(num_rounds):
        state = half_round(state, params["aggr"], params["update"], False)
        state = half_round(state, params["aggr_r"], params["update_r"], True)
    return state


def _sharded_forward_body(params, batch, cfg: DGConfig, mp_axis: str, mp: int):
    """Within-level-sharded forward, to be called INSIDE shard_map. Batch
    leaves are local slices per build_batch_specs/train_batch_specs; returns
    replicated (hs, hf). Differentiable: the softmax max-shift is
    stop_gradient'ed (exact — softmax is shift-invariant), so autodiff only
    transposes psum/all_gather, both of which shard_map handles."""
    dtype = jnp.dtype(cfg.compute_dtype)
    D, T = cfg.dim_hidden, cfg.num_experts
    gate_l = batch["gate"]                 # local node slice
    x_feat_l = struct_input(gate_l, cfg, dtype)
    # full N: local slice size * mesh axis size (static at trace time)
    n = gate_l.shape[0] * mp

    ex = params["experts"]
    s = _sharded_struct_tower(params["struct"]["source"], x_feat_l, batch, cfg.s_rounds, cfg.layernorm, n, mp_axis)
    t = _sharded_struct_tower(params["struct"]["target"], x_feat_l, batch, cfg.t_rounds, cfg.layernorm, n, mp_axis)
    hs = linear_apply(params["hs_linear"], jnp.concatenate([s, t], axis=-1))  # replicated

    gate_full = jax.lax.all_gather(gate_l, mp_axis, axis=0, tiled=True)
    expert = cfg.expert_of_gate[gate_full]
    e_node = jnp.maximum(expert, 0)

    # per-node query score (replicated; cheap)
    q = _select_expert(hs @ ex["wq"][:D, :], e_node, T) + ex["bq"][e_node]
    aq_n = jnp.sum(q * ex["wa_q"][e_node], axis=-1) + ex["ba"][e_node]

    wkv = jnp.concatenate([ex["wk"], ex["wv"]], axis=1)  # [2D, 2TD]

    def level_step(hf, lv):
        src = lv["edge_src"]               # [Ep_l] local slice
        dslot = lv["edge_dst_slot"]
        evalid = lv["edge_valid"]
        nodes = lv["nodes"]                # replicated [Np]
        np_ = nodes.shape[0]
        e_dst = jnp.maximum(expert[nodes], 0)
        e_edge = e_dst[dslot]

        state_src = jnp.concatenate([hs[src], hf[src]], axis=-1)
        kv = state_src @ wkv
        k = _select_expert(kv[:, : T * D], e_edge, T) + ex["bk"][e_edge]
        v = _select_expert(kv[:, T * D :], e_edge, T) + ex["bv"][e_edge]
        score = aq_n[nodes][dslot] + jnp.sum(k * ex["wa_k"][e_edge], axis=-1)

        slots = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
        inc = (dslot[:, None] == slots) & evalid[:, None]
        inc_f = inc.astype(dtype)
        # cross-shard segment softmax: pmax of maxima, psum of sums.
        # stop_gradient on the shift is exact ONLY together with dropping the
        # upper clip at 0: the single-device path routes the max edge's score
        # gradient through the (differentiable) max-subtraction because
        # clip's upper bound zeroes the direct path exactly at the boundary;
        # with a constant shift the direct path must stay open, so only the
        # numerical-underflow clip at -80 remains (shifted <= 0 up to fp
        # noise anyway — smax IS the max of these scores).
        smax_l = jnp.max(jnp.where(inc, score[:, None], -1e30), axis=0)
        smax = jax.lax.pmax(jax.lax.stop_gradient(smax_l), mp_axis)
        score_m = jnp.where(evalid, score, -1e30)
        shifted = jnp.maximum(score_m - smax[dslot], -80.0)
        ex_s = jnp.exp(shifted) * evalid.astype(dtype)
        denom = jax.lax.psum(ex_s @ inc_f, mp_axis) + 1e-16
        attn = ex_s / denom[dslot]
        msg = jax.lax.psum(inc_f.T @ (v * attn[:, None]), mp_axis)  # [Np, D]

        gi = _select_expert(msg @ ex["w_ih"], e_dst, T) + ex["b_ih"][e_dst]
        gh = ex["b_hh"][e_dst]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        nw = jnp.tanh(i_n + r * h_n)
        upd = lv["node_valid"] & (expert[nodes] >= 0)
        h_new = jnp.where(upd[:, None], (1.0 - z) * nw, 0.0)
        return hf.at[nodes].set(h_new), None

    lv = {
        "nodes": batch["lv_nodes"],
        "node_valid": batch["lv_node_valid"],
        "edge_src": batch["lv_edge_src"],
        "edge_dst_slot": batch["lv_edge_dst_slot"],
        "edge_valid": batch["lv_edge_valid"],
    }
    hf = jnp.zeros_like(hs)
    hf, _ = jax.lax.scan(level_step, hf, lv)
    return hs, hf


def _sharded_forward_pallas(params, batch, cfg: DGConfig, mp_axis: str, mp: int,
                            interpret: bool, vma: frozenset | None = None):
    """Within-level-sharded forward whose level recurrence rides the Pallas
    level-step kernel (VERDICT r3 item 3). Requires the DST-COMPLETE member
    tables from data/batching.shard_levels_by_dst: every destination's full
    fan-in lives on one member, so the segment softmax is member-LOCAL (no
    pmax/psum inside the level) and each member runs
    ops/pallas/level_kernel.pallas_level_step on its slice. The only
    cross-member traffic is ONE all_gather of h_new slices per level
    (vs 3 collectives/level on the edge-split XLA path). Differentiable:
    the kernel's custom VJP returns d_hf/d_pack per member and shard_map's
    replication tracking inserts the mp psums at the varying/replicated
    boundaries."""
    from ..models.dg_ae import _level_statics
    from ..ops.pallas.level_kernel import LANE, _round_up, pallas_level_step

    dtype = jnp.dtype(cfg.compute_dtype)
    D, T = cfg.dim_hidden, cfg.num_experts
    gate_l = batch["gate"]
    x_feat_l = struct_input(gate_l, cfg, dtype)
    n = gate_l.shape[0] * mp

    s = _sharded_struct_tower(params["struct"]["source"], x_feat_l, batch,
                              cfg.s_rounds, cfg.layernorm, n, mp_axis)
    t = _sharded_struct_tower(params["struct"]["target"], x_feat_l, batch,
                              cfg.t_rounds, cfg.layernorm, n, mp_axis)
    hs = linear_apply(params["hs_linear"], jnp.concatenate([s, t], axis=-1))

    gate_full = jax.lax.all_gather(gate_l, mp_axis, axis=0, tiled=True)
    expert = cfg.expert_of_gate[gate_full]

    # per-edge statics, replicated (plain-gather path: the eid transpose
    # tables are mp-local slices here and linear_call partial grads would
    # evade vma tracking — shard_map's own gather transpose handles this)
    sb = {k: v for k, v in batch.items() if k not in ("fa_eid", "ra_eid")}
    pack, wkv_hf = _level_statics(params, sb, cfg, hs, expert)
    pw = _round_up(D + 2, LANE)
    pack = jnp.pad(pack, ((0, 0), (0, pw - pack.shape[1])))

    # member-local level tables (leading member axis sharded away)
    esrc = batch["mp_lv_edge_src"][:, 0]          # [L, Ep_m]
    edslot = batch["mp_lv_edge_dst_slot"][:, 0]
    evalid = batch["mp_lv_edge_valid"][:, 0].astype(jnp.int32)
    eid = batch["mp_lv_edge_id"][:, 0]
    nodes_l = batch["mp_lv_nodes"][:, 0]          # [L, Np_m]
    nvalid_l = batch["mp_lv_node_valid"][:, 0]
    pack_lv = pack[eid]                            # [L, Ep_m, PW]
    upd_l = (nvalid_l & (expert[nodes_l] >= 0)).astype(jnp.int32)
    e_n_l = jnp.maximum(expert[nodes_l], 0)
    nodes_full = jax.lax.all_gather(nodes_l, mp_axis, axis=1, tiled=True)
    upd_full = jax.lax.all_gather(upd_l, mp_axis, axis=1, tiled=True)

    ex = params["experts"]
    prec = cfg.matmul_precision
    # under a check_vma shard_map (the train step) the custom-VJP boundary
    # needs every differentiable input lifted to the full varying set BEFORE
    # the call — the pvary transposes then insert the mp psums on d_hf /
    # d_pack / d_weights (weights lifted once, outside the scan)
    w_ih, b_ih, b_hh, wa_k = ex["w_ih"], ex["b_ih"], ex["b_hh"], ex["wa_k"]
    if vma:
        from ..ops.pallas.level_kernel import _pvary_to

        wkv_hf, w_ih, b_ih, b_hh, wa_k = (
            _pvary_to(x, vma) for x in (wkv_hf, w_ih, b_ih, b_hh, wa_k))

    def body(hf, lv):
        h_new = pallas_level_step(
            hf, lv["pack"], lv["src"], lv["dslot"], lv["evalid"],
            lv["nodes"], lv["upd"], lv["e_n"],
            wkv_hf, w_ih, b_ih, b_hh, wa_k,
            D, T, interpret, prec, vma,
        )
        h_full = jax.lax.all_gather(h_new, mp_axis, axis=0, tiled=True)
        hf = hf.at[lv["nodes_full"]].set(
            jnp.where(lv["upd_full"][:, None] > 0, h_full, 0.0))
        return hf, None

    lvs = dict(pack=pack_lv, src=esrc, dslot=edslot, evalid=evalid,
               nodes=nodes_l, upd=upd_l, e_n=e_n_l,
               nodes_full=nodes_full, upd_full=upd_full)
    hf0 = jnp.zeros((n, D), hs.dtype)
    if vma:
        # the scan carry must have a stable vma type: the scatter of the
        # all_gathered h_new keeps the full varying set, so the carry rides
        # varying throughout (numerically replicated over mp; the loss
        # pmean's replicate() is then a numeric no-op over mp)
        hf0 = _pvary_to(hf0, vma)
    hf, _ = jax.lax.scan(body, hf0, lvs)
    return hs, hf


def make_sharded_forward(cfg: DGConfig, mesh: Mesh, sample_batch, mp_axis: str = "mp",
                         use_pallas: bool = False, interpret: bool = False):
    """Returns jitted fn(params, batch) -> (hs, hf) with within-level
    sharding over ``mp_axis``. ``sample_batch`` provides the key structure
    for the sharding specs; batches are normal collate() dicts.

    Divisibility requirements (satisfied by collate(..., mp=mp)): N must be
    a multiple of mp*128 and the level-table Ep axis a multiple of mp.
    """
    assert cfg.num_rounds == 1
    mp = mesh.shape[mp_axis]
    assert sample_batch["gate"].shape[0] % (128 * mp) == 0, "N must divide mp*128"
    if use_pallas:
        assert "mp_lv_edge_src" in sample_batch, \
            "use_pallas needs batching.shard_levels_by_dst(batch, mp) tables"
        assert sample_batch["mp_lv_edge_src"].shape[1] == mp

        def fwd(params, batch):
            return _sharded_forward_pallas(params, batch, cfg, mp_axis, mp, interpret)
    else:
        assert sample_batch["lv_edge_src"].shape[1] % mp == 0, "Ep must divide mp"

        def fwd(params, batch):
            return _sharded_forward_body(params, batch, cfg, mp_axis, mp)

    specs = build_batch_specs(sample_batch, mp_axis)
    fn = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def train_batch_specs(batch, mp_axis: str = "mp"):
    """Per-key PartitionSpecs for the dp x mp TRAIN step (mp axes only; the
    leading dp-stack axis is prepended by make_sharded_train_step). Only what
    the sharded forward consumes locally is mp-sharded; everything the
    losses read (prob, node_valid, edge/tt arrays) stays replicated within
    mp so the loss math is bit-identical to the single-device step."""
    node_sharded = {"gate", "deg_in", "deg_out"}
    block_sharded = {"fa_src", "fa_slot", "fa_valid", "ra_src", "ra_slot",
                     "ra_valid", "fa_eid", "ra_eid"}
    edge_sharded = {"lv_edge_src", "lv_edge_dst_slot", "lv_edge_valid", "lv_edge_id"}
    specs = {}
    for k in batch:
        if k in node_sharded:
            specs[k] = P(mp_axis)
        elif k in block_sharded:
            specs[k] = P(mp_axis, None)
        elif k in edge_sharded:
            specs[k] = P(None, mp_axis)
        elif k in _MEMBER_SHARDED:
            specs[k] = P(None, mp_axis, None)
        else:
            specs[k] = P()
    return specs


def make_sharded_train_step(cfg: DGConfig, optimizer, mesh: Mesh, sample_batch,
                            donate: bool = True, use_pallas: bool = False,
                            interpret: bool = False):
    """Full training step on a 2-D ('dp', 'mp') mesh: data parallel over
    'dp' (one collate_shards shard per dp member), within-level model
    parallel over 'mp' (the SP analogue — each dp shard's node/edge axes are
    split across mp, scaling to circuits larger than one chip).

    Build batches with collate_shards(shards, mp=mp) so the divisibility
    requirements hold. Returns train_step(params, state, opt_state, batch,
    rng, weights) -> (params, state, opt_state, metrics), signature-
    compatible with train.step.make_train_step.

    Gradients: autodiff inside shard_map transposes the forward's
    psum/all_gather collectives (check_vma replication tracking keeps the
    result replicated over mp), then an explicit pmean over 'dp' averages
    the data-parallel shards — the correctness upgrade over the reference's
    unsynced ranks (SURVEY.md §8 quirk 1), now on both mesh axes.
    """
    assert cfg.num_rounds == 1 and not cfg.variational
    mp = mesh.shape["mp"]
    assert sample_batch["gate"].shape[-1] % (128 * mp) == 0, "collate with mp=mp"
    if use_pallas:
        assert "mp_lv_edge_src" in sample_batch, \
            "use_pallas needs batching.shard_levels_by_dst(batch, mp) tables"
        assert sample_batch["mp_lv_edge_src"].shape[-2] == mp
    else:
        assert sample_batch["lv_edge_src"].shape[-1] % mp == 0, "collate with mp=mp"

    sample_shard = {k: v[0] if hasattr(v, "shape") and v.ndim > 0 else v
                    for k, v in sample_batch.items()}
    mp_specs = train_batch_specs(sample_shard, "mp")
    bspecs = {k: P(*(("dp",) + tuple(s))) for k, s in mp_specs.items()}

    def _loss_member(params, state, batch, rng, weights):
        batch = jax.tree.map(lambda x: x[0], batch)  # drop local dp axis
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        # 3-way split mirrors train.step.loss_and_metrics exactly so the
        # 2-D step is bit-comparable with the dp-only step (k_vae unused:
        # variational is rejected above)
        _k_vae, k_neg, k_drop = jax.random.split(rng, 3)
        if use_pallas:
            hs, hf = _sharded_forward_pallas(
                params, batch, cfg, "mp", mp, interpret, vma=vma)
        else:
            hs, hf = _sharded_forward_body(params, batch, cfg, "mp", mp)
        # the eid gather-transpose tables are mp-LOCAL slices here, but the
        # losses run on fully-replicated hs/edge arrays — hide them so
        # recon_loss takes the plain-gather path (shard_map's own transpose
        # handles it; mixing local tables into linear_call would yield
        # partial per-member grads that vma tracking cannot detect)
        loss_batch = {k: v for k, v in batch.items() if k not in ("fa_eid", "ra_eid")}
        rc, rc_metrics = recon_loss(params, hs, loss_batch, k_neg)
        pl_, new_state = prob_loss(params, state, hf, batch, True, k_drop)
        fl = func_loss(hf, batch)
        total = weights[0] * rc + weights[1] * pl_ + weights[2] * fl
        metrics = dict(rc_metrics)
        metrics.update(recon_loss=rc, prob_loss=pl_, func_loss=fl,
                       kl_loss=jnp.zeros((), hs.dtype), loss=total)

        # pmean over the axes each leaf still varies on: averages the dp
        # shards, and is a numeric no-op over mp (already replicated there —
        # the vma checker just can't always prove it). Without vma tracking
        # (the interpret-mode pallas path, see check_vma below) pmean over
        # both axes unconditionally — same numbers, no tracking to consult.
        def replicate(x):
            if not check_vma:
                return jax.lax.pmean(x, ("dp", "mp"))
            axes = tuple(a for a in ("dp", "mp") if a in getattr(x.aval, "vma", ()))
            return jax.lax.pmean(x, axes) if axes else x

        total = replicate(total)
        new_state = jax.tree.map(replicate, new_state)
        metrics = jax.tree.map(replicate, metrics)
        return total, (new_state, metrics)

    # CRITICAL: differentiate THROUGH shard_map (grad outside), never inside.
    # Inside shard_map, jax.grad yields per-member partial gradients for the
    # node/edge-sharded compute (each member only sees its slice's
    # contribution) while replicated compute yields full gradients — no
    # single collective fixes that mix. Differentiating through the
    # shard_map'ed loss uses shard_map's own transpose rules, which insert
    # the correct psums at the replicated/varying boundaries.
    # check_vma=True is the default correctness story (replication tracking
    # inserts the transpose psums). The interpret-mode Pallas path cannot run
    # under it (jax's pallas HLO interpreter evaluates the kernel jaxpr with
    # vma-free internal grid indices and trips the vma checker), so that
    # path runs check_vma=False with the pvary/psum structure made explicit:
    # the kernel custom-VJP's pvary lifts + the unconditional pmean above.
    # Grad parity vs the dp-only step is asserted by tests/test_sharded.py.
    check_vma = not (use_pallas and interpret)
    vma = frozenset(("dp", "mp")) if (use_pallas and check_vma) else None
    rep = P()
    loss_shmap = shard_map(
        _loss_member, mesh=mesh,
        in_specs=(rep, rep, bspecs, rep, rep),
        out_specs=(rep, (rep, rep)),
        check_vma=check_vma,
    )

    def _train(params, state, opt_state, batch, rng, weights):
        grad_fn = jax.value_and_grad(loss_shmap, has_aux=True)
        (_, (new_state, metrics)), grads = grad_fn(params, state, batch, rng, weights)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, state | new_state, opt_state, metrics

    return jax.jit(_train, donate_argnums=(0, 1, 2) if donate else ())


def build_batch_specs(batch, mp_axis: str = "mp"):
    node_sharded = {"gate", "forward_level", "prob", "deg_in", "deg_out"}
    block_sharded = {"fa_src", "fa_slot", "fa_valid", "ra_src", "ra_slot",
                     "ra_valid", "fa_eid", "ra_eid"}
    edge_sharded = {"lv_edge_src", "lv_edge_dst_slot", "lv_edge_valid", "lv_edge_id"}
    specs = {}
    for k in batch:
        if k in node_sharded:
            specs[k] = P(mp_axis)
        elif k in block_sharded:
            specs[k] = P(mp_axis, None)
        elif k in edge_sharded:
            specs[k] = P(None, mp_axis)
        elif k in _MEMBER_SHARDED:
            specs[k] = P(None, mp_axis, None)
        else:
            specs[k] = P()
    return specs


# dst-complete member tables (batching.shard_levels_by_dst): [L, mp, ...]
_MEMBER_SHARDED = {"mp_lv_edge_src", "mp_lv_edge_dst_slot", "mp_lv_edge_valid",
                   "mp_lv_edge_id", "mp_lv_nodes", "mp_lv_node_valid"}
