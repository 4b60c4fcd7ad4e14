"""Structural encoders.

``MultiGCNEncoder`` / ``DirectMultiGCNEncoder`` rebuild the reference's
whole-graph recurrent GCN towers (DG_VAE/deepgate/digae_layer.py:232-297):
per round, a sum-aggregation of linearly-transformed neighbor states
(AggConv, arch/gcn_conv.py:15-45) feeds a one-step GRU together with the
node's input feature; optionally LayerNorm; then the same again over
reversed edges. Note the reference applies the SAME LayerNorm instance after
the forward and reverse halves (digae_layer.py:254,269-275) — replicated
here with a single shared "ln" parameter.

TPU formulation, two layers of algebra over the reference:
  1. AggConv's sum_j (W x_j + b) == W (sum_j x_j) + deg * b — so the linear
     runs once per NODE, not per edge, and the aggregation is a raw sum.
  2. That sum runs as *blocked-CSR batched one-hot matmuls* on the MXU
     (data/batching.py agg tables): TPU scatter-adds serialize (~74 us per
     round on a 10k-edge batch, measured); a [nb, Eb, 128] one-hot einsum
     is ~5x faster and fully pipelined. Falls back to XLA segment_sum when
     the tables are absent (e.g. hand-built batches).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.init import (
    gru_cell_apply,
    gru_cell_init,
    layernorm_apply,
    layernorm_init,
    linear_init,
)
from ..ops.segment import segment_sum


def multigcn_init(key, dim_hidden: int, dim_feature: int, layernorm: bool, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "aggr": linear_init(k1, dim_hidden, dim_hidden, dtype),
        "update": gru_cell_init(k2, dim_hidden + dim_feature, dim_hidden, dtype),
        "aggr_r": linear_init(k3, dim_hidden, dim_hidden, dtype),
        "update_r": gru_cell_init(k4, dim_hidden + dim_feature, dim_hidden, dtype),
    }
    if layernorm:
        p["ln"] = layernorm_init(dim_hidden, dtype)
    return p


def blocked_neighbor_sum(state, src_tbl, slot_tbl, valid_tbl, block_d: int = 128):
    """sum of state rows over in/out-neighbors, via blocked dense matmuls.

    src_tbl/slot_tbl/valid_tbl: [nb, Eb] (see batching._blocked_tables).
    state: [..., N, D] (optional leading axes, e.g. the stacked source/
    target towers). Returns [..., nb*block_d, D].
    """
    msgs = jnp.take(state, src_tbl, axis=-2)                 # [..., nb, Eb, D]
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_d), 2)
    onehot = ((slot_tbl[..., None] == slots) & valid_tbl[..., None]).astype(state.dtype)
    agg = jnp.einsum("bes,...bed->...bsd", onehot, msgs)     # [..., nb, Bd, D]
    return agg.reshape(state.shape[:-2] + (-1, state.shape[-1]))


def _blocked_neighbor_sum_t(state, fwd_tbls, rev_tbls):
    """blocked_neighbor_sum with an explicit TRANSPOSE rule.

    The op is linear in ``state``: out = M @ state with M the (blocked)
    adjacency. Autodiff of the gather inside blocked_neighbor_sum would
    otherwise emit a serializing TPU scatter-add in the backward (~125 us
    per half-round — the exact pathology the one-hot forward avoids).
    M^T @ cot is just the neighbor sum over the REVERSED edges, and the
    batch already carries both orientations (fa_*/ra_* are built from the
    same edge list with by/other swapped, data/batching.py:218-227), so the
    backward rides the same MXU einsum path. linear_call gives both the
    JVP and the transpose from the pair."""
    from jax.custom_derivatives import linear_call

    def f(tbls, s):
        return blocked_neighbor_sum(s, *tbls[0])

    def ft(tbls, cot):
        return blocked_neighbor_sum(cot, *tbls[1])

    return linear_call(f, ft, (fwd_tbls, rev_tbls), state)


def gather_rows_t(x, idx, tbls):
    """x[idx] with an explicit MXU transpose: the adjoint of a row gather is
    a scatter-add, which serializes on TPU. ``tbls`` = (eid, slot, valid)
    blocked-CSR tables grouping the GATHER SLOTS by target node
    (data/batching fa_eid/ra_eid): the scatter becomes the same batched
    one-hot einsum the neighbor sums ride. Correctness caveat: the tables
    cover only VALID slots, so cotangents of padding rows are dropped —
    callers must guarantee those cotangents are zero (every use masks
    invalid entries before consuming the gather's output)."""
    from jax.custom_derivatives import linear_call

    n = x.shape[0]

    def f(_, xx):
        return xx[idx]

    def ft(_, cot):
        return blocked_neighbor_sum(cot, *tbls)[:n]

    return linear_call(f, ft, None, x)


def check_gather_transpose(x, idx, tbls, valid):
    """Debug/test helper for NEW gather_rows_t call sites (ADVICE r3): the
    eid tables cover only VALID slots, so the linear_call transpose is the
    exact adjoint ONLY when the consumer masks invalid entries. This
    compares both adjoints under a random cotangent masked by ``valid`` and
    returns the max abs difference (0.0 when the contract holds). Call it
    from a test whenever a new site starts feeding gather_rows_t."""
    key = jax.random.PRNGKey(0)
    cot = jax.random.normal(key, idx.shape + x.shape[1:], x.dtype)
    cot = jnp.where(jnp.reshape(valid, valid.shape + (1,) * (cot.ndim - valid.ndim)),
                    cot, 0.0)
    _, vjp_t = jax.vjp(lambda xx: gather_rows_t(xx, idx, tbls), x)
    _, vjp_p = jax.vjp(lambda xx: xx[idx], x)
    return float(jnp.abs(vjp_t(cot)[0] - vjp_p(cot)[0]).max())


def _neighbor_sum(state, batch, reverse: bool):
    n = state.shape[0]
    if "fa_src" in batch and "ra_src" in batch:
        fa = (batch["fa_src"], batch["fa_slot"], batch["fa_valid"])
        ra = (batch["ra_src"], batch["ra_slot"], batch["ra_valid"])
        return _blocked_neighbor_sum_t(state, *((ra, fa) if reverse else (fa, ra)))
    if not reverse and "fa_src" in batch:
        return blocked_neighbor_sum(state, batch["fa_src"], batch["fa_slot"], batch["fa_valid"])
    if reverse and "ra_src" in batch:
        return blocked_neighbor_sum(state, batch["ra_src"], batch["ra_slot"], batch["ra_valid"])
    src = batch["edge_dst"] if reverse else batch["edge_src"]
    dst = batch["edge_src"] if reverse else batch["edge_dst"]
    ev = batch["edge_valid"][:, None].astype(state.dtype)
    return segment_sum(state[src] * ev, dst, n)


def multigcn_apply(
    params,
    x_feat: jnp.ndarray,   # [N, F] input features
    batch: dict,           # needs edge_src/edge_dst/edge_valid (+ agg tables)
    num_rounds: int,
    layernorm: bool,
    remat: bool = False,
) -> jnp.ndarray:
    """MultiGCNEncoder.forward (digae_layer.py:257-277); returns [N, D]."""
    n = x_feat.shape[0]
    dim = params["aggr"]["w"].shape[1]
    state = jnp.ones((n, dim), x_feat.dtype)
    deg_in = batch.get("deg_in")
    deg_out = batch.get("deg_out")
    if deg_in is None:
        ev = batch["edge_valid"].astype(x_feat.dtype)
        deg_in = segment_sum(ev, batch["edge_dst"], n)
        deg_out = segment_sum(ev, batch["edge_src"], n)
    else:
        # batch arrays are f32; a mixed multiply would promote the whole
        # tower back to f32 in bf16 throughput mode
        deg_in = deg_in.astype(x_feat.dtype)
        deg_out = deg_out.astype(x_feat.dtype)

    def half_round(state, aggr_p, gru_p, reverse, deg):
        nbr = _neighbor_sum(state, batch, reverse)
        # AggConv: sum_j (W x_j + b) = W (sum x_j) + deg * b
        msg = nbr @ aggr_p["w"] + deg[:, None] * aggr_p["b"]
        state = gru_cell_apply(gru_p, jnp.concatenate([msg, x_feat], axis=-1), state)
        if layernorm:
            state = layernorm_apply(params["ln"], state)
        return state

    if remat:
        # giant graphs: save only the [N, D] half-round states and recompute
        # the GRU gate temps in the backward — the saved [N, 3D] gi/gh
        # intermediates are the largest HBM allocations at N ~ 500k
        half_round = jax.checkpoint(half_round, static_argnums=(3,))
    for _ in range(num_rounds):
        state = half_round(state, params["aggr"], params["update"], False, deg_in)
        # reverse direction (enable_reverse is hardwired True, digae_layer.py:239)
        state = half_round(state, params["aggr_r"], params["update_r"], True, deg_out)
    return state


def direct_multigcn_init(key, dim_hidden: int, dim_feature: int, layernorm: bool, dtype=jnp.float32):
    """DirectMultiGCNEncoder: independent source/target towers (digae_layer.py:280-297)."""
    ks, kt = jax.random.split(key)
    return {
        "source": multigcn_init(ks, dim_hidden, dim_feature, layernorm, dtype),
        "target": multigcn_init(kt, dim_hidden, dim_feature, layernorm, dtype),
    }


def _multigcn_apply_stacked(params_st, x_feat, batch, num_rounds, layernorm,
                            remat=False):
    """Both towers in one pass: params stacked on a leading [2] axis, state
    [2, N, D]. The neighbor sum is leading-dim aware (linear_call has no
    vmap rule), everything per-tower (AggConv matmul, GRU, layernorm) is
    vmapped — every matmul runs at double batch."""
    n = x_feat.shape[0]
    dim = params_st["aggr"]["w"].shape[-1]
    state = jnp.ones((2, n, dim), x_feat.dtype)
    deg_in = batch["deg_in"].astype(x_feat.dtype)
    deg_out = batch["deg_out"].astype(x_feat.dtype)

    def per_tower(aggr_p, gru_p, ln_p, nbr_t, st_t, deg):
        msg = nbr_t @ aggr_p["w"] + deg[:, None] * aggr_p["b"]
        st = gru_cell_apply(gru_p, jnp.concatenate([msg, x_feat], axis=-1), st_t)
        if layernorm:
            st = layernorm_apply(ln_p, st)
        return st

    ln_st = params_st.get("ln")
    tower = jax.vmap(per_tower, in_axes=(0, 0, 0 if layernorm else None, 0, 0, None))

    def half_round(state, aggr_key, gru_key, reverse, deg):
        nbr = _neighbor_sum(state, batch, reverse)
        return tower(params_st[aggr_key], params_st[gru_key], ln_st, nbr, state, deg)

    if remat:
        # giant graphs: keep only the [2, N, D] states across half-rounds;
        # the [2, N, 3D] GRU gate temps (the top HBM allocations at
        # N ~ 500k — see tmp/r5_onchip/giant_513k_f32.log) are recomputed
        # in the backward instead of saved
        half_round = jax.checkpoint(half_round, static_argnums=(1, 2, 3))
    for _ in range(num_rounds):
        state = half_round(state, "aggr", "update", False, deg_in)
        state = half_round(state, "aggr_r", "update_r", True, deg_out)
    return state[0], state[1]


def direct_multigcn_apply(params, x_feat, batch, s_rounds, t_rounds, layernorm,
                          remat=False):
    if s_rounds == t_rounds and "fa_src" in batch and "ra_src" in batch and "deg_in" in batch:
        # the towers are independent and share x_feat/batch: run them
        # stacked so every matmul/GRU feeds the MXU at double batch.
        # Reference runs them sequentially (digae_layer.py:280-297); same
        # math either way (parity-tested vs the sequential path).
        stacked = jax.tree.map(
            lambda a, b: jnp.stack([a, b]), params["source"], params["target"]
        )
        return _multigcn_apply_stacked(stacked, x_feat, batch, s_rounds,
                                       layernorm, remat=remat)
    s = multigcn_apply(params["source"], x_feat, batch, s_rounds, layernorm,
                       remat=remat)
    t = multigcn_apply(params["target"], x_feat, batch, t_rounds, layernorm,
                       remat=remat)
    return s, t
