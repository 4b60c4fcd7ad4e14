"""DG_AE: the DeepGate-style multi-gate auto-encoder, TPU-native.

Rebuilds the four per-modality models (DG_VAE/deepgate/dg_ae_model_{aig,mig,
xag,xmg}.py) as ONE parameterized skeleton. The reference dispatches to
disjoint per-gate-type aggregator/GRU modules inside a serial Python loop
over DAG levels with per-level ``subgraph`` edge filtering
(dg_ae_model_mig.py:84-129). Because node updates within a level are
independent and the per-type branches are disjoint, that is mathematically a
single level-synchronous update with type-indexed parameters. We therefore:

  * stack all gate-type expert weights into single [in, T*out] matrices so
    each level step is ONE MXU matmul followed by a cheap per-node expert
    selection (static MoE dispatch — no routing collectives);
  * drive the level loop with ``lax.scan`` over the pre-bucketed [L, *]
    level tables emitted by the data layer (static shapes, no recompiles);
  * compute the TFMlpAggr attention (arch/tfmlp.py:37-46) as a decomposed
    dst-query / src-key score plus a masked segment softmax within the
    level's edge chunk.

Input quirk (SURVEY.md §8 quirk 3): the reference feeds the struct encoder
``one_hot(x[:, 1])`` where ``x`` is already one-hot, collapsing the input to
two distinct rows. ``input_quirk=True`` (default) replicates this for
parity; ``False`` feeds the evidently-intended gate one-hot.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..data.graph import MODALITY_GATES, NUM_GATE_TYPES
from ..ops.init import gru_cell_init, linear_apply, linear_init
from ..ops.mlp import mlp_init
from ..ops.segment import segment_softmax, segment_sum
from .encoder import direct_multigcn_apply, direct_multigcn_init


@dataclasses.dataclass(frozen=True)
class DGConfig:
    modality: str = "mig"
    dim_hidden: int = 64
    dim_feature: int = 6
    s_rounds: int = 4
    t_rounds: int = 4
    layernorm: bool = False
    num_rounds: int = 1          # never overridden in the reference (quirk 17)
    input_quirk: bool = True
    variational: bool = False    # DG_VAE mode (adds mu/logstd heads)
    # Rematerialize the struct-encoder half-rounds in the backward (saves
    # the [*, N, 3D] GRU gate temps — the top HBM allocations at giant N;
    # tmp/r5_onchip/giant_513k_f32.log OOM'd at 25G/15.75G without it).
    # None = auto: on when the batch is a single graph past the HBM
    # kernels' static-compile ceiling, off otherwise (recompute costs time
    # where memory isn't scarce).
    remat_struct: bool | None = None
    dim_mlp: int = 32
    compute_dtype: str = "float32"  # set "bfloat16" for TPU throughput mode
    # Level-step segment aggregation strategy:
    #   "onehot": materialize the per-level [Ep, Np] incidence matrix and do
    #     softmax-normalize + aggregate as dense MXU matmuls (TPU scatters
    #     serialize; matmuls don't). Best for the bucketed level sizes the
    #     batcher emits (Np, Ep <= a few thousand).
    #   "scatter": jax.ops.segment_* (better on CPU and for huge levels).
    level_aggr: str = "onehot"
    # Structural encoder family: "multigcn" (--model DG_*, the recurrent
    # AggConv+GRU towers) or "gcn" (--model AE, the 2-layer degree-normalized
    # DirectedGCNConvEncoder, train.py:51-54).
    struct_encoder: str = "multigcn"
    # Mask sampled negatives that collide with real edges (the reference's
    # PyG negative_sampling rejects them; plain uniform admits them with
    # probability ~E/N^2 — see train/losses.recon_loss). Off by default:
    # the bias is negligible on circuit graphs and off matches round-1
    # numbers exactly.
    neg_collision_mask: bool = False
    # TPU matmul precision for fp32: "default" = single bf16 MXU pass per
    # operand (fast; Pallas-vs-XLA |hf| agreement ~1e-3, measured, caused
    # ENTIRELY by this — tmp/exp_numerics.py), "highest" = bf16x6 passes
    # (exact fp32; Pallas-vs-XLA agreement 1.3e-7 on the bench batch).
    # Applies to the XLA paths AND the Pallas kernels (their dots inherit
    # the jax.default_matmul_precision context).
    matmul_precision: str = "default"

    @property
    def gate_types(self) -> tuple:
        return MODALITY_GATES[self.modality]

    @property
    def num_experts(self) -> int:
        return len(self.gate_types)

    @property
    def expert_of_gate(self):
        table = [-1] * NUM_GATE_TYPES
        for i, g in enumerate(self.gate_types):
            table[g] = i
        return jnp.asarray(table, dtype=jnp.int32)


def init_params(key, cfg: DGConfig, dtype=jnp.float32):
    D, T = cfg.dim_hidden, cfg.num_experts
    keys = jax.random.split(key, 16)
    if cfg.struct_encoder == "gcn":
        from .gcn import directed_gcn_encoder_init

        struct = directed_gcn_encoder_init(keys[0], cfg.dim_feature, D, D, dtype)
    else:
        struct = direct_multigcn_init(keys[0], D, cfg.dim_feature, cfg.layernorm, dtype)
    params = {
        "struct": struct,
        "hs_linear": linear_init(keys[1], 2 * D, D, dtype),
        "hs_decompose": linear_init(keys[2], D, 2 * D, dtype),
        "experts": _experts_init(keys[3], cfg, dtype),
    }
    ro_params, ro_state = mlp_init(keys[4], D, cfg.dim_mlp, 1, num_layer=3, norm_layer="batchnorm", dtype=dtype)
    params["readout_prob"] = ro_params
    if cfg.variational:
        params["fc_s_mu"] = linear_init(keys[5], D, D, dtype)
        params["fc_s_logstd"] = linear_init(keys[6], D, D, dtype)
        params["fc_t_mu"] = linear_init(keys[7], D, D, dtype)
        params["fc_t_logstd"] = linear_init(keys[8], D, D, dtype)
    state = {"readout_prob": ro_state}
    return params, state


def _experts_init(key, cfg: DGConfig, dtype):
    """Per-gate-type TFMlpAggr + GRU params, stacked along a T axis.

    Layouts: matmul weights concatenated to [in, T*out] (single-matmul
    dispatch); biases/vectors kept as [T, out] for per-node gather.
    Initialization matches per-module torch init (each expert drawn
    independently, identical distribution).
    """
    D, T = cfg.dim_hidden, cfg.num_experts
    per = {"wq": [], "bq": [], "wk": [], "bk": [], "wv": [], "bv": [],
           "wa_q": [], "wa_k": [], "ba": [],
           "w_ih": [], "w_hh": [], "b_ih": [], "b_hh": []}
    for t in range(T):
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        q = linear_init(k1, 2 * D, D, dtype)
        k_ = linear_init(k2, 2 * D, D, dtype)
        v = linear_init(k3, 2 * D, D, dtype)
        # attn_lin: Linear(2D, 1) split into query/key halves (tfmlp.py:24,42)
        a = linear_init(k4, 2 * D, 1, dtype)
        gru = gru_cell_init(k5, D, D, dtype)
        per["wq"].append(q["w"]); per["bq"].append(q["b"])
        per["wk"].append(k_["w"]); per["bk"].append(k_["b"])
        per["wv"].append(v["w"]); per["bv"].append(v["b"])
        per["wa_q"].append(a["w"][:D, 0]); per["wa_k"].append(a["w"][D:, 0])
        per["ba"].append(a["b"][0])
        per["w_ih"].append(gru["w_ih"]); per["w_hh"].append(gru["w_hh"])
        per["b_ih"].append(gru["b_ih"]); per["b_hh"].append(gru["b_hh"])
    return {
        # [2D, T*D] — one matmul computes q/k/v for every expert
        "wq": jnp.concatenate(per["wq"], axis=1),
        "wk": jnp.concatenate(per["wk"], axis=1),
        "wv": jnp.concatenate(per["wv"], axis=1),
        "bq": jnp.stack(per["bq"]),        # [T, D]
        "bk": jnp.stack(per["bk"]),
        "bv": jnp.stack(per["bv"]),
        "wa_q": jnp.stack(per["wa_q"]),    # [T, D]
        "wa_k": jnp.stack(per["wa_k"]),
        "ba": jnp.stack(per["ba"]),        # [T]
        "w_ih": jnp.concatenate(per["w_ih"], axis=1),  # [D, T*3D]
        "w_hh": jnp.concatenate(per["w_hh"], axis=1),
        "b_ih": jnp.stack(per["b_ih"]),    # [T, 3D]
        "b_hh": jnp.stack(per["b_hh"]),
    }


def _select_expert(stacked: jnp.ndarray, expert: jnp.ndarray, T: int) -> jnp.ndarray:
    """stacked: [N, T*D] -> per-row expert slice [N, D]."""
    n = stacked.shape[0]
    d = stacked.shape[1] // T
    resh = stacked.reshape(n, T, d)
    return jnp.take_along_axis(resh, expert[:, None, None], axis=1)[:, 0, :]


_LV_KEYS = ("lv_nodes", "lv_node_valid", "lv_edge_src", "lv_edge_dst_slot",
            "lv_edge_valid", "lv_edge_id")


def _lv_views(batch):
    """Level tables normalized to flat [C*L, ...] rows plus a per-row node
    offset mapping chunk-local ids into the global node space.

    Chunked batches (data/batching.collate_chunked) carry a leading [C, L]
    axis with LOCAL node ids; chunk k's nodes live at global rows
    [k*N_sub, (k+1)*N_sub). Plain batches are the C == 1 case (offset 0).
    """
    lv_nodes = batch["lv_nodes"]
    if lv_nodes.ndim == 2:
        off = jnp.zeros((lv_nodes.shape[0],), jnp.int32)
        return {k: batch[k] for k in _LV_KEYS}, off, 1
    C, L = lv_nodes.shape[:2]
    n_sub = batch["gate"].shape[0] // C
    tabs = {k: batch[k].reshape((C * L,) + batch[k].shape[2:]) for k in _LV_KEYS}
    off = jnp.repeat(jnp.arange(C, dtype=jnp.int32) * n_sub, L)
    return tabs, off, C


def struct_input(gate: jnp.ndarray, cfg: DGConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Struct-encoder input features [N, dim_feature].

    quirk mode: one_hot(x[:,1]) of the already-one-hot features — i.e.
    one_hot(gate == 1) (dg_ae_model_mig.py:71). fixed mode: one_hot(gate).
    """
    ids = jnp.where(gate == 1, 1, 0) if cfg.input_quirk else gate
    return jax.nn.one_hot(ids, cfg.dim_feature, dtype=dtype)


def forward(params, batch, cfg: DGConfig, rng=None, use_pallas: bool = False,
            pallas_interpret: bool = False):
    """Model.forward: returns (hs, hf, aux).

    aux carries the VAE posterior stats when cfg.variational (the fixed
    DG_VAE path — the reference's is broken, SURVEY.md §8 quirk 12) and is
    empty otherwise.

    use_pallas: run the level recurrence as the fused Pallas TPU kernel
    (VMEM-resident and chunked variants carry a hand-written VJP, so
    training rides the kernel too; the HBM-streamed giant-single-graph
    variant is forward-only).
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        if "groups" in batch:
            return _forward_split(params, batch, cfg, rng, use_pallas,
                                  pallas_interpret)
        return _forward(params, batch, cfg, rng, use_pallas, pallas_interpret)


def _forward_split(params, batch, cfg: DGConfig, rng, use_pallas, pallas_interpret):
    """Shape-aware split batch (data/batching.collate_split): each group
    runs the normal forward at its OWN padded dims (padding hugs the group's
    members — the bs64 bucket-padding attack, VERDICT r3 item 7); hs/hf are
    concatenated in the layout the batch's global loss arrays index."""
    hs_l, hf_l, aux_l = [], [], []
    for gi, gb in enumerate(batch["groups"]):
        g_rng = jax.random.fold_in(rng, gi) if rng is not None else None
        hs, hf, aux = _forward(params, gb, cfg, g_rng, use_pallas, pallas_interpret)
        hs_l.append(hs)
        hf_l.append(hf)
        aux_l.append(aux)
    aux = {}
    if aux_l and aux_l[0]:
        aux = {k: jnp.concatenate([a[k] for a in aux_l]) for k in aux_l[0]}
    return jnp.concatenate(hs_l), jnp.concatenate(hf_l), aux


def _forward(params, batch, cfg: DGConfig, rng, use_pallas, pallas_interpret):
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype != jnp.float32:
        # throughput mode: params + activations in bf16 (fp32 master params
        # stay outside; this cast is free under jit). Parity mode is fp32.
        params = jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
    D, T = cfg.dim_hidden, cfg.num_experts
    gate = batch["gate"]
    x_feat = struct_input(gate, cfg, dtype)
    if cfg.struct_encoder == "gcn":
        from .gcn import directed_gcn_encoder_apply

        s, t = directed_gcn_encoder_apply(
            params["struct"], x_feat, x_feat,
            batch["edge_src"], batch["edge_dst"], batch["edge_valid"],
        )
    else:
        s = t = None
        # HARDWARE GATE: the fused struct kernel is correct on-chip
        # (|s| 8.8e-6 at highest precision once the fold/XI einsums run
        # under the same precision context — tmp/r4_onchip/
        # struct_parity2.log; the earlier "2.7e-2 parity failure" was the
        # XLA reference running at default MXU precision) but measured
        # SLOWER than the XLA struct towers on the real chip (fwd 1.30 vs
        # 0.61 ms, fwd+bwd 2.95 vs 1.52 ms, full train step 0.98x): the
        # 8 half-rounds x Np/128 block grid pays the same per-grid-step
        # overhead floor as the level kernel but replaces dense stacked
        # [N, 2D] einsums XLA already fuses well. Kept for interpret-mode
        # coverage and future wide-D use; hardware engages it only via
        # MGVAE_STRUCT_KERNEL=1.
        import os as _os

        _struct_hw_ok = pallas_interpret or _os.environ.get(
            "MGVAE_STRUCT_KERNEL") == "1"
        if (use_pallas and _struct_hw_ok and cfg.s_rounds == cfg.t_rounds
                and "fa_src" in batch and "deg_in" in batch
                and batch["gate"].ndim == 1):
            from ..ops.pallas.struct_kernel import (
                struct_kernel_fits,
                struct_towers_pallas,
            )

            eb = max(batch["fa_src"].shape[1], batch["ra_src"].shape[1])
            if struct_kernel_fits(batch["gate"].shape[0], eb, D):
                # fused tower kernel: whole 2*s_rounds half-round loop in one
                # pallas_call with saved-residual backward (VERDICT r3 item 2)
                s, t = struct_towers_pallas(
                    params["struct"], x_feat, batch, cfg.s_rounds,
                    cfg.layernorm, interpret=pallas_interpret,
                    precision=cfg.matmul_precision,
                )
        if s is None:
            if cfg.remat_struct is None:
                from ..ops.pallas.level_kernel import HBM_COMPILE_SAFE_NODES

                remat = x_feat.shape[0] > HBM_COMPILE_SAFE_NODES
            else:
                remat = cfg.remat_struct
            s, t = direct_multigcn_apply(
                params["struct"], x_feat, batch, cfg.s_rounds, cfg.t_rounds,
                cfg.layernorm, remat=remat,
            )
    aux = {}
    if cfg.variational:
        assert rng is not None, "variational forward needs an rng"
        s_mu = linear_apply(params["fc_s_mu"], s)
        s_logstd = linear_apply(params["fc_s_logstd"], s)
        t_mu = linear_apply(params["fc_t_mu"], t)
        t_logstd = linear_apply(params["fc_t_logstd"], t)
        ks, kt = jax.random.split(rng)
        s = s_mu + jnp.exp(s_logstd) * jax.random.normal(ks, s_mu.shape, s_mu.dtype)
        t = t_mu + jnp.exp(t_logstd) * jax.random.normal(kt, t_mu.shape, t_mu.dtype)
        aux = {"s_mu": s_mu, "s_logstd": s_logstd, "t_mu": t_mu, "t_logstd": t_logstd}

    hs = linear_apply(params["hs_linear"], jnp.concatenate([s, t], axis=-1))
    hf = jnp.zeros_like(hs)
    expert = cfg.expert_of_gate[gate]          # [N], -1 for non-expert gates
    ex = params["experts"]

    if cfg.num_rounds == 1:
        if use_pallas:
            hf = _level_scan_pallas(params, batch, cfg, hs, expert, pallas_interpret)
        else:
            hf = _level_scan_fast(params, batch, cfg, hs, expert)
        return hs, hf, aux

    def level_step(hf, lv):
        nodes = lv["nodes"] + lv["off"]         # [Np] global ids
        upd_mask = lv["node_valid"] & (expert[nodes] >= 0)
        e_dst = jnp.maximum(expert[nodes], 0)   # [Np]
        hf_dst = hf[nodes]
        state_dst = jnp.concatenate([hs[nodes], hf_dst], axis=-1)
        q = _select_expert(state_dst @ ex["wq"], e_dst, T) + ex["bq"][e_dst]
        aq = jnp.sum(q * ex["wa_q"][e_dst], axis=-1) + ex["ba"][e_dst]

        src = lv["edge_src"] + lv["off"]        # [Ep] global ids
        dslot = lv["edge_dst_slot"]
        evalid = lv["edge_valid"]
        e_edge = e_dst[dslot]
        state_src = jnp.concatenate([hs[src], hf[src]], axis=-1)
        # one matmul for k and v together (halves per-level dispatches)
        kv = state_src @ jnp.concatenate([ex["wk"], ex["wv"]], axis=1)
        k = _select_expert(kv[:, : kv.shape[1] // 2], e_edge, T) + ex["bk"][e_edge]
        v = _select_expert(kv[:, kv.shape[1] // 2 :], e_edge, T) + ex["bv"][e_edge]
        score = aq[dslot] + jnp.sum(k * ex["wa_k"][e_edge], axis=-1)
        np_ = nodes.shape[0]
        if cfg.level_aggr == "onehot":
            # PyG-softmax semantics via dense incidence matmuls (tfmlp.py:43):
            # scatter-free normalize + aggregate, rides the MXU.
            slots = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
            inc = (dslot[:, None] == slots) & evalid[:, None]        # [Ep, Np]
            inc_f = inc.astype(v.dtype)
            smax = jnp.max(jnp.where(inc, score[:, None], -1e30), axis=0)
            ex_s = jnp.exp(score - smax[dslot]) * evalid.astype(v.dtype)
            denom = ex_s @ inc_f + 1e-16                             # [Np]
            attn = ex_s / denom[dslot]
            msg = inc_f.T @ (v * attn[:, None])                      # [Np, D]
        else:
            attn = segment_softmax(score, dslot, np_, valid=evalid)
            msg = segment_sum(v * attn[:, None], dslot, np_)   # [Np, D]

        gi = _select_expert(msg @ ex["w_ih"], e_dst, T) + ex["b_ih"][e_dst]
        gh = _select_expert(hf_dst @ ex["w_hh"], e_dst, T) + ex["b_hh"][e_dst]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        nw = jnp.tanh(i_n + r * h_n)
        hf_new = (1.0 - z) * nw + z * hf_dst
        hf_new = jnp.where(upd_mask[:, None], hf_new, hf_dst)
        return hf.at[nodes].set(hf_new), None

    tabs, lv_off, _ = _lv_views(batch)
    lv = {
        "nodes": tabs["lv_nodes"],
        "node_valid": tabs["lv_node_valid"],
        "edge_src": tabs["lv_edge_src"],
        "edge_dst_slot": tabs["lv_edge_dst_slot"],
        "edge_valid": tabs["lv_edge_valid"],
        "off": lv_off,
    }
    for _ in range(cfg.num_rounds):
        hf, _ = jax.lax.scan(level_step, hf, lv)
    return hs, hf, aux


def _level_statics(params, batch, cfg: DGConfig, hs, expert):
    """Precompute everything the level recurrence needs that does not depend
    on hf — see _level_scan_fast for why this exists."""
    dtype = hs.dtype
    D, T = cfg.dim_hidden, cfg.num_experts
    ex = params["experts"]
    edge_src, edge_dst = batch["edge_src"], batch["edge_dst"]

    e_dst_full = jnp.maximum(expert[edge_dst], 0)          # [E]
    # --- per-node query score: q depends on [hs, 0] only -----------------
    e_node = jnp.maximum(expert, 0)
    q_all = hs @ ex["wq"][:D, :]                            # [N, T*D]
    q = _select_expert(q_all, e_node, T) + ex["bq"][e_node]
    aq_n = jnp.sum(q * ex["wa_q"][e_node], axis=-1) + ex["ba"][e_node]  # [N]
    # --- per-edge hs-side key/value --------------------------------------
    # node->edge gathers ride explicit one-hot transposes when the batch
    # carries the eid tables: their autodiff adjoints are serializing TPU
    # scatters over E rows otherwise (padding-edge cotangents are zero —
    # every consumer masks invalid edges — so the valid-only tables are the
    # exact adjoint; see models/encoder.gather_rows_t)
    wkv_hs = jnp.concatenate([ex["wk"][:D, :], ex["wv"][:D, :]], axis=1)  # [D, 2TD]
    if "ra_eid" in batch:
        from .encoder import gather_rows_t

        hs_e = gather_rows_t(
            hs, edge_src, (batch["ra_eid"], batch["ra_slot"], batch["ra_valid"])
        )
        aq_e = gather_rows_t(
            aq_n[:, None], edge_dst,
            (batch["fa_eid"], batch["fa_slot"], batch["fa_valid"]),
        )[:, 0]
    else:
        hs_e, aq_e = hs[edge_src], aq_n[edge_dst]
    kv_hs = hs_e @ wkv_hs                                   # [E, 2TD]
    khs = _select_expert(kv_hs[:, : T * D], e_dst_full, T) + ex["bk"][e_dst_full]
    vhs = _select_expert(kv_hs[:, T * D :], e_dst_full, T) + ex["bv"][e_dst_full]
    score_static = (
        jnp.sum(khs * ex["wa_k"][e_dst_full], axis=-1) + aq_e
    )                                                       # [E]
    # packed per-edge statics: [vhs | score | expert] -> ONE gather per level
    pack = jnp.concatenate(
        [vhs, score_static[:, None], e_dst_full[:, None].astype(dtype)], axis=1
    )                                                       # [E, D+2]
    wkv_hf = jnp.concatenate([ex["wk"][D:, :], ex["wv"][D:, :]], axis=1)  # [D, 2TD]
    return pack, wkv_hf


def _pack_lv_gather(pack, batch, tabs):
    """pack[lv_edge_id] ([C*L, Ep, W]) with an explicit transpose: every
    valid edge fills exactly ONE level slot, so the adjoint of this gather
    is a plain masked gather by the inverse (edge -> flat slot) table
    (data/batching edge_lv_row) — not a C*L*Ep-row TPU scatter. Padding
    slots' cotangents are zero (the level math masks them), so pointing
    padding edges at slot 0 under the edge_valid mask is exact."""
    lv_id = tabs["lv_edge_id"]
    if "edge_lv_row" not in batch:
        return pack[lv_id]
    from jax.custom_derivatives import linear_call

    lv_row = batch["edge_lv_row"]
    evm = batch["edge_valid"][:, None].astype(pack.dtype)

    def f(_, p):
        return p[lv_id]

    def ft(_, cot):
        return cot.reshape(-1, cot.shape[-1])[lv_row] * evm

    return linear_call(f, ft, None, pack)


def _level_scan_fast(params, batch, cfg: DGConfig, hs, expert):
    """Level scan specialized for num_rounds == 1 (the only configuration the
    reference ever runs, SURVEY.md §8 quirk 17).

    Key observation: with one round, a node's hf is zero until its own level
    processes it, so every hs-dependent attention term is static w.r.t. the
    scan. We therefore precompute, ONCE, with full-batch MXU matmuls:
      * per-edge k/v contributions of hs (expert-selected, bias included)
      * the complete attention query score per destination
      * the GRU hidden-side gate preactivations (just b_hh — h is 0)
    leaving per level only: one hf gather, one packed static gather, one
    [Ep,D]x[D,2TD] matmul, the masked softmax + incidence aggregation, and
    the GRU input matmul. ~2x fewer serialized HLOs per level than the
    general path.
    """
    dtype = hs.dtype
    D, T = cfg.dim_hidden, cfg.num_experts
    ex = params["experts"]
    pack, wkv_hf = _level_statics(params, batch, cfg, hs, expert)

    def level_step(hf, lv):
        src = lv["edge_src"] + lv["off"]                    # [Ep] global ids
        dslot = lv["edge_dst_slot"]
        evalid = lv["edge_valid"]
        nodes = lv["nodes"] + lv["off"]                     # [Np] global ids
        np_ = nodes.shape[0]

        pk = lv["pack"]                                     # [Ep, D+2]
        e_edge = pk[:, -1].astype(jnp.int32)
        hf_src = hf[src]                                    # [Ep, D]
        kv_hf = hf_src @ wkv_hf                             # [Ep, 2TD]
        khf = _select_expert(kv_hf[:, : T * D], e_edge, T)
        vhf = _select_expert(kv_hf[:, T * D :], e_edge, T)
        score = pk[:, D] + jnp.sum(khf * ex["wa_k"][e_edge], axis=-1)
        v = pk[:, :D] + vhf

        if cfg.level_aggr == "onehot":
            slots = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
            inc = (dslot[:, None] == slots) & evalid[:, None]
            inc_f = inc.astype(dtype)
            # mask BEFORE max/exp: raw padding scores must never reach exp,
            # or NaNs leak into the backward pass even when the primal is
            # masked (where() does not block NaN cotangents).
            score_m = jnp.where(evalid, score, -1e30)
            smax = jnp.maximum(jnp.max(jnp.where(inc, score[:, None], -1e30), axis=0), -1e30)
            shifted = jnp.clip(score_m - smax[dslot], -80.0, 0.0)
            ex_s = jnp.exp(shifted) * evalid.astype(dtype)
            denom = ex_s @ inc_f + 1e-16
            attn = ex_s / denom[dslot]
            msg = inc_f.T @ (v * attn[:, None])             # [Np, D]
        else:
            attn = segment_softmax(score, dslot, np_, valid=evalid)
            msg = segment_sum(v * attn[:, None], dslot, np_)

        e_n = jnp.maximum(expert[nodes], 0)
        gi = _select_expert(msg @ ex["w_ih"], e_n, T) + ex["b_ih"][e_n]
        gh = ex["b_hh"][e_n]                                # h == 0 pre-update
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        nw = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * nw
        upd = lv["node_valid"] & (expert[nodes] >= 0)
        return hf.at[nodes].set(jnp.where(upd[:, None], h_new, 0.0)), None

    tabs, lv_off, _ = _lv_views(batch)
    lv = {
        "nodes": tabs["lv_nodes"],
        "node_valid": tabs["lv_node_valid"],
        "edge_src": tabs["lv_edge_src"],
        "edge_dst_slot": tabs["lv_edge_dst_slot"],
        "edge_valid": tabs["lv_edge_valid"],
        # pack gathered UPFRONT (transpose = inverse-table gather, no
        # per-level scatter in the backward scan; _pack_lv_gather)
        "pack": _pack_lv_gather(pack, batch, tabs),
        "off": lv_off,
    }
    hf = jnp.zeros_like(hs)
    hf, _ = jax.lax.scan(level_step, hf, lv)
    return hf


def _level_scan_pallas(params, batch, cfg: DGConfig, hs, expert, interpret=False):
    """Fused-kernel level recurrence (ops/pallas/level_kernel.py), with a
    hand-written VJP so training can use it too.

    Large multi-graph batches arrive CHUNKED (data/batching.collate_chunked):
    the kernel runs a (chunk, level) grid with per-chunk hf blocks resident
    in VMEM — constant VMEM footprint at any batch size. Single graphs too
    large for VMEM stream hf through HBM (forward-only)."""
    from ..ops.pallas.level_kernel import (
        LANE,
        _round_up,
        kernel_fits,
        pallas_level_scan,
        pallas_level_scan_hbm,
    )

    D, T = cfg.dim_hidden, cfg.num_experts
    ex = params["experts"]
    pack, wkv_hf = _level_statics(params, batch, cfg, hs, expert)
    # pad the per-edge static pack to a lane-aligned width
    pw = _round_up(D + 2, LANE)
    pack = jnp.pad(pack, ((0, 0), (0, pw - pack.shape[1])))
    tabs, lv_off, C = _lv_views(batch)
    n_sub = hs.shape[0] // C
    pack_lv = _pack_lv_gather(pack, batch, tabs)            # [C*L, Ep, PW]
    lv_nodes = tabs["lv_nodes"]                             # chunk-LOCAL ids
    nodes_glob = lv_nodes + lv_off[:, None]
    lv_upd = (tabs["lv_node_valid"] & (expert[nodes_glob] >= 0)).astype(jnp.int32)
    lv_e_n = jnp.maximum(expert[nodes_glob], 0)
    args = (
        pack_lv,
        tabs["lv_edge_src"],
        tabs["lv_edge_dst_slot"],
        tabs["lv_edge_valid"].astype(jnp.int32),
        lv_nodes,
        lv_upd,
        lv_e_n,
        wkv_hf,
        ex["w_ih"],
        ex["b_ih"],
        ex["b_hh"],
        ex["wa_k"],
    )
    # matmul precision is threaded EXPLICITLY: the custom-VJP backward is
    # traced outside forward()'s default_matmul_precision context, so the
    # ambient setting would silently not reach the backward kernels
    prec = cfg.matmul_precision
    if kernel_fits(n_sub, pack_lv.shape[1], lv_nodes.shape[1], D):
        # VMEM-resident variant, differentiable (hand-written VJP)
        return pallas_level_scan(*args, n_sub, D, T, C, interpret, prec)
    from ..ops.pallas.level_kernel import kernel_fits_hbm

    if C == 1 and kernel_fits_hbm(n_sub, pack_lv.shape[1], lv_nodes.shape[1], D):
        # giant single-graph batch: hf streamed through HBM, differentiable
        # (the backward streams hf + the ghf cotangent chunkwise too); bf16
        # halves the DMA bytes exactly where DMA dominates (the ghf stream
        # stays f32 for cotangent-accumulation precision)
        return pallas_level_scan_hbm(*args, n_sub, D, T, interpret, prec)
    if step_kernel_fits(n_sub, pack_lv.shape[1], lv_nodes.shape[1], D):
        # chunked but a chunk exceeds the fused kernel's VMEM gate: scan the
        # single-level STEP kernel over the (chunk, level) rows — hf rides
        # the scan carry (HBM between calls), so only one chunk's slice +
        # one level's tables live in VMEM per call. Differentiable via the
        # step kernel's custom VJP (scan stacks the residuals).
        return _level_scan_step(args, lv_off, hs.shape[0], n_sub, D, T,
                                interpret, prec)
    # a single level exceeds even the step kernel: XLA scan fallback
    return _level_scan_fast(params, batch, cfg, hs, expert)


def step_kernel_fits(n_sub: int, ep: int, np_: int, dim: int) -> bool:
    """The step kernel holds one chunk's hf slice + one level's tables in
    VMEM (no cross-level residence, no stacked residual blocks)."""
    return n_sub <= 65536 and ep <= 2048 and np_ <= 2048 and dim <= 128


def _level_scan_step(args, lv_off, n_total, n_sub, D, T, interpret, prec):
    """lax.scan of pallas_level_step over the (chunk, level) table rows."""
    from ..ops.pallas.level_kernel import pallas_level_step

    (pack_lv, lv_src, lv_dslot, lv_evalid, lv_nodes, lv_upd, lv_e_n,
     wkv_hf, w_ih, b_ih, b_hh, wa_k) = args

    def body(hf, lv):
        hf_c = jax.lax.dynamic_slice_in_dim(hf, lv["off"], n_sub, axis=0)
        h_new = pallas_level_step(
            hf_c, lv["pack"], lv["src"], lv["dslot"], lv["evalid"],
            lv["nodes"], lv["upd"], lv["e_n"],
            wkv_hf, w_ih, b_ih, b_hh, wa_k,
            D, T, interpret, prec,
        )
        nodes_g = lv["nodes"] + lv["off"]
        hf = hf.at[nodes_g].set(jnp.where(lv["upd"][:, None] > 0, h_new, 0.0))
        return hf, None

    lvs = dict(pack=pack_lv, src=lv_src, dslot=lv_dslot, evalid=lv_evalid,
               nodes=lv_nodes, upd=lv_upd, e_n=lv_e_n, off=lv_off)
    hf0 = jnp.zeros((n_total, D), pack_lv.dtype)
    hf, _ = jax.lax.scan(body, hf0, lvs)
    return hf


def hs_decompose(params, hs):
    """hs -> (s, t) for the directed inner-product decoder
    (dg_ae_model_mig.py:170)."""
    st = linear_apply(params["hs_decompose"], hs)
    return jnp.split(st, 2, axis=-1)


def decode_edges(s, t, src, dst, sigmoid=True):
    """DirectedInnerProductDecoder.forward (digae_layer.py:26-33)."""
    logits = jnp.sum(s[src] * t[dst], axis=-1)
    return jax.nn.sigmoid(logits) if sigmoid else logits
