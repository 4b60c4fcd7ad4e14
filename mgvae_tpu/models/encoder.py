"""Structural encoders.

``MultiGCNEncoder`` / ``DirectMultiGCNEncoder`` rebuild the reference's
whole-graph recurrent GCN towers (DG_VAE/deepgate/digae_layer.py:232-297):
per round, a sum-aggregation of linearly-transformed neighbor states
(AggConv, arch/gcn_conv.py:15-45) feeds a one-step GRU together with the
node's input feature; optionally LayerNorm; then the same again over
reversed edges. Note the reference applies the SAME LayerNorm instance after
the forward and reverse halves (digae_layer.py:254,269-275) — replicated
here with a single shared "ln" parameter.

TPU formulation: dense [N, D] matmuls + one XLA segment_sum per direction —
no message-passing object model, no torch_scatter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.init import (
    gru_cell_apply,
    gru_cell_init,
    layernorm_apply,
    layernorm_init,
    linear_apply,
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


def multigcn_apply(
    params,
    x_feat: jnp.ndarray,       # [N, F] input features
    edge_src: jnp.ndarray,     # [E] int32
    edge_dst: jnp.ndarray,     # [E] int32
    edge_valid: jnp.ndarray,   # [E] bool
    num_rounds: int,
    layernorm: bool,
) -> jnp.ndarray:
    """MultiGCNEncoder.forward (digae_layer.py:257-277); returns [N, D]."""
    n = x_feat.shape[0]
    dim = params["aggr"]["w"].shape[1]
    state = jnp.ones((n, dim), x_feat.dtype)
    ev = edge_valid[:, None].astype(x_feat.dtype)

    def half_round(state, aggr_p, gru_p, src, dst):
        msg_e = linear_apply(aggr_p, state[src]) * ev
        msg = segment_sum(msg_e, dst, n)
        state = gru_cell_apply(gru_p, jnp.concatenate([msg, x_feat], axis=-1), state)
        if layernorm:
            state = layernorm_apply(params["ln"], state)
        return state

    for _ in range(num_rounds):
        state = half_round(state, params["aggr"], params["update"], edge_src, edge_dst)
        # reverse direction (enable_reverse is hardwired True, digae_layer.py:239)
        state = half_round(state, params["aggr_r"], params["update_r"], edge_dst, edge_src)
    return state


def direct_multigcn_init(key, dim_hidden: int, dim_feature: int, layernorm: bool, dtype=jnp.float32):
    """DirectMultiGCNEncoder: independent source/target towers (digae_layer.py:280-297)."""
    ks, kt = jax.random.split(key)
    return {
        "source": multigcn_init(ks, dim_hidden, dim_feature, layernorm, dtype),
        "target": multigcn_init(kt, dim_hidden, dim_feature, layernorm, dtype),
    }


def direct_multigcn_apply(params, x_feat, edge_src, edge_dst, edge_valid, s_rounds, t_rounds, layernorm):
    s = multigcn_apply(params["source"], x_feat, edge_src, edge_dst, edge_valid, s_rounds, layernorm)
    t = multigcn_apply(params["target"], x_feat, edge_src, edge_dst, edge_valid, t_rounds, layernorm)
    return s, t
