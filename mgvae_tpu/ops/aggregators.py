"""Alternative message-passing aggregators.

Functional rebuilds of the reference's arch variants that are imported but
not instantiated on its live path (SURVEY.md §2.1 "unused aggregators") —
provided for API completeness so experiments that swap aggregators port over:

  MlpAggr      arch/mlp_aggr.py:     sum_j MLP(x_j)
  AttnMLP      arch/aggnmlp.py:      MLP-projected Q/K/V with segment softmax
  DeepSetConv  arch/deepset_conv.py: sum_j MLP(x_j) (DeepSet phi)
  AGNNConv     arch/gat_conv.py:     additive GAT-style attention
  GatedSumConv arch/gated_sum_conv.py: sum_j sigmoid(gate(x_j)) * msg(x_j)
  GCNConv      digae_layer.py:40-56: symmetric-normalized undirected GCN
  InnerProductDecoder digae_layer.py:13-20

All take (params, x [N,Din], edge_src, edge_dst, edge_valid, num_nodes) and
return [N, Dout]; ``reverse=True`` in the reference flips flow — pass
swapped src/dst instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .init import linear_apply, linear_init
from .mlp import mlp_apply, mlp_init
from .segment import segment_softmax, segment_sum


def _masked(x, valid):
    return x * valid[:, None].astype(x.dtype)


# -- MlpAggr ----------------------------------------------------------------

def mlp_aggr_init(key, dim_in, dim_out, dtype=jnp.float32):
    p, s = mlp_init(key, dim_in, dim_out, dim_out, num_layer=3, dtype=dtype)
    return {"mlp": p, "mlp_state": s}


def mlp_aggr_apply(params, x, src, dst, valid, num_nodes):
    msg, _ = mlp_apply(params["mlp"], params["mlp_state"], x[src], train=False, act="relu")
    return segment_sum(_masked(msg, valid), dst, num_nodes)


# -- DeepSetConv --------------------------------------------------------------

deepset_conv_init = mlp_aggr_init
deepset_conv_apply = mlp_aggr_apply


# -- AttnMLP (aggnmlp.py) -----------------------------------------------------

def attn_mlp_init(key, dim_in, dim_out, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": linear_init(k1, dim_in, dim_out, dtype),
        "k": linear_init(k2, dim_in, dim_out, dtype),
        "v": linear_init(k3, dim_in, dim_out, dtype),
        "attn": linear_init(k4, 2 * dim_out, 1, dtype),
    }


def attn_mlp_apply(params, x, src, dst, valid, num_nodes):
    q = linear_apply(params["q"], x[dst])
    k = linear_apply(params["k"], x[src])
    score = linear_apply(params["attn"], jnp.concatenate([q, k], axis=-1))[:, 0]
    a = segment_softmax(score, dst, num_nodes, valid=valid)
    v = linear_apply(params["v"], x[src]) * a[:, None]
    return segment_sum(v, dst, num_nodes)


# -- AGNNConv (gat_conv.py additive attention) --------------------------------

def agnn_conv_init(key, dim_in, dim_out, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lin": linear_init(k1, dim_in, dim_out, dtype),
        "att_l": linear_init(k2, dim_out, 1, dtype),
        "att_r": linear_init(k3, dim_out, 1, dtype),
    }


def agnn_conv_apply(params, x, src, dst, valid, num_nodes, negative_slope=0.2):
    h = linear_apply(params["lin"], x)
    alpha = (
        linear_apply(params["att_l"], h[dst])[:, 0]
        + linear_apply(params["att_r"], h[src])[:, 0]
    )
    alpha = jax.nn.leaky_relu(alpha, negative_slope)
    a = segment_softmax(alpha, dst, num_nodes, valid=valid)
    return segment_sum(h[src] * a[:, None], dst, num_nodes)


# -- GatedSumConv --------------------------------------------------------------

def gated_sum_conv_init(key, dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"gate": linear_init(k1, dim, dim, dtype), "msg": linear_init(k2, dim, dim, dtype)}


def gated_sum_conv_apply(params, x, src, dst, valid, num_nodes):
    g = jax.nn.sigmoid(linear_apply(params["gate"], x[src]))
    m = g * linear_apply(params["msg"], x[src])
    return segment_sum(_masked(m, valid), dst, num_nodes)


# -- undirected GCNConv / GCNEncoder (digae_layer.py:40-66) --------------------

def gcn_conv_init(key, dim_in, dim_out, dtype=jnp.float32):
    return {"lin": linear_init(key, dim_in, dim_out, dtype)}


def gcn_conv_apply(params, x, src, dst, valid, num_nodes):
    loops = jnp.arange(num_nodes, dtype=src.dtype)
    src = jnp.concatenate([src, loops])
    dst = jnp.concatenate([dst, loops])
    valid = jnp.concatenate([valid, jnp.ones(num_nodes, valid.dtype)])
    h = linear_apply(params["lin"], x)
    vf = valid.astype(x.dtype)
    deg = segment_sum(vf, dst, num_nodes)
    dis = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    norm = dis[src] * dis[dst] * vf
    return segment_sum(h[src] * norm[:, None], dst, num_nodes)


def gcn_encoder_init(key, dim_in, dim_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"conv1": gcn_conv_init(k1, dim_in, 2 * dim_out, dtype),
            "conv2": gcn_conv_init(k2, 2 * dim_out, dim_out, dtype)}


def gcn_encoder_apply(params, x, src, dst, valid, num_nodes):
    h = jax.nn.relu(gcn_conv_apply(params["conv1"], x, src, dst, valid, num_nodes))
    return gcn_conv_apply(params["conv2"], h, src, dst, valid, num_nodes)


# -- decoders -------------------------------------------------------------------

def inner_product_decode(z, src, dst, sigmoid=True):
    v = jnp.sum(z[src] * z[dst], axis=-1)
    return jax.nn.sigmoid(v) if sigmoid else v


def inner_product_decode_all(z, sigmoid=True):
    adj = z @ z.T
    return jax.nn.sigmoid(adj) if sigmoid else adj


def directed_inner_product_decode_all(s, t, sigmoid=True):
    adj = s @ t.T
    return jax.nn.sigmoid(adj) if sigmoid else adj


# -- dummy encoders (digae_layer.py:215-230) --------------------------------------

def dummy_encoder_apply(x, *_args, **_kw):
    return x


def dummy_pair_encoder_apply(s, t, *_args, **_kw):
    return s, t
