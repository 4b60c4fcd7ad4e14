"""Degree-normalized directed GCN encoders + (V)GAE wrappers.

Rebuild of the reference's alternative encoder path — selected by
``--model AE`` (train.py:51-54) — and the GAE/DirectedGAE wrappers
(digae_layer.py:40-230, digae_model.py:26-168):

  * DirectedGCNConv: out_v = sum_{u->v} in_deg(v)^-alpha * out_deg(u)^-beta
    * (W x_u), with self-loops (digae_layer.py:73-114);
  * Source/Target 2-layer towers with edge-flip between layers
    (digae_layer.py:118-165) and single-layer variants (:174-211);
  * GAE/DirectedGAE: encode/decode/recon_loss/test(ROC-AUC/AP)
    (digae_model.py) with the sklearn metrics replaced by numpy
    (utils/metrics.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.init import linear_apply, linear_init
from ..ops.segment import segment_sum

EPS = 1e-15


def _with_self_loops(src, dst, valid, n):
    """Append one self-loop per node (torch_geometric add_self_loops)."""
    loops = jnp.arange(n, dtype=src.dtype)
    ones = jnp.ones(n, dtype=valid.dtype)
    return (
        jnp.concatenate([src, loops]),
        jnp.concatenate([dst, loops]),
        jnp.concatenate([valid, ones]),
    )


def directed_gcn_conv_init(key, dim_in, dim_out, dtype=jnp.float32):
    return {"lin": linear_init(key, dim_in, dim_out, dtype)}


def directed_gcn_conv_apply(p, x, src, dst, valid, alpha=1.0, beta=0.0, self_loops=True):
    n = x.shape[0]
    if self_loops:
        src, dst, valid = _with_self_loops(src, dst, valid, n)
    h = linear_apply(p["lin"], x)
    vf = valid.astype(x.dtype)
    in_deg = segment_sum(vf, dst, n)
    out_deg = segment_sum(vf, src, n)
    # torch pow(0., 0.) == 1; pow(0., -a) == inf but self-loops guarantee >=1
    in_norm = jnp.where(in_deg > 0, jnp.power(in_deg, -alpha), 0.0)
    out_norm = jnp.where(out_deg > 0, jnp.power(out_deg, -beta), 1.0)
    coef = in_norm[dst] * out_norm[src] * vf
    return segment_sum(h[src] * coef[:, None], dst, n)


def directed_gcn_encoder_init(key, dim_in, dim_hidden, dim_out, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "source": {"conv1": directed_gcn_conv_init(ks[0], dim_in, dim_hidden, dtype),
                   "conv2": directed_gcn_conv_init(ks[1], dim_hidden, dim_out, dtype)},
        "target": {"conv1": directed_gcn_conv_init(ks[2], dim_in, dim_hidden, dtype),
                   "conv2": directed_gcn_conv_init(ks[3], dim_hidden, dim_out, dtype)},
    }


def directed_gcn_encoder_apply(p, s, t, src, dst, valid, alpha=1.0, beta=0.0, self_loops=True):
    """DirectedGCNConvEncoder.forward (digae_layer.py:156-165): the source
    tower runs conv1 on forward edges then conv2 on flipped edges; the
    target tower mirrors it."""
    s1 = jax.nn.relu(directed_gcn_conv_apply(p["source"]["conv1"], s, src, dst, valid, alpha, beta, self_loops))
    s2 = directed_gcn_conv_apply(p["source"]["conv2"], s1, dst, src, valid, alpha, beta, self_loops)
    t1 = jax.nn.relu(directed_gcn_conv_apply(p["target"]["conv1"], t, dst, src, valid, alpha, beta, self_loops))
    t2 = directed_gcn_conv_apply(p["target"]["conv2"], t1, src, dst, valid, alpha, beta, self_loops)
    return s2, t2


def single_layer_directed_encoder_init(key, dim_in, dim_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "source": directed_gcn_conv_init(k1, dim_in, dim_out, dtype),
        "target": directed_gcn_conv_init(k2, dim_in, dim_out, dtype),
    }


def single_layer_directed_encoder_apply(p, s0, t0, src, dst, valid, alpha=1.0, beta=0.0, self_loops=True):
    """SingleLayerDirectedGCNConvEncoder (digae_layer.py:202-211): note the
    cross-wiring — s1 reads t0 over flipped edges, t1 reads s0 forward."""
    s1 = directed_gcn_conv_apply(p["source"], t0, dst, src, valid, alpha, beta, self_loops)
    t1 = directed_gcn_conv_apply(p["target"], s0, src, dst, valid, alpha, beta, self_loops)
    return s1, t1


# ---------------------------------------------------------------------------
# (V)GAE wrappers
# ---------------------------------------------------------------------------

class DirectedGAE:
    """Object wrapper with the digae_model.DirectedGAE surface."""

    def __init__(self, dim_in=6, dim_hidden=64, dim_out=64, alpha=1.0, beta=0.0, seed=0):
        self.alpha, self.beta = alpha, beta
        self.params = directed_gcn_encoder_init(jax.random.PRNGKey(seed), dim_in, dim_hidden, dim_out)

    def encode(self, s, t, src, dst, valid=None):
        src = jnp.asarray(src, jnp.int32)
        dst = jnp.asarray(dst, jnp.int32)
        if valid is None:
            valid = jnp.ones(src.shape[0], bool)
        return directed_gcn_encoder_apply(self.params, jnp.asarray(s), jnp.asarray(t), src, dst, valid, self.alpha, self.beta)

    @staticmethod
    def decode(s, t, src, dst, sigmoid=True):
        v = jnp.sum(s[src] * t[dst], axis=-1)
        return jax.nn.sigmoid(v) if sigmoid else v

    def recon_loss(self, s, t, pos_edge_index, neg_edge_index):
        # logit-side softplus form: -log(sigmoid+EPS) is an inf bomb under
        # jit at saturation (see train/losses.log_sigmoid_loss)
        from ..train.losses import log_sigmoid_loss

        pos = self.decode(s, t, pos_edge_index[0], pos_edge_index[1], sigmoid=False)
        neg = self.decode(s, t, neg_edge_index[0], neg_edge_index[1], sigmoid=False)
        pos_loss = log_sigmoid_loss(pos, True).mean()
        neg_loss = log_sigmoid_loss(neg, False).mean()
        pred_bin = jnp.concatenate([(pos > 0.0), (neg > 0.0)]).astype(jnp.int32)
        gt_bin = jnp.concatenate([jnp.ones_like(pos), jnp.zeros_like(neg)]).astype(jnp.int32)
        return pos_loss + neg_loss, pred_bin, gt_bin

    def test(self, s, t, pos_edge_index, neg_edge_index):
        """ROC-AUC and AP (digae_model.py:177-189)."""
        from ..utils.metrics import average_precision_score, roc_auc_score

        pos = np.asarray(self.decode(s, t, pos_edge_index[0], pos_edge_index[1]))
        neg = np.asarray(self.decode(s, t, neg_edge_index[0], neg_edge_index[1]))
        y = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
        pred = np.concatenate([pos, neg])
        return roc_auc_score(y, pred), average_precision_score(y, pred)
