"""Training losses, fully in-graph (jit-safe, masked for padding).

Rebuilds Trainer.run_batch (DG_VAE/deepgate/trainer.py:131-174) +
Model.recon_loss (dg_ae_model_mig.py:169-191):

  recon: -log sigma(s_u . t_v) over positive edges plus -log(1 - sigma) over
         E uniformly-sampled negative pairs. The reference's PyG
         ``negative_sampling`` rejects existing edges; we sample uniformly
         with a self-loop-free shift (collision probability with real edges
         is O(E/N^2) — negligible on circuit graphs; documented deviation).
  prob:  L1(clamp(readout_prob(hf), 0, 1), prob)   (trainer.py:154-156)
  func:  L1(zscore(1 - cos(hf_a, hf_b)), zscore(tt_dis)) with torch's
         unbiased std (trainer.py:158-163, utils/utils.py:32-36)
  kl:    the DG_VAE term exactly as consumed by the trainer
         (trainer.py:146-148), including its double 1/N normalization.

The reference's "edge split" is a no-op shuffle that also allocates an
O(N^2) mask (SURVEY.md §8 quirk 7) — the shuffle doesn't change any loss
here, so the whole step is elided.

Binary recon metrics (acc/TP/FP/TN/FN, trainer.py:236-244) are computed
in-graph as counts so no device->host sync happens per iteration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.dg_ae import decode_edges, hs_decompose
from ..ops.mlp import mlp_apply

EPS = 1e-15
_LOG_EPS = 34.538776394910684  # -log(EPS): the reference's saturation ceiling
_COS_EPS = 1e-8


def log_sigmoid_loss(logit, positive: bool):
    """-log(sigmoid(x) + EPS) / -log(1 - sigmoid(x) + EPS) computed FROM THE
    LOGIT as softplus(-x) / softplus(x), clipped at -log(EPS).

    The naive pred-side form is an inf bomb under jit: when sigmoid
    saturates to exactly 1.0f, eager float math gives 1 - 1 + 1e-15 = 1e-15
    (loss 34.54, the torch reference's behavior), but XLA's algebraic
    simplifier may reassociate (1 - pred) + eps into (1 + eps) - pred = 0
    and emit log(0) = -inf with NaN cotangents. One saturated valid negative
    then NaN-poisons params permanently — this killed stage 2 of the
    full-schedule run (recon transiently saturates when the 5x prob loss
    switches on; torch recovers, a jitted inf never does). softplus is
    exact (-log sigmoid(x) == softplus(-x)), bounded, and the clip at
    -log(EPS) reproduces the reference's EPS semantics at saturation."""
    sp = jax.nn.softplus(-logit if positive else logit)
    return jnp.minimum(sp, _LOG_EPS)


def masked_mean(x, valid, count=None):
    v = valid.astype(x.dtype)
    if count is None:
        count = jnp.maximum(jnp.sum(v), 1.0)
    return jnp.sum(x * v) / count


def masked_zscore(x, valid, count):
    """z-normalization with torch.std's unbiased (n-1) denominator
    (utils/utils.py:32-36)."""
    v = valid.astype(x.dtype)
    mean = jnp.sum(x * v) / count
    var = jnp.sum(jnp.square(x - mean) * v) / jnp.maximum(count - 1.0, 1.0)
    return (x - mean) * jax.lax.rsqrt(jnp.maximum(var, 1e-30))


def sample_negative_edges(rng, num_samples: int, batch):
    """Fixed-shape uniform negative pairs over the valid node range,
    self-loop free (src != dst by construction).

    Chunked batches (data/batching.collate_chunked) have valid nodes in C
    non-contiguous runs (chunk k at [k*N_sub, k*N_sub + count_k)); uniform
    ids over the total count are mapped into those runs so negatives never
    hit interior padding rows."""
    n_nodes = batch["n_nodes"]
    k1, k2 = jax.random.split(rng)
    n = jnp.maximum(n_nodes.astype(jnp.uint32), 2)
    src = (jax.random.uniform(k1, (num_samples,)) * n).astype(jnp.int32)
    # dst = (src + 1 + u % (n-1)) % n  => never equals src
    off = (jax.random.uniform(k2, (num_samples,)) * (n - 1)).astype(jnp.int32)
    dst = (src + 1 + off) % n.astype(jnp.int32)
    counts = batch.get("chunk_counts")
    if counts is not None and counts.shape[0] > 1:
        cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
        offsets = batch.get("chunk_offsets")  # heterogeneous runs (collate_split)
        if offsets is None:
            n_sub = batch["gate"].shape[0] // counts.shape[0]
            offsets = n_sub * jnp.arange(counts.shape[0], dtype=jnp.int32)

        def to_global(u):
            k = jnp.searchsorted(cum, u, side="right") - 1
            return (offsets[k] + u - cum[k]).astype(jnp.int32)

        src, dst = to_global(src), to_global(dst)
    return src, dst


def recon_loss(params, hs, batch, rng, neg_edges=None, mask_collisions=False):
    """Returns (loss, metrics-dict of scalar counts).

    ``neg_edges``: optional explicit (src, dst) negative pairs (parity tests
    feed the same negatives to both frameworks); default samples in-graph.

    ``mask_collisions``: the reference's PyG ``negative_sampling`` REJECTS
    samples that hit real edges (dg_ae_model_mig.py:180); plain uniform
    sampling admits them with probability ~E/N^2. With this flag, sampled
    negatives that coincide with a real (valid) edge are masked out and the
    mean renormalizes over survivors — same expectation as rejection
    sampling, fixed shapes (no resampling loop). The membership test is a
    fused [E, E] equality reduce: O(E^2) VPU work, never materialized, ~us
    at the E values the batcher emits. Measured bias of NOT masking:
    tests/test_losses.py::test_collision_mask_bias (sub-0.5% on circuit
    graphs, grows with edge density).
    """
    s, t = hs_decompose(params, hs)
    ev = batch["edge_valid"]
    e_count = jnp.maximum(batch["n_edges"].astype(hs.dtype), 1.0)
    if "ra_eid" in batch and "fa_eid" in batch:
        # positive-edge gathers with blocked one-hot transposes: no TPU
        # scatter in the backward (models/encoder.gather_rows_t; the recon
        # loss masks invalid edges so their cotangents are zero). ra_* is
        # grouped by SRC (s-side), fa_* by DST (t-side). Negatives below
        # stay dynamic gathers — their indices are sampled per step.
        from ..models.encoder import gather_rows_t

        s_e = gather_rows_t(s, batch["edge_src"],
                            (batch["ra_eid"], batch["ra_slot"], batch["ra_valid"]))
        t_e = gather_rows_t(t, batch["edge_dst"],
                            (batch["fa_eid"], batch["fa_slot"], batch["fa_valid"]))
        pos_logit = jnp.sum(s_e * t_e, axis=-1)
    else:
        pos_logit = decode_edges(s, t, batch["edge_src"], batch["edge_dst"],
                                 sigmoid=False)
    pos_loss = masked_mean(log_sigmoid_loss(pos_logit, True), ev, e_count)

    if neg_edges is None:
        neg_src, neg_dst = sample_negative_edges(rng, batch["edge_src"].shape[0], batch)
    else:
        neg_src, neg_dst = neg_edges
    neg_logit = decode_edges(s, t, neg_src, neg_dst, sigmoid=False)
    neg_valid = ev
    neg_count = e_count
    if mask_collisions:
        hit = jnp.any(
            (neg_src[:, None] == batch["edge_src"][None, :])
            & (neg_dst[:, None] == batch["edge_dst"][None, :])
            & ev[None, :],
            axis=1,
        )
        neg_valid = ev & ~hit
        neg_count = jnp.maximum(jnp.sum(neg_valid.astype(hs.dtype)), 1.0)
    neg_loss = masked_mean(log_sigmoid_loss(neg_logit, False), neg_valid, neg_count)

    vf = ev.astype(hs.dtype)
    pos_bin = (pos_logit > 0.0).astype(hs.dtype) * vf
    neg_bin = (neg_logit > 0.0).astype(hs.dtype) * neg_valid.astype(hs.dtype)
    metrics = {
        "tp": jnp.sum(pos_bin),
        "fn": e_count - jnp.sum(pos_bin),
        "fp": jnp.sum(neg_bin),
        "tn": neg_count - jnp.sum(neg_bin),
        "n_pred": e_count + neg_count,
    }
    return pos_loss + neg_loss, metrics


def prob_loss(params, state, hf, batch, train: bool, rng):
    """Returns (loss, new_readout_state)."""
    valid = batch["node_valid"]
    out, new_state = mlp_apply(
        params["readout_prob"], state["readout_prob"], hf,
        valid=valid, train=train, p_drop=0.2, act="relu", rng=rng,
    )
    pred = jnp.clip(out[:, 0], 0.0, 1.0)
    l1 = jnp.abs(pred - batch["prob"])
    n_count = jnp.maximum(batch["n_nodes"].astype(hf.dtype), 1.0)
    return masked_mean(l1, valid, n_count), {"readout_prob": new_state}


def func_loss(hf, batch):
    valid = batch["tt_valid"]
    # mask BEFORE the norm (same rule as the softmaxes): padding pairs can
    # gather all-zero hf rows, and d(norm)/da at 0 is 0/0 = NaN — the
    # maximum(., eps) clamps the VALUE but not the cotangent. XLA's sparse
    # gather-transpose happens to never read those NaN rows; the fused
    # kernel's dense one-hot matmuls do (0 * NaN = NaN poisoned every grad
    # in chunked training on real TPU until this fix).
    a = jnp.where(valid[:, None], hf[batch["tt_pair_a"]], 1.0)
    b = jnp.where(valid[:, None], hf[batch["tt_pair_b"]], 1.0)
    # torch.cosine_similarity(eps): norms clamped to eps individually
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), _COS_EPS)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), _COS_EPS)
    cos = jnp.sum(a * b, axis=-1) / (na * nb)
    emb_dis = 1.0 - cos
    count = jnp.maximum(batch["n_tt"].astype(hf.dtype), 1.0)
    emb_z = masked_zscore(emb_dis, valid, count)
    tt_z = masked_zscore(batch["tt_dis"], valid, count)
    return masked_mean(jnp.abs(emb_z - tt_z), valid, count)


def kl_loss(aux, batch):
    """trainer.py:146-148 formula (note the double 1/N: mean over nodes AND
    the -0.5/N factor — replicated deliberately)."""
    n = batch["n_nodes"].astype(aux["s_mu"].dtype)
    valid = batch["node_valid"]

    def one(mu, logstd):
        term = 1.0 + 2.0 * logstd - jnp.square(mu) - jnp.square(jnp.exp(logstd))
        per_node = jnp.sum(term, axis=1)
        return (-0.5 / n) * masked_mean(per_node, valid, n)

    return one(aux["s_mu"], aux["s_logstd"]) + one(aux["t_mu"], aux["t_logstd"])
