"""Chunked large-batch path: collate_chunked / collate_fit + the (chunk,
level) fused-kernel grid.

Graphs are disjoint, so a large batch == C independent sub-batches; chunking
must not change ANY training semantics: forward embeddings, losses, grads,
and negative sampling all have to match the unchunked batch (modulo row
permutation). The fused Pallas kernel then rides the [C, L] tables with a
per-chunk VMEM hf block (ops/pallas/level_kernel.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mgvae_tpu.data.batching import collate, collate_chunked, collate_fit
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params


def _graphs(n=8, modality="mig", seed=0, num_gates=40):
    rng = np.random.default_rng(seed)
    return [
        random_circuit(rng, modality, num_inputs=6, num_gates=num_gates, num_tt_pairs=16)
        for _ in range(n)
    ]


def _orig_order(batch, arr):
    """Rows of arr in global original (input) order, real nodes only."""
    inv = np.asarray(batch["node_inv"])
    n = int(batch["n_nodes"])
    return np.asarray(arr)[inv[:n]]


def test_chunked_forward_matches_plain():
    graphs = _graphs(8)
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    ba = jax.tree.map(jnp.asarray, collate(graphs))
    bc = jax.tree.map(jnp.asarray, collate_chunked(graphs, 3))
    assert bc["lv_nodes"].ndim == 3 and bc["lv_nodes"].shape[0] == 3
    hs_a, hf_a, _ = forward(params, ba, cfg)
    hs_c, hf_c, _ = forward(params, bc, cfg)
    np.testing.assert_allclose(_orig_order(bc, hs_c), _orig_order(ba, hs_a), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(_orig_order(bc, hf_c), _orig_order(ba, hf_a), rtol=2e-5, atol=1e-6)


def test_chunked_losses_match_plain():
    from mgvae_tpu.train.losses import func_loss, prob_loss, recon_loss

    graphs = _graphs(6, seed=3)
    cfg = DGConfig(modality="mig", dim_hidden=64)
    params, state = init_params(jax.random.PRNGKey(1), cfg)
    ba = jax.tree.map(jnp.asarray, collate(graphs))
    bc = jax.tree.map(jnp.asarray, collate_chunked(graphs, 2))
    hs_a, hf_a, _ = forward(params, ba, cfg)
    hs_c, hf_c, _ = forward(params, bc, cfg)

    # same explicit negatives, expressed in each batch's own row numbering
    n_orig = int(ba["n_nodes"])
    rng = np.random.default_rng(7)
    neg = rng.integers(0, n_orig, size=(2, 64))
    neg[1] = (neg[0] + 1 + neg[1] % (n_orig - 1)) % n_orig

    def neg_for(batch):
        e_pad = batch["edge_src"].shape[0]
        inv = np.asarray(batch["node_inv"])
        s = np.pad(inv[neg[0]], (0, e_pad - neg.shape[1]))
        d = np.pad(inv[neg[1]], (0, e_pad - neg.shape[1]), constant_values=1)
        return jnp.asarray(s.astype(np.int32)), jnp.asarray(d.astype(np.int32))

    rc_a, m_a = recon_loss(params, hs_a, ba, None, neg_edges=neg_for(ba))
    rc_c, m_c = recon_loss(params, hs_c, bc, None, neg_edges=neg_for(bc))
    np.testing.assert_allclose(float(rc_c), float(rc_a), rtol=1e-5)
    assert float(m_a["tp"]) == float(m_c["tp"])
    pl_a, _ = prob_loss(params, state, hf_a, ba, train=False, rng=None)
    pl_c, _ = prob_loss(params, state, hf_c, bc, train=False, rng=None)
    np.testing.assert_allclose(float(pl_c), float(pl_a), rtol=1e-5)
    np.testing.assert_allclose(float(func_loss(hf_c, bc)), float(func_loss(hf_a, ba)), rtol=1e-5)


def test_chunked_negative_sampling_avoids_padding():
    from mgvae_tpu.train.losses import sample_negative_edges

    graphs = _graphs(6, seed=5)
    bc = jax.tree.map(jnp.asarray, collate_chunked(graphs, 3))
    src, dst = sample_negative_edges(jax.random.PRNGKey(0), 512, bc)
    valid = np.asarray(bc["node_valid"])
    assert valid[np.asarray(src)].all() and valid[np.asarray(dst)].all()
    assert (np.asarray(src) != np.asarray(dst)).all()


def test_chunked_pallas_forward_and_vjp():
    import jax.flatten_util

    graphs = _graphs(6, seed=2)
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    bc = jax.tree.map(jnp.asarray, collate_chunked(graphs, 2))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (bc["gate"].shape[0], 64))

    def loss(params, use_pallas):
        hs, hf, _ = forward(params, bc, cfg, use_pallas=use_pallas, pallas_interpret=True)
        m = bc["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)), hf

    (l_x, hf_x), g_x = jax.value_and_grad(lambda p: loss(p, False), has_aux=True)(params)
    (l_p, hf_p), g_p = jax.value_and_grad(lambda p: loss(p, True), has_aux=True)(params)
    n = int(bc["n_nodes"])
    inv = np.asarray(bc["node_inv"])[:n]
    np.testing.assert_allclose(np.asarray(hf_p)[inv], np.asarray(hf_x)[inv], rtol=1e-4, atol=1e-5)
    a, _ = jax.flatten_util.ravel_pytree(g_x)
    b, _ = jax.flatten_util.ravel_pytree(g_p)
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 1e-4 * max(scale, 1.0)


def test_collate_fit_chunks_only_when_needed():
    small = _graphs(4, num_gates=20, seed=8)
    b = collate_fit(small)
    assert b["lv_nodes"].ndim == 2  # fits: plain collate
    big = _graphs(12, num_gates=800, seed=9)
    b = collate_fit(big, max_nodes=2048, max_ep=512, max_np=512)
    assert b["lv_nodes"].ndim == 3
    C = b["lv_nodes"].shape[0]
    assert b["gate"].shape[0] // C <= 2048
    assert b["lv_edge_src"].shape[2] <= 512 and b["lv_nodes"].shape[2] <= 512


def test_chunked_train_step_runs():
    from mgvae_tpu.train.step import make_optimizer, make_train_step

    graphs = _graphs(6, seed=11)
    cfg = DGConfig(modality="aig", dim_hidden=32, s_rounds=1, t_rounds=1)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    train_step, _ = make_train_step(cfg, optimizer, donate=False)
    bc = jax.tree.map(jnp.asarray, collate_chunked(graphs, 2))
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    params, state, opt_state, m = train_step(params, state, opt_state, bc, jax.random.PRNGKey(1), weights)
    assert np.isfinite(float(m["loss"]))


def test_dp_x_chunked_train_step():
    """dp-sharded batches whose shards are themselves chunked ([dp, C, L]
    level tables): the shard_map train step's per-device slice is a normal
    chunked batch."""
    from jax.sharding import Mesh

    from mgvae_tpu.data.batching import collate_shards
    from mgvae_tpu.train.step import make_optimizer, make_train_step

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs[:2], ("dp",))
    cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=1, t_rounds=1)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    train_step, _ = make_train_step(cfg, optimizer, mesh, donate=False)
    shards = [_graphs(6, seed=30 + d) for d in range(2)]
    batch = jax.tree.map(jnp.asarray, collate_shards(shards, num_chunks=2))
    assert batch["lv_nodes"].ndim == 4 and batch["lv_nodes"].shape[:2] == (2, 2)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    params, state, opt_state, m = train_step(
        params, state, opt_state, batch, jax.random.PRNGKey(1), weights
    )
    assert np.isfinite(float(m["loss"]))
