"""Numerical parity of core ops against torch (SURVEY.md §4 prescription b)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from mgvae_tpu.ops.init import (
    gru_cell_apply,
    gru_cell_init,
    layernorm_apply,
    layernorm_init,
    linear_apply,
    linear_init,
)
from mgvae_tpu.ops.mlp import batchnorm_apply, batchnorm_init, mlp_apply, mlp_init
from mgvae_tpu.ops.segment import segment_softmax, segment_sum

torch.manual_seed(0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_linear_matches_torch():
    lin = torch.nn.Linear(16, 8)
    p = {"w": t2j(lin.weight).T, "b": t2j(lin.bias)}
    x = torch.randn(5, 16)
    np.testing.assert_allclose(
        np.asarray(linear_apply(p, t2j(x))), lin(x).detach().numpy(), rtol=1e-6, atol=1e-6
    )


def test_gru_cell_matches_torch():
    gru = torch.nn.GRU(12, 20)
    p = {
        "w_ih": t2j(gru.weight_ih_l0).T,
        "w_hh": t2j(gru.weight_hh_l0).T,
        "b_ih": t2j(gru.bias_ih_l0),
        "b_hh": t2j(gru.bias_hh_l0),
    }
    x = torch.randn(7, 12)
    h = torch.randn(7, 20)
    # reference call pattern: GRU(msg.unsqueeze(0), h.unsqueeze(0)) -> h_n
    _, h_n = gru(x.unsqueeze(0), h.unsqueeze(0))
    ours = gru_cell_apply(p, t2j(x), t2j(h))
    np.testing.assert_allclose(np.asarray(ours), h_n.squeeze(0).detach().numpy(), rtol=1e-5, atol=1e-6)


def test_layernorm_matches_torch():
    ln = torch.nn.LayerNorm(32)
    with torch.no_grad():
        ln.weight.uniform_(0.5, 1.5)
        ln.bias.uniform_(-0.5, 0.5)
    p = {"w": t2j(ln.weight), "b": t2j(ln.bias)}
    x = torch.randn(9, 32)
    np.testing.assert_allclose(
        np.asarray(layernorm_apply(p, t2j(x))), ln(x).detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_batchnorm_train_and_eval_match_torch():
    bn = torch.nn.BatchNorm1d(6)
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-0.5, 0.5)
    params = {"w": t2j(bn.weight), "b": t2j(bn.bias)}
    state = {"mean": jnp.zeros(6), "var": jnp.ones(6)}
    x = torch.randn(11, 6)
    # train step
    bn.train()
    y_t = bn(x)
    y_j, state = batchnorm_apply(params, state, t2j(x), train=True)
    np.testing.assert_allclose(np.asarray(y_j), y_t.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["mean"]), bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["var"]), bn.running_var.numpy(), rtol=1e-5, atol=1e-6)
    # eval step
    bn.eval()
    x2 = torch.randn(4, 6)
    y_t2 = bn(x2)
    y_j2, _ = batchnorm_apply(params, state, t2j(x2), train=False)
    np.testing.assert_allclose(np.asarray(y_j2), y_t2.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_batchnorm_masked_ignores_padding():
    params, state = batchnorm_init(3)
    x = jnp.asarray(np.random.randn(10, 3).astype(np.float32))
    pad = jnp.concatenate([x, jnp.full((5, 3), 99.0)], axis=0)
    valid = jnp.arange(15) < 10
    y_ref, st_ref = batchnorm_apply(params, state, x, train=True)
    y_pad, st_pad = batchnorm_apply(params, state, pad, valid=valid, train=True)
    np.testing.assert_allclose(np.asarray(y_pad[:10]), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_pad["mean"]), np.asarray(st_ref["mean"]), rtol=1e-5, atol=1e-6)


def test_mlp_matches_torch_readout_prob_shape():
    """MLP(D, 32, 1, num_layer=3, batchnorm, relu) == torch stack, eval mode."""
    D = 64
    key = jax.random.PRNGKey(1)
    params, state = mlp_init(key, D, 32, 1, num_layer=3, norm_layer="batchnorm")
    # build equivalent torch module and copy OUR params into it
    layers = []
    dims = [D, 32, 32, 1]
    tlin = [torch.nn.Linear(dims[i], dims[i + 1]) for i in range(3)]
    tbn = [torch.nn.BatchNorm1d(32) for _ in range(2)]
    with torch.no_grad():
        for i, l in enumerate(tlin):
            l.weight.copy_(torch.from_numpy(np.asarray(params["layers"][i]["w"]).T))
            l.bias.copy_(torch.from_numpy(np.asarray(params["layers"][i]["b"])))
        for i, b in enumerate(tbn):
            b.weight.copy_(torch.from_numpy(np.asarray(params["bn"][i]["w"])))
            b.bias.copy_(torch.from_numpy(np.asarray(params["bn"][i]["b"])))
    seq = torch.nn.Sequential(
        tlin[0], tbn[0], torch.nn.ReLU(), torch.nn.Dropout(0.2),
        tlin[1], tbn[1], torch.nn.ReLU(), torch.nn.Dropout(0.2),
        tlin[2],
    )
    seq.eval()
    x = torch.randn(13, D)
    y_t = seq(x)
    y_j, _ = mlp_apply(params, state, t2j(x), train=False, p_drop=0.2, act="relu")
    np.testing.assert_allclose(np.asarray(y_j), y_t.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_segment_softmax_matches_dense_softmax():
    scores = jnp.asarray([1.0, 2.0, 3.0, -1.0, 0.5])
    seg = jnp.asarray([0, 0, 1, 1, 1])
    out = segment_softmax(scores, seg, 2)
    d0 = np.exp([1.0, 2.0]) / np.exp([1.0, 2.0]).sum()
    d1 = np.exp([3.0, -1.0, 0.5]) / np.exp([3.0, -1.0, 0.5]).sum()
    np.testing.assert_allclose(np.asarray(out), np.concatenate([d0, d1]), rtol=1e-6)


def test_segment_softmax_masks_padding():
    scores = jnp.asarray([1.0, 100.0, 2.0])
    seg = jnp.asarray([0, 0, 0])
    valid = jnp.asarray([True, False, True])
    out = segment_softmax(scores, seg, 1, valid=valid)
    expected = np.exp([1.0, 2.0]) / np.exp([1.0, 2.0]).sum()
    assert float(out[1]) == 0.0
    np.testing.assert_allclose(np.asarray(out)[[0, 2]], expected, rtol=1e-6)


def test_segment_sum_basic():
    data = jnp.ones((4, 2))
    out = segment_sum(data, jnp.asarray([0, 1, 1, 3]), 4)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [1, 2, 0, 1])


def test_neighbor_sum_transpose_vjp_matches_autodiff():
    """The linear_call transpose (reverse-table neighbor sum) must equal
    autodiff through the segment_sum formulation, for grads w.r.t. state,
    in both directions."""
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.encoder import _neighbor_sum

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=40) for _ in range(3)]
    batch = {k: jnp.asarray(v) for k, v in collate(graphs).items()}
    n = batch["gate"].shape[0]
    state = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    cot_w = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    seg_batch = {k: v for k, v in batch.items() if not k.startswith(("fa_", "ra_"))}

    for reverse in (False, True):
        out_blk = _neighbor_sum(state, batch, reverse)
        out_seg = _neighbor_sum(state, seg_batch, reverse)
        np.testing.assert_allclose(np.asarray(out_blk), np.asarray(out_seg),
                                   rtol=1e-5, atol=1e-5)
        g_blk = jax.grad(lambda s: jnp.sum(_neighbor_sum(s, batch, reverse) * cot_w))(state)
        g_seg = jax.grad(lambda s: jnp.sum(_neighbor_sum(s, seg_batch, reverse) * cot_w))(state)
        np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_seg),
                                   rtol=1e-5, atol=1e-5)


def test_multigcn_grads_with_transposed_vjp():
    """End-to-end: struct-encoder param grads via the blocked (linear_call)
    path match the segment_sum autodiff path."""
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, init_params, struct_input
    from mgvae_tpu.models.encoder import direct_multigcn_apply

    rng = np.random.default_rng(1)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=40) for _ in range(3)]
    batch = {k: jnp.asarray(v) for k, v in collate(graphs).items()}
    seg_batch = {k: v for k, v in batch.items() if not k.startswith(("fa_", "ra_"))}
    cfg = DGConfig(modality="mig", dim_hidden=16, s_rounds=2, t_rounds=2, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    x = struct_input(batch["gate"], cfg, jnp.float32)

    def loss(p, b):
        s, t = direct_multigcn_apply(p["struct"], x, b, cfg.s_rounds, cfg.t_rounds, cfg.layernorm)
        return jnp.sum(s * jnp.cos(t))

    g_blk = jax.grad(loss)(params, batch)["struct"]
    g_seg = jax.grad(loss)(params, seg_batch)["struct"]
    for a, b in zip(jax.tree.leaves(g_blk), jax.tree.leaves(g_seg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_stacked_towers_match_sequential():
    """direct_multigcn_apply's stacked (double-batch) path must equal the
    sequential per-tower path."""
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, init_params, struct_input
    from mgvae_tpu.models.encoder import direct_multigcn_apply, multigcn_apply

    rng = np.random.default_rng(2)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=40) for _ in range(3)]
    batch = {k: jnp.asarray(v) for k, v in collate(graphs).items()}
    for layernorm in (True, False):
        cfg = DGConfig(modality="mig", dim_hidden=16, s_rounds=3, t_rounds=3, layernorm=layernorm)
        params, _ = init_params(jax.random.PRNGKey(layernorm), cfg)
        x = struct_input(batch["gate"], cfg, jnp.float32)
        s0 = multigcn_apply(params["struct"]["source"], x, batch, 3, layernorm)
        t0 = multigcn_apply(params["struct"]["target"], x, batch, 3, layernorm)
        s1, t1 = direct_multigcn_apply(params["struct"], x, batch, 3, 3, layernorm)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-5, atol=1e-6)
