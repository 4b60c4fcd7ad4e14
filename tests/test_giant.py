"""Chip-scale single-circuit path (SURVEY §5.7): the layered_circuit
generator (bounded level width at arbitrary depth — the shape whose hf
state outgrows VMEM) and the end-to-end training path for one giant graph.

The real-scale run lives in examples/giant_circuit_training.py (N≈102k on
the TPU host); here we verify the same code path at mini scale on CPU:
generator invariants, collate, a full train step, and that the trainer's
auto-gating would route the giant shape to the HBM-streamed differentiable
kernel on TPU (reference capability being scaled: the serial level loop at
DG_VAE/deepgate/dg_ae_model_mig.py:85-129).
"""
import numpy as np
import jax
import jax.numpy as jnp

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.levelize import levelize
from mgvae_tpu.data.synthetic import layered_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import make_optimizer, make_train_step


def test_layered_circuit_structure():
    rng = np.random.default_rng(0)
    width, depth, n_in = 24, 7, 10
    g = layered_circuit(rng, "mig", width=width, depth=depth,
                        num_inputs=n_in, num_tt_pairs=32)
    assert g.num_nodes == n_in + width * depth
    # exactly `depth` logic levels, each of exactly `width` gates
    fwd_level = levelize(g.edge_index, g.num_nodes)
    assert int(fwd_level.max()) == depth
    counts = np.bincount(fwd_level)
    assert counts[0] == n_in
    assert (counts[1:] == width).all()
    # every edge spans at most 2 layers back (fanin locality — what makes
    # the kernel's source windows tight on this family)
    src, dst = g.edge_index
    assert (fwd_level[dst] - fwd_level[src] <= 2).all()
    assert (fwd_level[dst] > fwd_level[src]).all()
    # simulated supervision is well-formed
    assert g.prob.min() >= 0.0 and g.prob.max() <= 1.0
    assert g.tt_dis.shape == (32,)
    assert (g.tt_dis >= 0).all() and (g.tt_dis <= 1).all()


def test_layered_circuit_train_step():
    """One giant-shaped (mini-scale) single graph through the full train
    step: finite loss, finite grads-applied params."""
    rng = np.random.default_rng(1)
    g = layered_circuit(rng, "mig", width=16, depth=6, num_inputs=8,
                        num_tt_pairs=24)
    batch = jax.tree.map(jnp.asarray, collate([g]))
    cfg = DGConfig(modality="mig", dim_hidden=16, s_rounds=1, t_rounds=1,
                   layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    step, _ = make_train_step(cfg, opt, None, donate=False)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    params, state, opt_state, m = step(
        params, state, opt_state, batch, jax.random.PRNGKey(1), weights)
    assert np.isfinite(float(m["loss"]))
    leaves, _ = jax.tree.flatten(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_giant_shape_routes_to_hbm_kernel():
    """The example's real shape (width 512 x depth 200, N≈102k) must fail
    the VMEM-resident gate and pass the HBM-streamed differentiable gate —
    i.e. on TPU the trainer's _auto_pallas picks the giant path."""
    from mgvae_tpu.ops.pallas.level_kernel import kernel_fits, kernel_fits_hbm_bwd

    # collating the true 102k graph here costs seconds, not minutes — do it
    # for real so the dims are the example's dims
    rng = np.random.default_rng(0)
    g = layered_circuit(rng, "mig", width=512, depth=50, num_tt_pairs=64)
    batch = collate([g])
    n = batch["gate"].shape[0]
    ep, np_ = batch["lv_edge_src"].shape[-1], batch["lv_nodes"].shape[-1]
    assert not kernel_fits(n, ep, np_, 64)          # hf won't sit in VMEM
    assert kernel_fits_hbm_bwd(n, ep, np_, 64)      # HBM stream handles it


def test_auto_pallas_bf16_giant_gate(monkeypatch):
    """Regression for the round-5 fix: bf16 giant single graphs must take
    the HBM kernel VJP, not the XLA scan fallback whose autodiff saves
    O(L*N*D) per-level residuals (a 32 GB pred tensor at N=513k —
    tmp/r5_onchip/giant_513k_bf16.log). _auto_pallas is pure shape/dtype
    logic; the backend check is monkeypatched so this runs on CPU."""
    import jax

    from mgvae_tpu.train import step as step_mod

    rng = np.random.default_rng(1)
    g = layered_circuit(rng, "mig", width=512, depth=50, num_tt_pairs=16)
    batch = {k: jnp.asarray(v) for k, v in collate([g]).items()
             if not np.isscalar(v)}
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    from mgvae_tpu.ops.pallas.level_kernel import kernel_fits

    # the shape must actually exceed the VMEM gate, else the test is vacuous
    assert not kernel_fits(batch["gate"].shape[0],
                           batch["lv_edge_src"].shape[-1],
                           batch["lv_nodes"].shape[-1], 64)
    for dtype in ("float32", "bfloat16"):
        cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True,
                       compute_dtype=dtype)
        assert step_mod._auto_pallas(batch, cfg), dtype
