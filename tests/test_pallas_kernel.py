"""Fused level-recurrence Pallas kernel: interpret-mode parity on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params


@pytest.mark.parametrize("modality", ["aig", "xmg"])
def test_pallas_level_scan_matches_xla(modality):
    cfg = DGConfig(modality=modality, dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    graphs = [random_circuit(rng, modality, num_inputs=6, num_gates=48) for _ in range(3)]
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    _, hf0, _ = forward(params, batch, cfg)
    _, hf1, _ = forward(params, batch, cfg, use_pallas=True, pallas_interpret=True)
    n = int(batch["n_nodes"])
    np.testing.assert_allclose(np.asarray(hf1[:n]), np.asarray(hf0[:n]), rtol=1e-4, atol=1e-5)


def test_pallas_handles_empty_padded_levels():
    """L is bucketed; padded level rows must stay NaN-free."""
    cfg = DGConfig(modality="mig", dim_hidden=64)
    params, _ = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(3)
    g = random_circuit(rng, "mig", num_inputs=4, num_gates=10)  # tiny, deep-pad
    batch = jax.tree.map(jnp.asarray, collate([g]))
    _, hf, _ = forward(params, batch, cfg, use_pallas=True, pallas_interpret=True)
    assert np.isfinite(np.asarray(hf)).all()


def test_pallas_vjp_matches_xla_autodiff():
    """Hand-written backward kernel vs jax.grad through the XLA scan."""
    import jax.flatten_util

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    graphs = [random_circuit(rng, "mig", num_inputs=6, num_gates=40) for _ in range(3)]
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (batch["gate"].shape[0], 64))

    def loss(params, use_pallas):
        hs, hf, _ = forward(params, batch, cfg, use_pallas=use_pallas, pallas_interpret=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)) + 0.01 * jnp.sum(jnp.where(m, hs, 0.0))

    g_x = jax.grad(lambda p: loss(p, False))(params)
    g_p = jax.grad(lambda p: loss(p, True))(params)
    a, _ = jax.flatten_util.ravel_pytree(g_x)
    b, _ = jax.flatten_util.ravel_pytree(g_p)
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 1e-4 * max(scale, 1.0)


def test_deep_chain_circuit():
    """Depth-200 NOT chain: exercises long scan + L bucketing end to end."""
    from mgvae_tpu.data.graph import build_graph

    gate = np.r_[0, np.full(200, 2)].astype(np.int32)
    edges = np.stack([np.arange(200), np.arange(1, 201)])
    g = build_graph("chain", gate, edges)
    assert g.num_levels == 201
    cfg = DGConfig(modality="aig", dim_hidden=32, s_rounds=1, t_rounds=1)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate([g]))
    hf0 = forward(params, batch, cfg)[1]
    hf1 = forward(params, batch, cfg, use_pallas=True, pallas_interpret=True)[1]
    assert np.isfinite(np.asarray(hf0)).all()
    np.testing.assert_allclose(np.asarray(hf1), np.asarray(hf0), rtol=1e-4, atol=1e-5)


def test_pallas_bf16_mode_forward_and_vjp():
    """bf16 throughput mode: values in bf16, accumulation f32. Parity vs the
    f32 XLA path within bf16 rounding (~1e-2 abs on O(1) values)."""
    import jax.flatten_util

    cfg32 = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    cfg16 = DGConfig(modality="mig", dim_hidden=64, layernorm=True, compute_dtype="bfloat16")
    params, _ = init_params(jax.random.PRNGKey(0), cfg32)
    rng = np.random.default_rng(4)
    graphs = [random_circuit(rng, "mig", num_inputs=6, num_gates=40) for _ in range(3)]
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    n = int(batch["n_nodes"])

    _, hf32, _ = forward(params, batch, cfg32)
    _, hf16x, _ = forward(params, batch, cfg16)  # XLA bf16
    _, hf16p, _ = forward(params, batch, cfg16, use_pallas=True, pallas_interpret=True)
    assert hf16p.dtype == jnp.bfloat16
    a32 = np.asarray(hf32[:n], np.float32)
    np.testing.assert_allclose(np.asarray(hf16p[:n], np.float32), a32, atol=3e-2, rtol=1e-1)
    # kernel-vs-XLA agreement within bf16 mode should be much tighter
    np.testing.assert_allclose(
        np.asarray(hf16p[:n], np.float32), np.asarray(hf16x[:n], np.float32),
        atol=2e-2, rtol=1e-1,
    )

    # VJP runs and grads roughly track the f32 grads
    tgt = jax.random.normal(jax.random.PRNGKey(2), (batch["gate"].shape[0], 64))

    def loss(params, cfg, use_pallas):
        hs, hf, _ = forward(params, batch, cfg, use_pallas=use_pallas, pallas_interpret=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf.astype(jnp.float32) - tgt) ** 2, 0.0))

    g32 = jax.grad(lambda p: loss(p, cfg32, False))(params)
    g16 = jax.grad(lambda p: loss(p, cfg16, True))(params)
    a, _ = jax.flatten_util.ravel_pytree(g32)
    b, _ = jax.flatten_util.ravel_pytree(jax.tree.map(lambda x: x.astype(jnp.float32), g16))
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 0.05 * max(scale, 1.0)


def test_hbm_variant_forward_and_vjp(monkeypatch):
    """Giant-single-graph path: hf (and in the backward, the ghf cotangent)
    streamed through HBM chunkwise. Forced by gating off the VMEM variant;
    parity + gradient agreement vs the XLA scan in interpret mode."""
    import jax.flatten_util


    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    graphs = [random_circuit(rng, "mig", num_inputs=6, num_gates=48) for _ in range(3)]
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (batch["gate"].shape[0], 64))

    def loss(params, use_pallas):
        hs, hf, _ = forward(params, batch, cfg, use_pallas=use_pallas, pallas_interpret=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)), hf

    (l_x, hf_x), g_x = jax.value_and_grad(lambda p: loss(p, False), has_aux=True)(params)
    with monkeypatch.context() as m:
        import mgvae_tpu.ops.pallas.level_kernel as K

        m.setattr(K, "kernel_fits", lambda *a: False)  # force the HBM route
        (l_h, hf_h), g_h = jax.value_and_grad(lambda p: loss(p, True), has_aux=True)(params)

    n = int(batch["n_nodes"])
    np.testing.assert_allclose(np.asarray(hf_h[:n]), np.asarray(hf_x[:n]), rtol=1e-4, atol=1e-5)
    a, _ = jax.flatten_util.ravel_pytree(g_x)
    b, _ = jax.flatten_util.ravel_pytree(g_h)
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 1e-4 * max(scale, 1.0)


def test_hbm_variant_bf16(monkeypatch):
    """bf16 HBM streaming (VERDICT r3 item 5): the giant-graph kernels
    accept bf16 values (hf storage, DMA buffers, matmul operands) with f32
    softmax/GRU/accumulators and an f32 ghf cotangent stream. Parity vs the
    f32 XLA scan at bf16 tolerances, fwd + grads, interpret mode."""
    import dataclasses

    import jax.flatten_util

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    graphs = [random_circuit(rng, "mig", num_inputs=6, num_gates=48) for _ in range(3)]
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (batch["gate"].shape[0], 64))

    def loss(params, c, use_pallas):
        hs, hf, _ = forward(params, batch, c, use_pallas=use_pallas,
                            pallas_interpret=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf.astype(jnp.float32) - tgt) ** 2, 0.0)), hf

    (_, hf_x), g_x = jax.value_and_grad(
        lambda p: loss(p, cfg, False), has_aux=True)(params)
    with monkeypatch.context() as m:
        import mgvae_tpu.ops.pallas.level_kernel as K

        m.setattr(K, "kernel_fits", lambda *a: False)  # force the HBM route
        (_, hf_h), g_h = jax.value_and_grad(
            lambda p: loss(p, cfg16, True), has_aux=True)(params)

    n = int(batch["n_nodes"])
    np.testing.assert_allclose(np.asarray(hf_h[:n], np.float32),
                               np.asarray(hf_x[:n]), rtol=0.1, atol=0.05)
    a, _ = jax.flatten_util.ravel_pytree(g_x)
    b, _ = jax.flatten_util.ravel_pytree(jax.tree.map(
        lambda x: x.astype(jnp.float32), g_h))
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 0.1 * max(scale, 1.0)


def test_step_kernel_fallback_chunked(monkeypatch):
    """Chunk-exceeds-VMEM route (VERDICT r3 item 3 tail): when the fused
    kernel's gate rejects a chunked batch, the level recurrence scans the
    single-level STEP kernel over the (chunk, level) rows instead of
    falling to the XLA scan. Parity + grads vs XLA, interpret mode."""
    import jax.flatten_util

    from mgvae_tpu.data.batching import collate_chunked

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(9)
    graphs = [random_circuit(rng, "mig", num_inputs=6, num_gates=60) for _ in range(6)]
    batch = jax.tree.map(jnp.asarray, collate_chunked(graphs, 2))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (batch["gate"].shape[0], 64))

    def loss(params, use_pallas):
        hs, hf, _ = forward(params, batch, cfg, use_pallas=use_pallas,
                            pallas_interpret=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)), hf

    (_, hf_x), g_x = jax.value_and_grad(lambda p: loss(p, False), has_aux=True)(params)
    with monkeypatch.context() as m:
        import mgvae_tpu.ops.pallas.level_kernel as K

        m.setattr(K, "kernel_fits", lambda *a: False)  # force the step route
        (_, hf_s), g_s = jax.value_and_grad(lambda p: loss(p, True), has_aux=True)(params)

    n = int(batch["n_nodes"])
    np.testing.assert_allclose(np.asarray(hf_s[:n]), np.asarray(hf_x[:n]),
                               rtol=1e-4, atol=1e-5)
    a, _ = jax.flatten_util.ravel_pytree(g_x)
    b, _ = jax.flatten_util.ravel_pytree(g_s)
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 1e-4 * max(scale, 1.0)


def test_tiered_class_dispatch_matches_xla():
    """Round-5 per-level class dispatch (empty/narrow/full tiers): a batch
    whose level tables mix wide levels (Ep > 128, Np > 128), a narrow deep
    tail, and bucket-padded empty levels must hit all three kernel classes
    and stay bit-faithful to the XLA path in BOTH forward and VJP."""
    import jax.flatten_util

    from mgvae_tpu.data.synthetic import layered_circuit
    from mgvae_tpu.ops.pallas.level_kernel import _narrow_dims

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    g_wide = layered_circuit(rng, "mig", width=144, depth=4)
    g_deep = random_circuit(rng, "mig", num_inputs=4, num_gates=120)
    batch = jax.tree.map(jnp.asarray, collate([g_wide, g_deep]))

    # the fixture must actually exercise the tier machinery
    ev = np.asarray(batch["lv_edge_valid"])
    nv = np.asarray(batch["lv_node_valid"])
    ep, np_ = ev.shape[1], nv.shape[1]
    epn, npn, tiered = _narrow_dims(ep, np_)
    assert tiered, (ep, np_)
    ne, nn = ev.sum(1), nv.sum(1)
    cls = np.where((ne == 0) & (nn == 0), 0,
                   np.where((ne <= epn) & (nn <= npn), 1, 2))
    assert {1, 2} <= set(cls.tolist()), cls

    tgt = jax.random.normal(jax.random.PRNGKey(2), (batch["gate"].shape[0], 64))

    def loss(params, use_pallas):
        hs, hf, _ = forward(params, batch, cfg, use_pallas=use_pallas,
                            pallas_interpret=True)
        m = batch["node_valid"][:, None]
        return (jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))
                + 0.01 * jnp.sum(jnp.where(m, hs, 0.0))), hf

    (_, hf_x), g_x = jax.value_and_grad(lambda p: loss(p, False), has_aux=True)(params)
    (_, hf_p), g_p = jax.value_and_grad(lambda p: loss(p, True), has_aux=True)(params)
    n = int(batch["n_nodes"])
    np.testing.assert_allclose(np.asarray(hf_p[:n]), np.asarray(hf_x[:n]),
                               rtol=1e-4, atol=1e-5)
    a, _ = jax.flatten_util.ravel_pytree(g_x)
    b, _ = jax.flatten_util.ravel_pytree(g_p)
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 1e-4 * max(scale, 1.0)


def test_hbm_dynamic_loops_match_static(monkeypatch):
    """Round-5 compile-bounded giant path: the HBM kernels' fori_loop chunk
    loops (O(1) program size in N, used past HBM_COMPILE_SAFE_NODES) must
    bit-match the static unrolled loops in forward AND backward."""
    import jax.flatten_util

    import mgvae_tpu.ops.pallas.level_kernel as K

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(9)
    graphs = [random_circuit(rng, "mig", num_inputs=6, num_gates=48) for _ in range(3)]
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (batch["gate"].shape[0], 64))

    def loss(params):
        hs, hf, _ = forward(params, batch, cfg, use_pallas=True,
                            pallas_interpret=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)), hf

    with monkeypatch.context() as m:
        m.setattr(K, "kernel_fits", lambda *a: False)  # force the HBM route
        (_, hf_s), g_s = jax.value_and_grad(loss, has_aux=True)(params)
        m.setenv("MGVAE_HBM_DYNAMIC", "1")
        (_, hf_d), g_d = jax.value_and_grad(loss, has_aux=True)(params)

    n = int(batch["n_nodes"])
    np.testing.assert_array_equal(np.asarray(hf_d[:n]), np.asarray(hf_s[:n]))
    a, _ = jax.flatten_util.ravel_pytree(g_s)
    b, _ = jax.flatten_util.ravel_pytree(g_d)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
