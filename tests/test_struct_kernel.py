"""Fused struct-tower kernel (ops/pallas/struct_kernel.py) vs the XLA
stacked path: forward parity and full parameter-gradient parity through the
custom VJP (AggConv fold unfolded by autodiff), interpret mode on CPU.
Reference semantics: DG_VAE/deepgate/digae_layer.py:232-297."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params, struct_input
from mgvae_tpu.models.encoder import direct_multigcn_apply
from mgvae_tpu.ops.pallas.struct_kernel import struct_towers_pallas


def _batch(modality="mig", n_graphs=4, seed=0):
    rng = np.random.default_rng(seed)
    graphs = [random_circuit(rng, modality, num_inputs=8, num_gates=120,
                             num_tt_pairs=32) for _ in range(n_graphs)]
    return {k: jnp.asarray(v) for k, v in collate(graphs).items()}


@pytest.mark.parametrize("layernorm", [True, False])
def test_struct_kernel_matches_xla(layernorm):
    batch = _batch()
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=layernorm)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    enc = params["struct"]
    x_feat = struct_input(batch["gate"], cfg, jnp.float32)
    n = int(batch["n_nodes"])

    s0, t0 = direct_multigcn_apply(enc, x_feat, batch, 4, 4, layernorm)
    s1, t1 = struct_towers_pallas(enc, x_feat, batch, 4, layernorm, interpret=True)
    np.testing.assert_allclose(np.asarray(s1)[:n], np.asarray(s0)[:n],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1)[:n], np.asarray(t0)[:n],
                               rtol=1e-4, atol=1e-5)

    w = jnp.asarray(np.random.default_rng(1).normal(size=s0.shape), jnp.float32)
    w = w.at[n:].set(0.0)

    def loss_xla(e):
        s, t = direct_multigcn_apply(e, x_feat, batch, 4, 4, layernorm)
        return jnp.sum(s * w) + 0.5 * jnp.sum(t * w)

    def loss_krn(e):
        s, t = struct_towers_pallas(e, x_feat, batch, 4, layernorm, interpret=True)
        return jnp.sum(s * w) + 0.5 * jnp.sum(t * w)

    g0 = jax.grad(loss_xla)(enc)
    g1 = jax.grad(loss_krn)(enc)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12)),
        g0, g1)
    assert max(jax.tree.leaves(rel)) < 1e-5, rel


def test_forward_use_pallas_engages_struct_kernel():
    """forward(use_pallas=True) routes the struct towers through the fused
    kernel when the batch fits; the combined (struct + level) kernel path
    must still match the pure-XLA forward."""
    batch = _batch("xmg", n_graphs=3, seed=2)
    cfg = DGConfig(modality="xmg", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(1), cfg)
    hs0, hf0, _ = forward(params, batch, cfg)
    hs1, hf1, _ = forward(params, batch, cfg, use_pallas=True, pallas_interpret=True)
    n = int(batch["n_nodes"])
    np.testing.assert_allclose(np.asarray(hs1)[:n], np.asarray(hs0)[:n],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf1)[:n], np.asarray(hf0)[:n],
                               rtol=1e-4, atol=1e-4)


def test_check_gather_transpose_helper():
    """The ADVICE-r3 debug helper: the three live gather_rows_t sites'
    tables give an EXACT adjoint for masked cotangents (and the helper
    detects it)."""
    from mgvae_tpu.models.encoder import check_gather_transpose

    batch = _batch(n_graphs=3, seed=7)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch["gate"].shape[0], 16))
    # hs[edge_src] site: ra tables group gather slots by source
    d = check_gather_transpose(
        x, batch["edge_src"],
        (batch["ra_eid"], batch["ra_slot"], batch["ra_valid"]),
        batch["edge_valid"])
    assert d == 0.0, d
    # aq_n[edge_dst] site: fa tables group by destination
    d = check_gather_transpose(
        x, batch["edge_dst"],
        (batch["fa_eid"], batch["fa_slot"], batch["fa_valid"]),
        batch["edge_valid"])
    assert d == 0.0, d
