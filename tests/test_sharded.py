"""Within-level model parallelism: sharded forward == single-device forward
on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
from mgvae_tpu.parallel.sharded import make_sharded_forward


def _big_batch(modality="mig", seed=0, n_graphs=24):
    rng = np.random.default_rng(seed)
    graphs = [random_circuit(rng, modality, num_inputs=16, num_gates=150) for _ in range(n_graphs)]
    return jax.tree.map(jnp.asarray, collate(graphs))


def test_sharded_forward_matches_single_device():
    devs = np.asarray(jax.devices())
    mesh = Mesh(devs[:4], ("mp",))
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = _big_batch()
    assert batch["gate"].shape[0] % (128 * 4) == 0
    assert batch["lv_edge_src"].shape[1] % 4 == 0

    hs0, hf0, _ = forward(params, batch, cfg)
    fn = make_sharded_forward(cfg, mesh, batch)
    hs1, hf1 = fn(params, batch)
    n = int(batch["n_nodes"])
    np.testing.assert_allclose(np.asarray(hs1)[:n], np.asarray(hs0)[:n], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf1)[:n], np.asarray(hf0)[:n], rtol=1e-4, atol=1e-4)


def test_sharded_forward_8way():
    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("mp",))
    cfg = DGConfig(modality="xmg", dim_hidden=32, s_rounds=2, t_rounds=2)
    params, _ = init_params(jax.random.PRNGKey(1), cfg)
    batch = _big_batch("xmg", seed=2, n_graphs=48)
    if batch["gate"].shape[0] % (128 * 8) or batch["lv_edge_src"].shape[1] % 8:
        import pytest

        pytest.skip("bucketed dims not divisible by 8 for this batch")
    hs0, hf0, _ = forward(params, batch, cfg)
    hs1, hf1 = make_sharded_forward(cfg, mesh, batch)(params, batch)
    n = int(batch["n_nodes"])
    np.testing.assert_allclose(np.asarray(hf1)[:n], np.asarray(hf0)[:n], rtol=1e-4, atol=1e-4)
