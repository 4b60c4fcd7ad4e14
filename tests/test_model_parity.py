"""End-to-end numerical parity of the TPU model vs the torch reference
semantics (SURVEY.md §4 prescriptions b/c; BASELINE.md 1% loss bar)."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from benchmarks.torch_reference import ReferenceModel
from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward
from mgvae_tpu.utils.torch_compat import params_from_torch_state

torch.manual_seed(0)


def _jb(batch):
    import jax
    return jax.tree.map(jnp.asarray, batch)


@pytest.mark.parametrize("modality", ["aig", "mig", "xag", "xmg"])
@pytest.mark.parametrize("layernorm", [True, False])
def test_forward_parity_single_graph(modality, layernorm):
    rng = np.random.default_rng(42)
    g = random_circuit(rng, modality, num_inputs=5, num_gates=40)
    ref = ReferenceModel(modality, dim_hidden=64, s_rounds=4, t_rounds=4, layernorm=layernorm)
    ref.eval()
    with torch.no_grad():
        hs_t, hf_t = ref(
            torch.from_numpy(g.gate).long(),
            torch.from_numpy(g.edge_index),
            torch.from_numpy(g.forward_level).long(),
        )
    cfg = DGConfig(modality=modality, dim_hidden=64, layernorm=layernorm)
    params, _ = params_from_torch_state(ref.state_dict(), cfg)
    batch = _jb(collate([g]))
    hs_j, hf_j, _ = forward(params, batch, cfg)
    inv = np.asarray(batch["node_inv"])
    n = g.num_nodes
    np.testing.assert_allclose(np.asarray(hs_j)[inv][:n], hs_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf_j)[inv][:n], hf_t.numpy(), rtol=1e-4, atol=1e-4)


def test_forward_parity_batched_disjoint_union():
    """Batching multiple graphs must equal running each graph alone."""
    rng = np.random.default_rng(7)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=24 + 8 * i) for i in range(3)]
    ref = ReferenceModel("mig", dim_hidden=64, s_rounds=4, t_rounds=4, layernorm=True)
    ref.eval()
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = params_from_torch_state(ref.state_dict(), cfg)
    batch = _jb(collate(graphs))
    hs_j, hf_j, _ = forward(params, batch, cfg)
    inv = np.asarray(batch["node_inv"])
    hs_j, hf_j = np.asarray(hs_j)[inv], np.asarray(hf_j)[inv]
    off = 0
    for g in graphs:
        with torch.no_grad():
            hs_t, hf_t = ref(
                torch.from_numpy(g.gate).long(),
                torch.from_numpy(g.edge_index),
                torch.from_numpy(g.forward_level).long(),
            )
        n = g.num_nodes
        np.testing.assert_allclose(hs_j[off : off + n], hs_t.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(hf_j[off : off + n], hf_t.numpy(), rtol=1e-4, atol=1e-4)
        off += n


def test_input_quirk_collapses_features():
    """quirk mode: struct input depends only on (gate == 1)."""
    from mgvae_tpu.models.dg_ae import struct_input

    cfg = DGConfig(modality="mig")
    gate = jnp.asarray([0, 1, 2, 3, 4, 5])
    x = struct_input(gate, cfg)
    assert np.asarray(x[0] == x[2]).all() and np.asarray(x[2] == x[5]).all()
    assert not np.asarray(x[0] == x[1]).all()
    cfg_fixed = DGConfig(modality="mig", input_quirk=False)
    x2 = struct_input(gate, cfg_fixed)
    np.testing.assert_allclose(np.asarray(x2), np.eye(6))


def test_forward_parity_num_rounds_2():
    """The general (non-fast) level path: num_rounds=2 vs the torch oracle."""
    rng = np.random.default_rng(21)
    g = random_circuit(rng, "xag", num_inputs=4, num_gates=28)
    ref = ReferenceModel("xag", dim_hidden=32, s_rounds=2, t_rounds=2, layernorm=False, num_rounds=2)
    ref.eval()
    cfg = DGConfig(modality="xag", dim_hidden=32, s_rounds=2, t_rounds=2, num_rounds=2)
    params, _ = params_from_torch_state(ref.state_dict(), cfg)
    with torch.no_grad():
        hs_t, hf_t = ref(
            torch.from_numpy(g.gate).long(),
            torch.from_numpy(g.edge_index),
            torch.from_numpy(g.forward_level).long(),
        )
    batch = _jb(collate([g]))
    hs_j, hf_j, _ = forward(params, batch, cfg)
    inv = np.asarray(batch["node_inv"])
    n = g.num_nodes
    np.testing.assert_allclose(np.asarray(hf_j)[inv][:n], hf_t.numpy(), rtol=1e-4, atol=1e-4)
