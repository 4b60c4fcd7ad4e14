"""Public API surface: deepgate shim, Model object, checkpoint roundtrips,
torch .pth import."""
import numpy as np
import torch

import deepgate
from mgvae_tpu.data.synthetic import random_circuit
import mgvae_tpu
from mgvae_tpu.data.synthetic import random_circuit


def test_deepgate_shim_surface():
    for name in ("Model", "Trainer", "NpzParser", "BenchParser", "AigParser",
                 "Logger", "AverageMeter", "levelize"):
        assert hasattr(deepgate, name), name


def test_model_forward_on_graph_and_list():
    rng = np.random.default_rng(0)
    g = random_circuit(rng, "xag", num_inputs=4, num_gates=24)
    model = deepgate.Model()  # defaults to xag (quirk 2)
    hs, hf = model(g)
    assert hs.shape == (g.num_nodes, 64) and hf.shape == (g.num_nodes, 64)
    graphs = [g, random_circuit(rng, "xag", num_inputs=4, num_gates=24)]
    hs2, hf2 = model(graphs)
    assert hs2.shape[0] == sum(x.num_nodes for x in graphs)
    # single-graph embeddings must be identical inside the batch
    np.testing.assert_allclose(np.asarray(hs2[: g.num_nodes]), np.asarray(hs), rtol=1e-5, atol=1e-6)


def test_model_pred_prob_and_recon_loss():
    rng = np.random.default_rng(1)
    g = random_circuit(rng, "mig", num_inputs=4, num_gates=24)
    model = mgvae_tpu.Model(modality="mig")
    hs, hf = model(g)
    p = model.pred_prob(hf)
    assert p.shape == (g.num_nodes, 1)
    assert float(p.min()) >= 0.0 and float(p.max()) <= 1.0
    loss, metrics = model.recon_loss(hs, g.edge_index)
    assert np.isfinite(float(loss))


def test_model_save_load_roundtrip(tmp_path):
    model = mgvae_tpu.Model(modality="mig", seed=3)
    path = str(tmp_path / "m.pth")
    model.save(path)
    model2 = mgvae_tpu.Model(modality="mig", seed=99)
    model2.load(path)
    import jax

    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(model2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_model_load_torch_pth(tmp_path):
    """Real reference-format torch checkpoints load directly."""
    from benchmarks.torch_reference import ReferenceModel

    torch.manual_seed(5)
    ref = ReferenceModel("mig", dim_hidden=64, layernorm=True)
    path = str(tmp_path / "ref.pth")
    torch.save({"epoch": 3, "state_dict": ref.state_dict()}, path)

    model = mgvae_tpu.Model(modality="mig", dim_hidden=64, layernorm=True)
    model.load(path)
    # spot-check one tensor came through (transposed)
    w = ref.state_dict()["hs_linear.weight"].numpy()
    np.testing.assert_allclose(np.asarray(model.params["hs_linear"]["w"]), w.T, rtol=1e-6)


def test_module_prefix_stripped(tmp_path):
    """DDP-style 'module.'-prefixed checkpoints load (model_utils.py:22-51)."""
    from benchmarks.torch_reference import ReferenceModel

    ref = ReferenceModel("aig", dim_hidden=32, s_rounds=1, t_rounds=1)
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.utils.torch_compat import params_from_torch_state

    cfg = DGConfig(modality="aig", dim_hidden=32, s_rounds=1, t_rounds=1)
    params, state = params_from_torch_state(sd, cfg)
    w = ref.state_dict()["hs_linear.weight"].numpy()
    np.testing.assert_allclose(np.asarray(params["hs_linear"]["w"]), w.T, rtol=1e-6)


def test_encode_many_matches_single():
    rng = np.random.default_rng(5)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=16 + 8 * (i % 3)) for i in range(7)]
    model = mgvae_tpu.Model(modality="mig", dim_hidden=32)
    outs = model.encode_many(graphs, batch_size=3)
    assert len(outs) == 7
    for g, (hs, hf) in zip(graphs, outs):
        hs1, hf1 = model(g)
        np.testing.assert_allclose(hs, np.asarray(hs1), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(hf, np.asarray(hf1), rtol=1e-5, atol=1e-5)
