"""Trainer smoke tests: single-device, shard_map DP on 8 virtual devices,
checkpoint/resume, lr schedule."""
import os
import types

import numpy as np
import jax
import jax.numpy as jnp

from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig
from mgvae_tpu.train.trainer import Trainer


def _dataset(n, modality="mig", seed=0):
    # fixed sizes => every batch shares one padded shape => one jit compile
    rng = np.random.default_rng(seed)
    return [random_circuit(rng, modality, num_inputs=4, num_gates=24) for _ in range(n)]


def _args():
    return types.SimpleNamespace(model="DG_AE", type="mig")


def test_single_device_training_reduces_loss(tmp_path):
    cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=2, t_rounds=2, layernorm=True)
    train_ds, val_ds = _dataset(16, seed=1), _dataset(4, seed=2)
    tr = Trainer(
        _args(), cfg, training_id="t1", save_dir=str(tmp_path), lr=1e-3,
        rc_prob_func_weight=[1.0, 0.0, 0.0], batch_size=4, distributed=False,
    )
    tr.set_training_args(lr_step=50)
    first = None
    for _ in range(4):
        m = tr.train(1, train_ds, val_ds)
        if first is None:
            first = m["recon"]
    assert np.isfinite(m["recon"])
    assert m["recon"] < first  # recon-only training must reduce recon loss


def test_dp_training_on_virtual_mesh(tmp_path):
    assert len(jax.devices()) == 8
    cfg = DGConfig(modality="aig", dim_hidden=32, s_rounds=1, t_rounds=1)
    train_ds, val_ds = _dataset(32, "aig", seed=3), _dataset(8, "aig", seed=4)
    tr = Trainer(
        _args(), cfg, training_id="dp", save_dir=str(tmp_path), lr=1e-3,
        batch_size=2, distributed=True, num_devices=8,
    )
    m = tr.train(1, train_ds, val_ds)
    assert np.isfinite(m["recon"]) and np.isfinite(m["func"])


def test_checkpoint_resume_roundtrip(tmp_path):
    cfg = DGConfig(modality="xag", dim_hidden=32, s_rounds=1, t_rounds=1)
    ds = _dataset(8, "xag", seed=5)
    tr = Trainer(_args(), cfg, training_id="ck", save_dir=str(tmp_path), batch_size=4, distributed=False)
    tr.train(1, ds, ds)
    tr.model_epoch = 7
    path = os.path.join(tr.log_dir, "model_last.pth")
    tr.save(path)

    tr2 = Trainer(_args(), cfg, training_id="ck", save_dir=str(tmp_path), batch_size=4, distributed=False)
    assert tr2.resume()
    assert tr2.model_epoch == 7
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # optimizer moments restored too
    for a, b in zip(jax.tree.leaves(tr.opt_state), jax.tree.leaves(tr2.opt_state)):
        if hasattr(a, "shape") and np.shape(a):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_lr_step_decay(tmp_path):
    cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=1, t_rounds=1)
    ds = _dataset(4, seed=6)
    tr = Trainer(_args(), cfg, training_id="lr", save_dir=str(tmp_path), lr=1e-3, batch_size=4, distributed=False)
    tr.set_training_args(lr_step=2)
    tr.train(2, ds, ds)
    np.testing.assert_allclose(tr.lr, 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(tr.opt_state.hyperparams["learning_rate"]), 1e-4, rtol=1e-6)


def test_stage_weight_change_no_recompile_crash(tmp_path):
    """3-stage schedule: weight updates must not need a new jit signature."""
    cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=1, t_rounds=1)
    ds = _dataset(8, seed=7)
    tr = Trainer(_args(), cfg, training_id="st", save_dir=str(tmp_path), batch_size=4, distributed=False)
    for weights in ([1.0, 0.0, 0.0], [1.0, 5.0, 0.0], [1.0, 4.0, 4.0]):
        tr.set_training_args(rc_prob_func_weight=weights, lr=1e-4, lr_step=50)
        m = tr.train(1, ds, ds)
        assert np.isfinite(m["recon"])


def test_vae_training_with_kl(tmp_path):
    """DG_VAE mode end-to-end (BASELINE config #4): reparameterized forward,
    KL in the objective, finite and decreasing losses. (The reference's
    DG_VAE path crashes, SURVEY.md quirk 12 — this is the fixed version.)"""
    cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=1, t_rounds=1, variational=True)
    ds = _dataset(8, seed=11)
    tr = Trainer(
        _args(), cfg, training_id="vae", save_dir=str(tmp_path), lr=1e-3,
        rc_prob_func_weight=[1.0, 1.0, 1.0], kl_weight=0.1,
        batch_size=4, distributed=False,
    )
    first = tr.train(1, ds, ds)
    for _ in range(2):
        last = tr.train(1, ds, ds)
    assert np.isfinite(last["recon"]) and np.isfinite(last["kl"])
    assert last["recon"] < first["recon"]


def test_fixed_dims_yields_one_shape(tmp_path):
    """fixed_dims mode: every batch across epochs/shuffles must share one
    padded shape (no recompilation storm on varied-size datasets)."""
    import types

    from mgvae_tpu.data.batching import batch_shape_key
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.native import get_lib
    from mgvae_tpu.train.trainer import Trainer

    if get_lib() is None:
        import pytest

        pytest.skip("fixed_dims needs the native stats pass")
    rng = np.random.default_rng(0)
    ds = [
        random_circuit(rng, "mig", num_inputs=4, num_gates=int(g))
        for g in rng.integers(16, 120, size=12)
    ]
    cfg = DGConfig(modality="mig", dim_hidden=16, s_rounds=1, t_rounds=1)
    tr = Trainer(
        types.SimpleNamespace(model="DG_AE"), cfg, training_id="fd", save_dir=str(tmp_path),
        batch_size=4, distributed=False, fixed_dims=True,
    )
    keys = set()
    for _ in range(3):  # three shuffled epochs
        for b in tr._iter_batches(ds, shuffle=True):
            keys.add(batch_shape_key(b))
    assert len(keys) == 1, f"expected one shape, got {len(keys)}"


def _leaves_allclose(a, b, rtol, atol):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_multi_step_matches_per_step(tmp_path):
    """K scanned steps per dispatch (steps_per_call) must reproduce the
    per-step path: same rng stream, same shuffles -> same params."""
    cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=1, t_rounds=1, layernorm=True)
    ds = _dataset(40, seed=7)  # 10 steps at bs4 -> 2 groups of 4 + 2 tail
    trs = [
        Trainer(
            _args(), cfg, training_id=f"ms{k}", save_dir=str(tmp_path), lr=1e-3,
            batch_size=4, distributed=False, seed=11, steps_per_call=k,
        )
        for k in (4, 1)
    ]
    ms = [tr.train(2, ds, ds[:16]) for tr in trs]  # 4 val steps -> one eval group
    _leaves_allclose(trs[0].params, trs[1].params, rtol=2e-5, atol=1e-6)
    _leaves_allclose(trs[0].state, trs[1].state, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(ms[0]["recon"], ms[1]["recon"], rtol=1e-4)


def test_multi_step_dp_mesh(tmp_path):
    """steps_per_call composes with shard_map dp: grouped steps train on the
    8-device mesh and match the per-step dp path."""
    assert len(jax.devices()) == 8
    cfg = DGConfig(modality="aig", dim_hidden=32, s_rounds=1, t_rounds=1)
    ds = _dataset(64, "aig", seed=8)  # bs2 x 8 dev -> 4 steps -> 2 groups of 2
    trs = [
        Trainer(
            _args(), cfg, training_id=f"msdp{k}", save_dir=str(tmp_path), lr=1e-3,
            batch_size=2, distributed=True, num_devices=8, seed=13, steps_per_call=k,
        )
        for k in (2, 1)
    ]
    ms = [tr.train(1, ds, ds[:16]) for tr in trs]
    assert np.isfinite(ms[0]["recon"])
    _leaves_allclose(trs[0].params, trs[1].params, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(ms[0]["recon"], ms[1]["recon"], rtol=1e-4)
