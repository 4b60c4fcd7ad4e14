"""Trainer integration of shape-aware split batches (collate_split):
forced split mode trains end-to-end (single device + dp mesh + K-step
groups), batch shapes stay stable across epochs, and the ArenaPacker
round-trips the nested ``groups`` tuple."""
import types

import numpy as np
import jax
import jax.numpy as jnp

from mgvae_tpu.data.batching import collate_split, split_dims
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig
from mgvae_tpu.train.trainer import Trainer, _map_leaves


def _dataset(n, modality="mig", seed=0, lo=16, hi=120):
    rng = np.random.default_rng(seed)
    return [
        random_circuit(rng, modality, num_inputs=4, num_gates=int(g))
        for g in rng.integers(lo, hi, size=n)
    ]


def _args():
    return types.SimpleNamespace(model="DG_AE", type="mig")


def _leaf_sig(batch):
    sig = []
    for k, v in sorted(batch.items()):
        if k == "groups":
            for gi, gb in enumerate(v):
                sig.extend(((k, gi, kk), np.shape(vv)) for kk, vv in sorted(gb.items()))
        else:
            sig.append((k, np.shape(v)))
    return tuple(sig)


def test_split_trainer_single_device_trains(tmp_path):
    cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=1, t_rounds=1, layernorm=True)
    ds = _dataset(32, seed=1)
    tr = Trainer(
        _args(), cfg, training_id="sp1", save_dir=str(tmp_path), lr=1e-3,
        rc_prob_func_weight=[1.0, 0.0, 0.0], batch_size=8, distributed=False,
        steps_per_call=2, split=2,
    )
    first = None
    for _ in range(3):
        m = tr.train(1, ds, ds[:8])
        if first is None:
            first = m["recon"]
    assert tr._split == 2  # split mode actually engaged
    assert np.isfinite(m["recon"])
    assert m["recon"] < first


def test_split_trainer_shapes_stable_across_epochs(tmp_path):
    """Fixed-dims discipline must hold for split batches too: every epoch's
    batches (shuffled) share ONE leaf-shape signature -> one jit compile."""
    cfg = DGConfig(modality="mig", dim_hidden=16, s_rounds=1, t_rounds=1)
    ds = _dataset(24, seed=2)
    tr = Trainer(
        _args(), cfg, training_id="sp2", save_dir=str(tmp_path),
        batch_size=8, distributed=False, split=2,
    )
    sigs = set()
    for _ in range(3):
        for b in tr._iter_batches(ds, shuffle=True):
            assert "groups" in b
            sigs.add(_leaf_sig(b))
    assert len(sigs) == 1, f"expected one split-batch shape, got {len(sigs)}"


def test_split_trainer_dp_mesh(tmp_path):
    """Split batches stack over dp and flow through shard_map + the packed
    arena transfer (groups flatten/unflatten) on the 8-device CPU mesh."""
    assert len(jax.devices()) == 8
    cfg = DGConfig(modality="aig", dim_hidden=32, s_rounds=1, t_rounds=1)
    ds = _dataset(64, "aig", seed=3, lo=16, hi=60)
    tr = Trainer(
        _args(), cfg, training_id="spdp", save_dir=str(tmp_path), lr=1e-3,
        batch_size=4, distributed=True, num_devices=8, steps_per_call=2, split=2,
    )
    m = tr.train(1, ds, ds[:32])
    assert tr._split == 2
    assert np.isfinite(m["recon"]) and np.isfinite(m["func"])


def test_level_sup_exact_vs_bruteforce():
    """GroupStatsCache.level_sup must be a TIGHT sup of the per-group
    (np_real, ep_real) stats over every m-subset: >= every sampled subset,
    and attained (per stat) by some subset."""
    import itertools

    from mgvae_tpu.data.batching import GroupStatsCache

    rng = np.random.default_rng(11)
    graphs = [random_circuit(rng, "mig", num_inputs=int(rng.integers(3, 7)),
                             num_gates=int(rng.integers(10, 60)))
              for _ in range(7)]
    cache = GroupStatsCache(graphs)
    Hn, He = cache.level_hists()
    # histograms match a direct per-graph count
    for i, g in enumerate(graphs):
        fwd = np.asarray(g.forward_level)
        np.testing.assert_array_equal(
            Hn[i, :fwd.max() + 1], np.bincount(fwd))
        dst_lv = fwd[np.asarray(g.edge_index[1])]
        np.testing.assert_array_equal(
            He[i, :dst_lv.max() + 1], np.bincount(dst_lv, minlength=fwd.max() + 1)[:dst_lv.max() + 1])

    ids = np.arange(len(graphs))
    m = 3
    np_sup, ep_sup = cache.level_sup(ids, m)
    best_np = best_ep = 0
    for sub in itertools.combinations(range(len(graphs)), m):
        sub = np.asarray(sub)
        np_r = int(Hn[sub, 1:].sum(axis=0).max(initial=0))
        ep_r = int(He[sub, 1:].sum(axis=0).max(initial=0))
        assert np_r <= np_sup and ep_r <= ep_sup
        best_np = max(best_np, np_r)
        best_ep = max(best_ep, ep_r)
    assert best_np == np_sup and best_ep == ep_sup


def test_split_dims_never_grow_after_first_epoch(tmp_path):
    """Regression for the 21s-vs-2.4s split e2e: a dims growth in a later
    epoch = a remote recompile. This is the exact config that leaked an EP
    bucket (256->320) before the closed-form NP/EP sup landed: stratified
    layout + worst-case pre-grow must pin the dims list at epoch 0."""
    rng = np.random.default_rng(7)
    ds = [random_circuit(rng, "mig", num_inputs=int(rng.integers(6, 14)),
                         num_gates=int(rng.integers(60, 180)), num_tt_pairs=16)
          for _ in range(128)]
    cfg = DGConfig(modality="mig", dim_hidden=32, layernorm=True)
    tr = Trainer(_args(), cfg, training_id="spstab", save_dir=str(tmp_path),
                 lr=1e-4, batch_size=32, distributed=False, seed=3, split=2)
    first = None
    for ep in range(25):
        _, _, _, dims, _ = tr._epoch_plan(ds, shuffle=True)
        assert isinstance(dims, list)
        key = tuple(tuple(sorted(d.items())) for d in dims)
        if first is None:
            first = key
        else:
            assert key == first, f"split dims grew at epoch {ep}"
    assert tr._split_layout == "stratified"


def test_packer_roundtrips_split_batch():
    """ArenaPacker to_device/to_device_steps must reproduce every leaf of a
    split batch, including the nested groups tuple."""
    from mgvae_tpu.utils.transfer import ArenaPacker

    graphs = _dataset(8, seed=5)
    graphs2 = _dataset(8, seed=6)
    dims = split_dims([graphs, graphs2], 2)  # agreed across both steps
    b = collate_split(graphs, 2, dims=dims)
    b.pop("node_inv")

    def check(dev, host):
        assert set(dev) == set(host)
        for k in host:
            if k == "groups":
                assert len(dev[k]) == len(host[k])
                for gd, gh in zip(dev[k], host[k]):
                    for kk in gh:
                        np.testing.assert_array_equal(np.asarray(gd[kk]),
                                                      np.asarray(gh[kk]))
            else:
                np.testing.assert_array_equal(np.asarray(dev[k]), np.asarray(host[k]))

    check(ArenaPacker().to_device(b), b)

    # K-step group path: two structurally-identical steps
    b2 = collate_split(graphs2, 2, dims=dims)
    b2.pop("node_inv")
    # pad-free check only if dims agreed; leaf shapes must match
    assert _leaf_sig(b) == _leaf_sig(b2)
    out = ArenaPacker().to_device_steps([b, b2])
    step0 = _map_leaves(out, lambda v: np.asarray(v)[0])
    step1 = _map_leaves(out, lambda v: np.asarray(v)[1])
    check(step0, b)
    for k in b2:
        if k == "groups":
            for gd, gh in zip(step1[k], b2[k]):
                for kk in gh:
                    np.testing.assert_array_equal(np.asarray(gd[kk]), np.asarray(gh[kk]))
        else:
            np.testing.assert_array_equal(np.asarray(step1[k]), np.asarray(b2[k]))
