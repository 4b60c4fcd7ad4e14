"""ArenaPacker (utils/transfer): single-transfer host->device batches.

The packer must be byte-exact vs per-array jnp.asarray for every dtype the
collate layout emits (f32, i32, bool), both unsharded and dp-sharded, and
the dp mode must actually produce arrays sharded along the leading axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mgvae_tpu.utils.transfer import ArenaPacker


def _demo_batch(rng, lead=None):
    def sh(*s):
        return (lead, *s) if lead is not None else s

    return {
        "x": rng.standard_normal(sh(32, 7)).astype(np.float32),
        "idx": rng.integers(0, 100, sh(32)).astype(np.int32),
        "mask": rng.integers(0, 2, sh(32)).astype(bool),
        "n_nodes": np.full(sh(), 32, np.int32),
        "empty": np.zeros(sh(0, 3), np.float32),
        "levels": rng.integers(0, 9, sh(4, 5)).astype(np.int32),
    }


def test_roundtrip_unsharded():
    batch = _demo_batch(np.random.default_rng(0))
    out = ArenaPacker().to_device(batch)
    assert set(out) == set(batch)
    for k in batch:
        a = np.asarray(out[k])
        assert a.dtype == batch[k].dtype, k
        assert a.shape == batch[k].shape, k
        np.testing.assert_array_equal(a, batch[k], err_msg=k)


def test_roundtrip_dp_sharded():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), ("dp",))
    batch = _demo_batch(np.random.default_rng(1), lead=8)
    out = ArenaPacker(mesh).to_device(batch)
    want = NamedSharding(mesh, P("dp"))
    for k in batch:
        a = np.asarray(out[k])
        assert a.dtype == batch[k].dtype, k
        np.testing.assert_array_equal(a, batch[k], err_msg=k)
        if batch[k].size:
            assert out[k].sharding.is_equivalent_to(want, out[k].ndim), k


def test_packed_batch_feeds_jit():
    """Unpacked arrays must be consumable by a jitted reduction (no tracing
    surprises from the bitcast path)."""
    batch = _demo_batch(np.random.default_rng(2))
    out = ArenaPacker().to_device(batch)

    @jax.jit
    def f(b):
        return jnp.sum(b["x"]) + jnp.sum(b["idx"]) + jnp.sum(b["mask"])

    got = float(f(out))
    want = float(batch["x"].sum() + batch["idx"].sum() + batch["mask"].sum())
    assert abs(got - want) < 1e-3


def test_pack_steps_roundtrip():
    rng = np.random.default_rng(3)
    batches = [_demo_batch(rng) for _ in range(3)]
    out = ArenaPacker().to_device_steps(batches)
    for k in batches[0]:
        got = np.asarray(out[k])
        assert got.shape == (3,) + batches[0][k].shape, k
        for i, b in enumerate(batches):
            np.testing.assert_array_equal(got[i], b[k], err_msg=f"{k}[{i}]")


def test_pack_steps_dp_sharded():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), ("dp",))
    rng = np.random.default_rng(4)
    batches = [_demo_batch(rng, lead=8) for _ in range(2)]
    out = ArenaPacker(mesh).to_device_steps(batches)
    want = NamedSharding(mesh, P(None, "dp"))
    for k in batches[0]:
        got = np.asarray(out[k])
        assert got.shape == (2,) + batches[0][k].shape, k
        for i, b in enumerate(batches):
            np.testing.assert_array_equal(got[i], b[k], err_msg=f"{k}[{i}]")
        if batches[0][k].size:
            assert out[k].sharding.is_equivalent_to(want, out[k].ndim), k
