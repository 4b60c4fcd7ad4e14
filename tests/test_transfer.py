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


def test_wire_narrowing_exact():
    """Bitpacked bools, int16/int8-narrowed ints, and int16-wired
    integer-valued floats must round-trip exactly with logical dtypes."""
    from mgvae_tpu.utils.transfer import _plan

    rng = np.random.default_rng(5)
    batch = {
        "big_ids": rng.integers(0, 30000, (257,)).astype(np.int32),
        "small_ids": rng.integers(0, 100, (130,)).astype(np.int32),
        "flags": rng.integers(0, 2, (1001,)).astype(bool),  # odd length
        "deg": rng.integers(0, 50, (64,)).astype(np.float32),  # int-valued f32
        "real": rng.standard_normal((64,)).astype(np.float32),
    }
    items, total = _plan([batch], 0)
    wires = {k: w for k, _, w, _, _ in items}
    assert wires["big_ids"] == np.dtype(np.int16).str
    assert wires["small_ids"] == np.dtype(np.int8).str
    assert wires["flags"] == "bits"
    assert wires["deg"] == np.dtype(np.int16).str
    assert wires["real"] == np.dtype(np.float32).str
    out = ArenaPacker().to_device(batch)
    for k in batch:
        got = np.asarray(out[k])
        assert got.dtype == batch[k].dtype, k
        np.testing.assert_array_equal(got, batch[k], err_msg=k)


def test_sticky_plan_widens_monotonically():
    """Wire plans must not flicker between calls (every distinct plan is a
    fresh unpack compile): narrower batches reuse the widened plan."""
    p = ArenaPacker()
    wide = {"ids": np.full((64,), 30000, np.int32)}
    narrow = {"ids": np.full((64,), 3, np.int32)}
    out_w = p.to_device(wide)
    plan_after_wide = next(iter(p._plans.values()))
    out_n = p.to_device(narrow)
    assert next(iter(p._plans.values())) == plan_after_wide  # no re-plan
    np.testing.assert_array_equal(np.asarray(out_n["ids"]), narrow["ids"])
    # narrow first, then wide: plan widens once, then narrow reuses it
    p2 = ArenaPacker()
    p2.to_device(narrow)
    p2.to_device(wide)
    widened = next(iter(p2._plans.values()))
    out2 = p2.to_device(narrow)
    assert next(iter(p2._plans.values())) == widened
    np.testing.assert_array_equal(np.asarray(out2["ids"]), narrow["ids"])
