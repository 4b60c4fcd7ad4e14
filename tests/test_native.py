"""C++ native data path: build, parity with python fallbacks."""
import numpy as np
import pytest

from mgvae_tpu import native
from mgvae_tpu.data.synthetic import random_circuit


def _have_native():
    return native.get_lib() is not None


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
def test_native_levelize_matches_python():
    import mgvae_tpu.data.levelize as lv

    rng = np.random.default_rng(0)
    for _ in range(5):
        g = random_circuit(rng, "xmg", num_inputs=6, num_gates=80)
        a = native.levelize_native(g.edge_index, g.num_nodes)
        # force the python path by calling the inner implementation directly
        import os

        os.environ["MGVAE_NO_NATIVE"] = "1"
        native._lib = None
        b = lv.levelize(g.edge_index, g.num_nodes)
        del os.environ["MGVAE_NO_NATIVE"]
        native._lib = None
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
def test_native_levelize_cycle():
    edge = np.array([[0, 1, 2], [1, 2, 0]])
    with pytest.raises(ValueError):
        native.levelize_native(edge, 3)


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
def test_native_aig_decode_matches_python(tmp_path):
    def enc(x):
        out = b""
        while x >= 0x80:
            out += bytes([(x & 0x7F) | 0x80])
            x >>= 7
        return out + bytes([x])

    ands = [(6, 4, 2), (8, 5, 3), (10, 9, 7)]
    blob = b"aig 5 2 0 1 3\n10\n"
    for lhs, r0, r1 in ands:
        blob += enc(lhs - r0) + enc(r0 - r1)

    res = native.aig_decode_native(blob)
    assert res is not None
    gates, edges = res

    # python reference decode
    from mgvae_tpu.data.aiger import _decode_binary

    i, l, o, a, outputs, pands = _decode_binary(blob)
    assert pands == ands
    # structural expectations (see tests/test_parsers.py)
    assert len(gates) == 9
    assert (gates == 2).sum() == 4 and (gates == 1).sum() == 3
    assert edges.shape[1] == 2 * 3 + 4  # 2 per AND + 1 per NOT


def test_native_collate_matches_numpy(monkeypatch):
    """The C++ collate core must produce byte-identical batches to the numpy
    reference path, across modalities, paddings, and tt-pair layouts."""
    import mgvae_tpu.data.batching as B
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.native import get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for modality, ng, nc in (("mig", 40, 5), ("xmg", 300, 3), ("aig", 24, 1)):
        graphs = [
            random_circuit(rng, modality, num_inputs=6, num_gates=ng, num_tt_pairs=16)
            for _ in range(nc)
        ]
        b_nat = B.collate(graphs, mp=2)
        with monkeypatch.context() as m:
            m.setattr(B, "_collate_native", lambda *a, **k: None)
            b_np = B.collate(graphs, mp=2)
        assert set(b_nat) == set(b_np)
        for k in b_np:
            np.testing.assert_array_equal(
                np.asarray(b_nat[k]), np.asarray(b_np[k]), err_msg=f"{modality}:{k}"
            )


def test_native_collate_step_matches_per_shard(monkeypatch):
    """The whole-step C++ collation (mg_collate_step, threaded) and the
    per-shard zero-copy fallback must both match np.stack of per-shard
    collate() exactly — mixed modalities, ragged sizes, empty tt lists."""
    import mgvae_tpu.data.batching as B

    rng = np.random.default_rng(11)
    graphs = [
        random_circuit(
            rng, m, num_inputs=6,
            num_gates=int(rng.integers(30, 200)),
            num_tt_pairs=int(rng.integers(0, 24)),
        )
        for m, _ in zip(["mig", "aig", "xag", "xmg"] * 8, range(32))
    ]
    shards = [graphs[i * 8 : (i + 1) * 8] for i in range(4)]
    pre = [B.natural_dims(s) for s in shards]
    dims = {k: max(d[k] for d in pre) for k in pre[0]}
    ref = {
        k: np.stack([B.collate(s, dims=dims)[k] for s in shards])
        for k in B.collate(shards[0], dims=dims)
    }

    got = B.collate_shards(shards, dims=dims)  # step-native when available
    for k in ref:
        assert ref[k].dtype == got[k].dtype and ref[k].shape == got[k].shape, k
        np.testing.assert_array_equal(ref[k], got[k], err_msg=f"step:{k}")

    with monkeypatch.context() as m:  # per-shard zero-copy route
        m.setattr(B, "_collate_step_native", lambda *a, **k: None)
        got2 = B.collate_shards(shards, dims=dims)
    for k in ref:
        np.testing.assert_array_equal(ref[k], got2[k], err_msg=f"per-shard:{k}")


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
def test_native_collate_step_multithreaded(monkeypatch):
    """Shard-parallel std::thread execution must be deterministic (each
    thread owns disjoint output slices)."""
    import mgvae_tpu.data.batching as B

    rng = np.random.default_rng(13)
    graphs = [
        random_circuit(rng, "mig", num_inputs=6, num_gates=64, num_tt_pairs=8)
        for _ in range(32)
    ]
    shards = [graphs[i * 4 : (i + 1) * 4] for i in range(8)]
    pre = [B.natural_dims(s) for s in shards]
    dims = {k: max(d[k] for d in pre) for k in pre[0]}
    monkeypatch.setenv("MGVAE_COLLATE_THREADS", "8")
    a = B.collate_shards(shards, dims=dims)
    monkeypatch.setenv("MGVAE_COLLATE_THREADS", "1")
    b = B.collate_shards(shards, dims=dims)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_group_stats_cache_matches_shard_dims():
    """The batched epoch pre-scan (mg_group_stats via GroupStatsCache) must
    reproduce shard_dims / chunked_shard_dims exactly."""
    import mgvae_tpu.data.batching as B

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    graphs = [
        random_circuit(
            rng, m, num_inputs=6,
            num_gates=int(rng.integers(30, 300)),
            num_tt_pairs=int(rng.integers(0, 32)),
        )
        for m, _ in zip(["mig", "aig", "xag", "xmg"] * 12, range(48))
    ]
    cache = B.GroupStatsCache(graphs)
    idx = np.arange(48)
    np.random.default_rng(1).shuffle(idx)
    groups = [idx[i * 8 : (i + 1) * 8] for i in range(6)]
    dl = cache.group_dims(groups)
    for g, d in zip(groups, dl):
        assert B.shard_dims([graphs[i] for i in g]) == d
    for g in groups:  # chunked: max over the same deterministic bins
        bins = B._partition_by_size(cache.n[g], 2)
        sub = cache.group_dims([g[b] for b in bins])
        got = {k: max(d[k] for d in sub) for k in sub[0]}
        assert B.chunked_shard_dims([graphs[i] for i in g], 2) == got
