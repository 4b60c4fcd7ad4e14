"""Front-end parser tests: npz roundtrip, .bench, AIGER ascii/binary."""
import numpy as np

from mgvae_tpu.data.aiger import AigParser, aig_to_xdata
from mgvae_tpu.data.bench import BenchParser
from mgvae_tpu.data.npz import NpzParser, parse_npz, save_npz
from mgvae_tpu.data.synthetic import random_circuit


def test_npz_roundtrip_mig(tmp_path):
    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=20, name=f"c{i}") for i in range(5)]
    cpath, lpath = str(tmp_path / "graphs.npz"), str(tmp_path / "labels.npz")
    save_npz(graphs, cpath, lpath, "mig")
    loaded = parse_npz(cpath, lpath, "mig")
    assert len(loaded) == 5
    for a, b in zip(graphs, loaded):
        np.testing.assert_array_equal(a.gate, b.gate)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        np.testing.assert_allclose(a.prob, b.prob)
        np.testing.assert_array_equal(a.tt_pair_index, b.tt_pair_index)
        np.testing.assert_allclose(a.tt_dis, b.tt_dis)


def test_npz_roundtrip_aig_layout_quirk(tmp_path):
    """AIG stores [2,E]/[2,P] raw (quirk 5) + labels inside graphs.npz."""
    rng = np.random.default_rng(1)
    graphs = [random_circuit(rng, "aig", num_inputs=4, num_gates=16, name=f"a{i}") for i in range(3)]
    cpath = str(tmp_path / "graphs.npz")
    save_npz(graphs, cpath, cpath, "aig")
    loaded = parse_npz(cpath, cpath, "aig")
    for a, b in zip(graphs, loaded):
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        np.testing.assert_array_equal(a.gate, b.gate)


def test_npz_parser_split_and_cache(tmp_path):
    rng = np.random.default_rng(2)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=20, name=f"c{i}") for i in range(10)]
    cpath, lpath = str(tmp_path / "graphs.npz"), str(tmp_path / "labels.npz")
    save_npz(graphs, cpath, lpath, "mig")
    p = NpzParser(str(tmp_path), cpath, lpath, "mig", seed=0)
    train, val = p.get_dataset()
    assert len(train) == 9 and len(val) == 1
    assert (tmp_path / "inmemory" / "data.npy").exists()
    p2 = NpzParser(str(tmp_path), cpath, lpath, "mig", seed=0)
    assert len(p2.train_dataset) == 9  # served from cache


def test_bench_parser(tmp_path):
    bench = """
# sample netlist
INPUT(a)
INPUT(b)
INPUT(c)
OUTPUT(f)
d = AND(a, b)
e = NOT(c)
g = XOR(d, e)
f = MAJ(d, e, g)
"""
    path = tmp_path / "t.bench"
    path.write_text(bench)
    g = BenchParser().read_bench(str(path))
    assert g.num_nodes == 7
    assert sorted(g.gate.tolist()) == [0, 0, 0, 1, 2, 3, 5]
    assert g.num_edges == 2 + 1 + 2 + 3
    assert len(g.PIs) == 3 and len(g.POs) == 1
    assert g.forward_level.max() == 3  # a/b/c -> d/e -> g -> f


def test_aiger_ascii_and_binary_equivalent(tmp_path):
    # half adder: o0 = a XOR b (via 3 ands), o1 = a AND b
    # aag: M I L O A
    aag = """aag 5 2 0 1 3
2
4
10
6 4 2
8 5 3
10 9 7
"""
    p_aag = tmp_path / "t.aag"
    p_aag.write_text(aag)
    xa, ea = aig_to_xdata(str(p_aag))

    # binary encoding of the same circuit
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
    p_aig = tmp_path / "t.aig"
    p_aig.write_bytes(blob)
    xb, eb = aig_to_xdata(str(p_aig))
    assert xa == xb and ea == eb

    g = AigParser().read_aiger(str(p_aig))
    # 2 PIs + 3 ANDs + NOT(a), NOT(b), NOT(and1), NOT(and2) = 9 nodes
    assert g.num_nodes == 9
    assert (g.gate == 2).sum() == 4
    assert (g.gate == 1).sum() == 3


def test_legacy_dataset_front_end(tmp_path):
    """deepgate.Dataset (DeepGate2-style, dead in the reference — quirk 13)
    rebuilt working: rc/min_tt labels, small_train/no_rc knobs, caching."""
    import types

    from mgvae_tpu.data.dataset import Dataset
    from mgvae_tpu.data.synthetic import random_circuit

    rng = np.random.default_rng(3)
    circuits, labels = {}, {}
    for i in range(5):
        g = random_circuit(rng, "mig", num_inputs=4, num_gates=24, num_tt_pairs=8)
        n = g.num_nodes
        x = np.zeros((n, 2), dtype=np.int64)
        x[:, 1] = g.gate
        circuits[f"c{i}"] = {"x": x, "edge_index": g.edge_index.T}
        labels[f"c{i}"] = {
            "tt_dis": g.tt_dis, "tt_pair_index": g.tt_pair_index.T,
            "min_tt_dis": g.tt_dis * 0.5, "prob": g.prob,
            "rc_pair_index": np.asarray([[0, 1], [1, 2]]),
            "is_rc": np.asarray([1.0, 0.0]),
        }

    def obj(d):
        a = np.empty((), dtype=object)
        a[()] = d
        return a

    np.savez(tmp_path / "graphs.npz", circuits=obj(circuits))
    np.savez(tmp_path / "labels.npz", labels=obj(labels))

    args = types.SimpleNamespace(
        data_dir=str(tmp_path), circuit_file="graphs.npz", label_file="labels.npz",
        small_train=False, no_rc=False, reload_dataset=False,
    )
    ds = Dataset(str(tmp_path), args)
    assert len(ds) == 5
    g = ds[0]
    assert g.rc_pair_index.shape == (2, 2) and g.is_rc.shape == (2,)
    assert g.min_tt_dis is not None and g.min_tt_dis.shape == g.tt_dis.shape
    # cache hit second time; no_rc variant gets its own cache + dummy labels
    ds2 = Dataset(str(tmp_path), args)
    assert len(ds2) == 5
    args_norc = types.SimpleNamespace(**{**vars(args), "no_rc": True})
    ds3 = Dataset(str(tmp_path), args_norc)
    assert float(ds3[0].is_rc.sum()) == 0.0
    # the graphs feed the standard pipeline (extras ignored by collate)
    from mgvae_tpu.data.batching import collate

    b = collate(ds.graphs[:2])
    assert b["gate"].shape[0] > 0
