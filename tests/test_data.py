"""Data-layer tests: levelization, graph build, level-bucketed batching."""
import numpy as np
import torch

from mgvae_tpu.data.batching import bucket, collate
from mgvae_tpu.data.graph import build_graph
from mgvae_tpu.data.levelize import levelize, return_order_info
from mgvae_tpu.data.synthetic import random_circuit


def torch_top_sort(edge_index, graph_size):
    """The reference's top_sort (dag_utils.py:10-37), used as golden oracle."""
    node_ids = np.arange(graph_size, dtype=int)
    node_order = np.zeros(graph_size, dtype=int)
    unevaluated = np.ones(graph_size, dtype=bool)
    parents, children = edge_index[0], edge_index[1]
    n = 0
    while unevaluated.any():
        unev_mask = unevaluated[parents]
        unready = children[unev_mask]
        to_eval = unevaluated & ~np.isin(node_ids, unready)
        node_order[to_eval] = n
        unevaluated[to_eval] = False
        n += 1
    return node_order


def test_levelize_matches_reference_top_sort():
    rng = np.random.default_rng(0)
    for _ in range(5):
        g = random_circuit(rng, "mig", num_inputs=6, num_gates=40)
        ours = levelize(g.edge_index, g.num_nodes)
        golden = torch_top_sort(g.edge_index, g.num_nodes)
        np.testing.assert_array_equal(ours, golden)


def test_levelize_edge_invariant():
    rng = np.random.default_rng(1)
    g = random_circuit(rng, "xmg", num_inputs=5, num_gates=64)
    lvl = levelize(g.edge_index, g.num_nodes)
    assert (lvl[g.edge_index[0]] < lvl[g.edge_index[1]]).all()


def test_levelize_cycle_detection():
    edge = np.array([[0, 1, 2], [1, 2, 0]])
    try:
        levelize(edge, 3)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_return_order_info_api():
    rng = np.random.default_rng(2)
    g = random_circuit(rng, "aig", num_inputs=4, num_gates=20)
    f, fi, b, bi = return_order_info(g.edge_index, g.num_nodes)
    np.testing.assert_array_equal(fi, np.arange(g.num_nodes))
    assert f.max() > 0 and b.max() > 0


def test_bucket_bounds():
    for x in [1, 7, 8, 9, 100, 1000, 12345]:
        b = bucket(x)
        assert b >= x and b <= max(8, int(x * 1.25) + 8)


def test_collate_shapes_and_level_tables():
    rng = np.random.default_rng(3)
    graphs = [random_circuit(rng, "mig", num_inputs=4, num_gates=30, name=f"g{i}") for i in range(3)]
    batch = collate(graphs)
    n = int(batch["n_nodes"])
    assert n == sum(g.num_nodes for g in graphs)
    assert batch["gate"].shape[0] > n  # >=1 padding node
    assert batch["node_valid"][:n].all() and not batch["node_valid"][n:].any()

    # every valid level-table node is at the right forward level
    L = batch["lv_nodes"].shape[0]
    fwd = batch["forward_level"]
    for i in range(L):
        nodes = batch["lv_nodes"][i][batch["lv_node_valid"][i]]
        if nodes.size:
            assert (fwd[nodes] == i + 1).all()

    # every valid edge appears exactly once in the level tables, at the
    # level of its destination, and dst_slot resolves back to the dst node
    e = int(batch["n_edges"])
    seen = set()
    for i in range(L):
        valid = batch["lv_edge_valid"][i]
        srcs = batch["lv_edge_src"][i][valid]
        slots = batch["lv_edge_dst_slot"][i][valid]
        dsts = batch["lv_nodes"][i][slots]
        for s, d in zip(srcs, dsts):
            assert fwd[d] == i + 1
            seen.add((int(s), int(d)))
    orig = set(
        zip(batch["edge_src"][:e].tolist(), batch["edge_dst"][:e].tolist())
    )
    assert seen == orig


def test_collate_offsets_tt_pairs():
    rng = np.random.default_rng(4)
    graphs = [random_circuit(rng, "xag", num_inputs=4, num_gates=16, num_tt_pairs=5) for _ in range(2)]
    batch = collate(graphs)
    p = int(batch["n_tt"])
    assert p == 10
    # pairs of the second graph map (through the level-major renumbering)
    # back to original ids offset past the first graph's nodes
    orig_a = batch["node_perm"][batch["tt_pair_a"][5:10]]
    assert orig_a.min() >= graphs[0].num_nodes


def test_synthetic_prob_in_range():
    rng = np.random.default_rng(5)
    g = random_circuit(rng, "xmg", num_inputs=6, num_gates=50)
    assert (g.prob >= 0).all() and (g.prob <= 1).all()
    # PIs should have prob approximately 0.5 (random 64-bit patterns)
    assert abs(g.prob[g.PIs].mean() - 0.5) < 0.2
