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


def test_edge_split_functions():
    from mgvae_tpu.data.edge_split import (
        biased_train_test_split_edges,
        bidirectional_train_test_split_edges,
        general_train_test_split_edges,
    )

    rng = np.random.default_rng(7)
    g = random_circuit(rng, "mig", num_inputs=5, num_gates=40)
    out = general_train_test_split_edges(g.edge_index, g.num_nodes, 0.1, 0.2, rng=rng)
    e = g.num_edges
    assert out["train_pos_edge_index"].shape[1] + out["val_pos_edge_index"].shape[1] + out["test_pos_edge_index"].shape[1] == e
    # negatives are not existing edges
    existing = set(map(tuple, g.edge_index.T.tolist()))
    for split in ("val", "test"):
        for u, v in out[f"{split}_neg_edge_index"].T.tolist():
            assert (u, v) not in existing and u != v
    # ratios-0 case degenerates to a shuffle of all edges (quirk 7)
    out0 = general_train_test_split_edges(g.edge_index, g.num_nodes, rng=rng)
    assert out0["train_pos_edge_index"].shape[1] == e
    biased_train_test_split_edges(g.edge_index, g.num_nodes, rng=rng)
    bidirectional_train_test_split_edges(g.edge_index, g.num_nodes, rng=rng)


def test_data_utils_parity_helpers():
    from mgvae_tpu.data.graph import add_edge_attr, construct_node_feature, one_hot

    oh = one_hot([0, 2, 1], 3)
    np.testing.assert_allclose(oh, np.eye(3)[[0, 2, 1]])
    x = np.array([[0, 1], [1, 4]])
    np.testing.assert_allclose(construct_node_feature(x, 6), np.eye(6)[[1, 4]])
    ea = add_edge_attr(3, 8, ll_diff=2)
    assert ea.shape == (3, 8)
    import math

    np.testing.assert_allclose(ea[0, 0], math.sin(2.0), rtol=1e-6)


def test_set_seed():
    from mgvae_tpu.utils.seed import set_seed

    set_seed(3)
    a = np.random.rand(4)
    set_seed(3)
    np.testing.assert_allclose(a, np.random.rand(4))
