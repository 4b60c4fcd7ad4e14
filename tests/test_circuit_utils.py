"""Circuit toolkit tests: logic ops, COP, reconvergence, simulation."""
import numpy as np

from mgvae_tpu.data.levelize import levelize
from mgvae_tpu.utils.circuit import (
    aig_simulation,
    generate_orthogonal_vectors,
    generate_prob_cont,
    generate_prob_obs,
    get_fanin_fanout,
    get_function_acc,
    get_level_list,
    identify_reconvergence,
    logic,
    prob_logic,
    simulator,
)


def test_scalar_logic_table():
    assert logic(1, [1, 1]) == 1 and logic(1, [1, 0]) == 0   # AND
    assert logic(2, [1, 1]) == 0 and logic(2, [1, 0]) == 1   # NAND
    assert logic(3, [0, 0]) == 0 and logic(3, [0, 1]) == 1   # OR
    assert logic(4, [0, 0]) == 1 and logic(4, [0, 1]) == 0   # NOR
    assert logic(5, [1]) == 0 and logic(5, [0]) == 1         # NOT
    assert logic(6, [1, 0]) == 1 and logic(6, [1, 1]) == 0   # XOR
    assert logic(6, [0, 0]) == 0


def _tree_circuit():
    """a,b,c,d PIs; e=AND(a,b); f=OR(c,d); g=XOR(e,f) — fanout-free tree."""
    x_data = [["n%d" % i, t, 0] for i, t in enumerate([0, 0, 0, 0, 1, 3, 6])]
    edges = np.array([[0, 4], [1, 4], [2, 5], [3, 5], [4, 6], [5, 6]]).T
    levels = levelize(edges, 7)
    for i in range(7):
        x_data[i][2] = int(levels[i])
    fanin, fanout = get_fanin_fanout(7, edges)
    level_list = get_level_list(levels)
    return x_data, edges, fanin, fanout, level_list


def test_cop_exact_on_tree():
    x_data, edges, fanin, fanout, level_list = _tree_circuit()
    x_data = generate_prob_cont(x_data, [0, 1, 2, 3], level_list, fanin)
    # columns: [..., C1, C0]
    c1 = {i: x_data[i][3] for i in range(7)}
    assert abs(c1[4] - 0.25) < 1e-9        # AND of two 0.5
    assert abs(c1[5] - 0.75) < 1e-9        # OR of two 0.5
    # XOR(e,f): zero = C0e*C0f + C1e*C1f = .75*.25 + .25*.75 = .375; one=.625
    assert abs(c1[6] - 0.625) < 1e-9

    x_data = generate_prob_obs(x_data, level_list, fanin, fanout)
    co = {i: x_data[i][5] for i in range(7)}
    assert co[6] == 1                       # PO
    # obs of e through XOR = max(C1_f, C0_f) = .75
    assert abs(co[4] - 0.75) < 1e-9


def test_simulation_matches_cop_on_tree():
    """On fanout-free circuits signal probability == COP C1.

    Note the reference caps patterns at 10 * 2^PIs (circuit_utils.py:203) —
    replicated here — so with 4 PIs only ~192 patterns run; tolerance is
    set to 3 sigma of that sample size."""
    x_data, edges, fanin, fanout, level_list = _tree_circuit()
    y = simulator(x_data, [0, 1, 2, 3], level_list, fanin, num_patterns=64 * 256, seed=0)
    x2 = generate_prob_cont([row[:3] for row in x_data], [0, 1, 2, 3], level_list, fanin)
    for i in range(4, 7):
        assert abs(y[i][0] - x2[i][3]) < 0.1


def test_reconvergence_diamond():
    """a -> b, c -> d: d reconverges at source a."""
    x_data = [["a", 0, 0], ["b", 5, 1], ["c", 5, 1], ["d", 1, 2]]
    edges = np.array([[0, 1], [0, 2], [1, 3], [2, 3]]).T
    fanin, fanout = get_fanin_fanout(4, edges)
    level_list = [[0], [1, 2], [3]]
    x_data, rc = identify_reconvergence(x_data, level_list, fanin, fanout)
    assert rc == [3]
    assert x_data[3][-2] == 1 and x_data[3][-1] == 0  # rc flagged, source = a


def test_aig_simulation_prob():
    # a AND b with a NOT: n2 = NOT(a), n3 = AND(n2, b)
    gate = np.array([0, 0, 2, 1])
    edges = np.array([[0, 2], [2, 3], [1, 3]]).T
    p = aig_simulation(gate, edges, num_patterns=64 * 512, seed=1)
    assert abs(p[2] - 0.5) < 0.05
    assert abs(p[3] - 0.25) < 0.05


def test_orthogonal_vectors():
    v = generate_orthogonal_vectors(10, 16, seed=0)
    g = v @ v.T
    np.testing.assert_allclose(np.diag(g), np.ones(10), atol=1e-6)
    off = g - np.diag(np.diag(g))
    assert np.abs(off).max() < 1e-6


def test_get_function_acc_perfect_embeddings():
    from mgvae_tpu.data.synthetic import random_circuit

    rng = np.random.default_rng(4)
    g = random_circuit(rng, "mig", num_inputs=6, num_gates=40, num_tt_pairs=40)
    # embeddings engineered so cosine distance == monotone in tt_dis is
    # impossible generally; instead check random embeddings give acc in [0,1]
    emb = rng.normal(size=(g.num_nodes, 16))
    acc = get_function_acc(g, emb, samples=50)
    assert acc == -1 or 0.0 <= acc <= 1.0


def test_extract_subcircuit_and_statistics():
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.utils.circuit import circuit_statistics, extract_subcircuit

    rng = np.random.default_rng(6)
    g = random_circuit(rng, "mig", num_inputs=6, num_gates=50)
    root = int(g.POs[0]) if len(g.POs) else g.num_nodes - 1
    sub, kept = extract_subcircuit(g, [root])
    assert sub.num_nodes == len(kept) <= g.num_nodes
    assert root in kept
    # cut nodes became PIs; subgraph still levelizes
    assert (sub.forward_level >= 0).all()
    stats = circuit_statistics(g)
    assert stats["num_nodes"] == g.num_nodes and stats["num_pis"] >= 6


def test_backward_search_cone():
    from mgvae_tpu.utils.circuit import backward_search

    # a(0) -> c(2); b(1) -> c; c -> d(3)
    x_data = [["a", 0, 0], ["b", 0, 0], ["c", 1, 1], ["d", 5, 2]]
    fanin = [[], [], [0, 1], [2]]
    cone = backward_search(3, fanin, x_data, min_level=0)
    assert cone == [2]


def test_feature_generation_modified_bench():
    from mgvae_tpu.utils.circuit import feature_generation

    g2i = {"INPUT": 0, "AND": 1, "NOT": 2, "OR": 3, "NAND": 4}
    lines = [
        "INPUT(a)", "INPUT(b)", "INPUT(MEMORY)",  # name contains OR/AND-free trap
        "OUTPUT(z)",
        "0: e = AND(a, b)",
        "1: f = OR(e, MEMORY)",
        "2: z = NOT(f)",
    ]
    x_data, edges, level_list, fanin, fanout = feature_generation(lines, g2i)
    names = [r[0] for r in x_data]
    assert names == ["a", "b", "MEMORY", "e", "f", "z"]
    assert [r[1] for r in x_data] == [0, 0, 0, 1, 3, 2]
    assert [r[2] for r in x_data] == [0, 0, 0, 1, 2, 3]
    assert sorted(edges) == [[0, 3], [1, 3], [2, 4], [3, 4], [4, 5]]
    assert level_list[0] == [0, 1, 2] and level_list[3] == [5]
    assert fanin[4] == [3, 2] or fanin[4] == [2, 3]
    assert fanout[3] == [4]


def test_dfs_reconvergent_circuit_diamond():
    from mgvae_tpu.utils.circuit import dfs_reconvergent_circuit

    # diamond a -> {b, c} -> d, plus a stray high-level node e above d
    x_data = [["a", 0, 0], ["b", 1, 1], ["c", 1, 1], ["d", 1, 2], ["e", 1, 3]]
    fanout = [[1, 2], [3], [3, 4], [4], []]
    cone = dfs_reconvergent_circuit(0, 3, fanout, x_data)
    assert cone == [1, 2, 3]  # both branches + dst; src and e excluded
    assert dfs_reconvergent_circuit(1, 2, fanout, x_data) == []  # unreachable


def test_check_difference(capsys):
    from types import SimpleNamespace

    from mgvae_tpu.utils.circuit import check_difference

    g1 = SimpleNamespace(c1=np.array([0.5, 0.8]), gt=np.array([0.5, 0.6]),
                         rec=np.array([0.0, 1.0]))
    g2 = SimpleNamespace(c1=np.array([0.1]), gt=np.array([0.2]),
                         rec=np.array([0.0]))
    overall, rc, nrc = check_difference([g1, g2])
    np.testing.assert_allclose(overall, (0.0 + 0.2 + 0.1) / 3)
    np.testing.assert_allclose(rc, 0.2)
    np.testing.assert_allclose(nrc, 0.05)
    assert "reconvergent" in capsys.readouterr().out
