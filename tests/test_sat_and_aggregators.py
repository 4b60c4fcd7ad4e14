"""SAT utilities + alternative aggregator ops."""
import numpy as np
import jax
import jax.numpy as jnp

from mgvae_tpu.utils.sat import (
    aig_to_cnf,
    cnf_to_circuit,
    gen_iclause_pair,
    solve_sat,
    solve_sat_iteratively,
)


def test_solve_sat_basic():
    # (x1 or x2) and (!x1 or x2) and (!x2 or x3)
    sat, model = solve_sat(3, [[1, 2], [-1, 2], [-2, 3]])
    assert sat
    assert model[1] == 1 or model[0] == 1
    # verify model satisfies
    for c in [[1, 2], [-1, 2], [-2, 3]]:
        assert any((l > 0) == bool(model[abs(l) - 1]) for l in c)


def test_solve_sat_unsat():
    sat, model = solve_sat(1, [[1], [-1]])
    assert not sat and model is None


def test_gen_iclause_pair():
    rng = np.random.default_rng(0)
    n, clauses, unsat_c, sat_c = gen_iclause_pair(6, rng=rng)
    assert solve_sat(n, clauses + [sat_c])[0] is True
    assert solve_sat(n, clauses + [unsat_c])[0] is False


def test_aig_cnf_roundtrip_semantics():
    """AND(a, NOT b) asserted true -> a=1, b=0."""
    gate = np.array([0, 0, 2, 1])  # a, b, nb=NOT(b), o=AND(a, nb)
    edges = np.array([[1, 2], [0, 3], [2, 3]]).T
    cnf, n_vars = aig_to_cnf(gate, edges, po_idx=3)
    sat, model = solve_sat(n_vars, cnf)
    assert sat
    assert model[0] == 1 and model[1] == 0


def test_cnf_to_circuit_simulates_cnf():
    from mgvae_tpu.data.synthetic import simulate

    clauses = [[1, -2], [2, 3], [-1, -3]]
    g = cnf_to_circuit(clauses, 3)
    rng = np.random.default_rng(1)
    sig = simulate(g.gate, g.edge_index, rng, "aig")
    po = g.POs[0]
    # check po bit equals CNF evaluation for each of 64 simulated patterns
    for bit in range(16):
        asg = [(int(sig[v]) >> bit) & 1 for v in range(3)]
        cnf_val = all(any((l > 0) == bool(asg[abs(l) - 1]) for l in c) for c in clauses)
        assert ((int(sig[po]) >> bit) & 1) == int(cnf_val)


def test_solve_sat_iteratively_with_scores():
    clauses = [[1, 2], [-1, 2], [-2, 3]]
    sat, model = solve_sat_iteratively(clauses, 3, var_scores=[0.9, 0.9, 0.9])
    assert sat
    for c in clauses:
        assert any((l > 0) == bool(model[abs(l) - 1]) for l in c)


def test_aggregators_shapes_and_masking():
    from mgvae_tpu.ops import aggregators as agg

    key = jax.random.PRNGKey(0)
    n, e, din, dout = 10, 20, 8, 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    valid = jnp.asarray(np.r_[np.ones(15, bool), np.zeros(5, bool)])

    for init, apply in [
        (agg.mlp_aggr_init, agg.mlp_aggr_apply),
        (agg.attn_mlp_init, agg.attn_mlp_apply),
        (agg.agnn_conv_init, agg.agnn_conv_apply),
    ]:
        p = init(key, din, dout)
        out = apply(p, x, src, dst, valid, n)
        assert out.shape == (n, dout)
        assert np.isfinite(np.asarray(out)).all()

    p = agg.gated_sum_conv_init(key, din)
    assert agg.gated_sum_conv_apply(p, x, src, dst, valid, n).shape == (n, din)

    p = agg.gcn_encoder_init(key, din, dout)
    out = agg.gcn_encoder_apply(p, x, src, dst, valid, n)
    assert out.shape == (n, dout) and np.isfinite(np.asarray(out)).all()

    z = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    d = agg.inner_product_decode(z, src, dst)
    assert d.shape == (e,) and (np.asarray(d) >= 0).all() and (np.asarray(d) <= 1).all()
    assert agg.inner_product_decode_all(z).shape == (n, n)
