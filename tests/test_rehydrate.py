"""Thin-wire device rehydration (data/rehydrate): the derived index tables
must be BIT-IDENTICAL to data/batching.collate's host tables — the fused
Pallas kernel ingests them raw — and the train step must produce the same
losses/grads from a thin batch as from the full one."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgvae_tpu.data import batching as B
from mgvae_tpu.data.rehydrate import DERIVED_KEYS, derive_tables, wire_drop
from mgvae_tpu.data.synthetic import random_circuit


def _graphs(rng, mod, k=6):
    return [
        random_circuit(rng, mod, num_inputs=int(rng.integers(5, 12)),
                       num_gates=int(rng.integers(40, 300)), num_tt_pairs=32)
        for _ in range(k)
    ]


def _assert_tables_equal(der, full):
    for k in DERIVED_KEYS:
        if k not in full:  # split groups carry no tt keys
            assert k not in der
            continue
        a, b = np.asarray(der[k]), np.asarray(full[k])
        assert a.dtype == b.dtype, f"{k}: dtype {a.dtype} != {b.dtype}"
        assert np.array_equal(a, b), (
            f"{k}: {np.count_nonzero(a != b)} mismatching elements"
        )


@pytest.mark.parametrize("mod", ["aig", "mig", "xag", "xmg"])
def test_derive_tables_bitexact(mod):
    rng = np.random.default_rng(hash(mod) % 2**32)
    full = B.collate(_graphs(rng, mod))
    thin = wire_drop(full)
    assert "lv_nodes" not in thin and "fa_src" not in thin and "tdims" in thin
    der = jax.jit(derive_tables)(jax.tree.map(np.asarray, thin))
    _assert_tables_equal(der, full)


def test_derive_tables_dims_overrides_and_mp():
    """Padded dims larger than natural (fixed-dims running max) and mp
    rounding must not perturb the rebuild."""
    rng = np.random.default_rng(7)
    gs = _graphs(rng, "mig")
    nat = B.natural_dims(gs)
    dims = {"N": nat["N"] + 256, "E": nat["E"] + 128, "P": nat["P"] + 64,
            "L": nat["L"] + 8, "NP": nat["NP"] + 16, "EP": nat["EP"] + 32,
            "EBF": nat["EBF"] + 64, "EBR": nat["EBR"] + 64}
    for kw in ({"dims": dims}, {"mp": 2}):
        full = B.collate(gs, **kw)
        der = jax.jit(derive_tables)(jax.tree.map(np.asarray, wire_drop(full)))
        _assert_tables_equal(der, full)


def test_derive_tables_single_graph_and_no_tt():
    rng = np.random.default_rng(11)
    g = random_circuit(rng, "aig", num_inputs=6, num_gates=50, num_tt_pairs=0)
    full = B.collate([g])
    der = jax.jit(derive_tables)(jax.tree.map(np.asarray, wire_drop(full)))
    _assert_tables_equal(der, full)


def test_wire_drop_thins_split_groups():
    rng = np.random.default_rng(3)
    gs = _graphs(rng, "aig", k=8)
    split = B.collate_split(gs, 2)
    thin = wire_drop(split)
    assert thin is not split
    for gb, gb_full in zip(thin["groups"], split["groups"]):
        assert "lv_nodes" not in gb and "tdims" in gb
        der = jax.jit(derive_tables)(jax.tree.map(np.asarray, gb))
        _assert_tables_equal(der, gb_full)


@pytest.mark.parametrize("mod,C", [("aig", 2), ("mig", 3)])
def test_derive_tables_chunked_bitexact(mod, C):
    """Round-5: chunked batches ([C, L] level tables) ride the thin wire —
    the vmapped per-chunk derive plus collate_chunked's global offsets must
    be bit-identical to the host tables."""
    rng = np.random.default_rng(11 + C)
    gs = _graphs(rng, mod, k=3 * C)
    full = B.collate_chunked(gs, C)
    thin = wire_drop(full)
    assert thin is not full and "tdims" in thin and "lv_nodes" not in thin
    der = jax.jit(derive_tables)(jax.tree.map(np.asarray, thin))
    _assert_tables_equal(der, full)
    # a chunked batch missing the round-5 count keys (stale cache) keeps
    # the full wire
    legacy = {k: v for k, v in full.items() if k != "chunk_ecounts"}
    assert wire_drop(legacy) is legacy


def test_thin_chunked_step_matches_full():
    """Loss/grad equivalence of the thin chunked wire through the real
    train step."""
    import jax.flatten_util

    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import loss_and_metrics

    rng = np.random.default_rng(19)
    gs = _graphs(rng, "mig", k=6)
    full = B.collate_chunked(gs, 2)
    thin = wire_drop(full)
    cfg = DGConfig(modality="mig", dim_hidden=32, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])

    def run(b):
        b = jax.tree.map(jnp.asarray, b)
        (loss, (_, m)), g = jax.value_and_grad(
            loss_and_metrics, has_aux=True
        )(params, state, b, jax.random.PRNGKey(1), weights, cfg, True)
        return loss, m, g

    l_f, m_f, g_f = jax.jit(run)(full)
    l_t, m_t, g_t = jax.jit(run)(thin)
    assert float(l_f) == float(l_t)
    a, _ = jax.flatten_util.ravel_pytree(g_f)
    b, _ = jax.flatten_util.ravel_pytree(g_t)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_thin_split_step_matches_full():
    """Split batch with thinned groups bit-matches the full split batch
    through one train step (rehydrate derives groups before the split
    globals are concatenated)."""
    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import SPLIT_WIRE_DERIVABLE, make_optimizer, make_train_step

    rng = np.random.default_rng(23)
    full = jax.tree.map(np.asarray, B.collate_split(_graphs(rng, "mig", k=8), 2))
    thin = wire_drop({k: v for k, v in full.items() if k not in SPLIT_WIRE_DERIVABLE})
    cfg = DGConfig(dim_hidden=32, s_rounds=2, t_rounds=2)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    train_step, _ = make_train_step(cfg, opt, donate=False)
    key = jax.random.PRNGKey(1)
    w = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    outs = [train_step(params, state, opt_state, b, key, w) for b in (full, thin)]
    for pf, pt in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(pt))


def test_wire_drop_bytes_shrink():
    """The thin wire must actually be thinner (that is its whole point)."""
    from mgvae_tpu.utils import transfer as T

    rng = np.random.default_rng(5)
    full = B.collate(_graphs(rng, "mig"))
    _, full_bytes = T._plan([full], 0)
    _, thin_bytes = T._plan([wire_drop(full)], 0)
    assert thin_bytes < 0.5 * full_bytes, (full_bytes, thin_bytes)


def test_thin_step_matches_full_step():
    """One optimizer step from a thin batch bit-matches the full batch
    (identical tables -> identical program inputs)."""
    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_optimizer, make_train_step

    rng = np.random.default_rng(13)
    full = jax.tree.map(np.asarray, B.collate(_graphs(rng, "mig")))
    thin = wire_drop(full)
    assert thin is not full
    cfg = DGConfig(dim_hidden=32, s_rounds=2, t_rounds=2)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    train_step, eval_step = make_train_step(cfg, opt, donate=False)
    key = jax.random.PRNGKey(1)
    w = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    outs = [train_step(params, state, opt_state, b, key, w) for b in (full, thin)]
    for pf, pt in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(pt))
    mf = eval_step(params, state, full, key, w)
    mt = eval_step(params, state, thin, key, w)
    for k in mf:
        np.testing.assert_array_equal(np.asarray(mf[k]), np.asarray(mt[k]))


def test_trainer_thin_wire_end_to_end():
    """Trainer default (thin_wire=True) trains and matches a full-wire run
    step for step on the dp mesh path."""
    from mgvae_tpu.train.trainer import Trainer
    from mgvae_tpu.models.dg_ae import DGConfig

    rng = np.random.default_rng(17)
    ds = _graphs(rng, "aig", k=16)
    cfg = DGConfig(dim_hidden=32, s_rounds=2, t_rounds=2)

    def run(thin):
        tr = Trainer(None, cfg, batch_size=4, distributed=True, num_devices=2,
                     seed=0, thin_wire=thin, steps_per_call=2)
        tr.train(2, ds, ds[:8])
        return jax.tree.leaves(tr.params)

    a, b = run(True), run(False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
