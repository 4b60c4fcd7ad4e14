"""Per-grid-step overhead probe: pad L with extra (no-op) levels and measure
the marginal cost per empty step. If it's multiple us, merging levels or
packing the per-level index tables into fewer blocks is the next perf lever.
"""
import sys
import time

import numpy as np

CHAIN_K = 16
BATCH = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import collate, natural_dims
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)

    f0 = jax.jit(lambda x: x.sum())
    float(f0(jnp.zeros(8)))
    rt = min(
        (lambda t0: (float(f0(jnp.zeros(8))), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    log(f"roundtrip {rt*1e3:.1f} ms")

    def timed(fn, *args):
        fj = jax.jit(fn)
        float(fj(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fj(*args))
            best = min(best, time.perf_counter() - t0)
        return (best - rt) / CHAIN_K

    dims0 = natural_dims(graphs)
    log(f"natural dims: {dims0}")
    results = {}
    for mult in (1, 2, 3):
        dims = dict(dims0)
        dims["L"] = dims0["L"] * mult
        batch = jax.tree.map(jnp.asarray, collate(graphs, dims=dims))

        def fwd_chain(params, batch):
            def body(i, c):
                p2 = {**params, "hs_linear": {"w": params["hs_linear"]["w"],
                                              "b": params["hs_linear"]["b"] + c * 1e-30}}
                hs, hf, _ = forward(p2, batch, cfg, use_pallas=True)
                return hf[0, 0]
            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

        t = timed(fwd_chain, params, batch)
        results[mult] = t
        log(f"L={dims['L']:4d}: fwd {t*1e3:6.2f} ms")
    base_L = dims0["L"]
    per_step = (results[3] - results[1]) / (2 * base_L)
    log(f"marginal cost per EMPTY grid step: {per_step*1e6:.2f} us")
    log(f"implied fixed overhead for {base_L} real steps: {per_step*base_L*1e3:.2f} ms "
        f"of {results[1]*1e3:.2f} ms total")


if __name__ == "__main__":
    main()
