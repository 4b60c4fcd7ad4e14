"""bs16 aig encode regression hunt (r1: 36.9k g/s, now ~26.8k)."""
import sys
import time

import numpy as np

CHAIN_K = 32
BATCH = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "aig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(64)]
    cfg = DGConfig(modality="aig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs[:BATCH]))
    log(f"dims: N={batch['gate'].shape[0]} L={batch['lv_nodes'].shape[0]} "
        f"Np={batch['lv_nodes'].shape[1]} Ep={batch['lv_edge_src'].shape[1]}")

    f0 = jax.jit(lambda x: x.sum())
    float(f0(jnp.zeros(8)))
    rt = min(
        (lambda t0: (float(f0(jnp.zeros(8))), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    log(f"roundtrip {rt*1e3:.1f} ms")

    def chained(params, batch):
        def body(i, c):
            p2 = {**params, "hs_linear": {"w": params["hs_linear"]["w"],
                                          "b": params["hs_linear"]["b"] + c * 1e-30}}
            hs, hf, _ = forward(p2, batch, cfg, use_pallas=True)
            return hf[0, 0]
        return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

    f = jax.jit(chained)
    float(f(params, batch))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(params, batch))
        times.append(time.perf_counter() - t0)
    per = (min(times) - rt) / CHAIN_K
    log(f"bs16 aig encode: {per*1e3:.3f} ms -> {BATCH/per:.0f} g/s")


if __name__ == "__main__":
    main()
