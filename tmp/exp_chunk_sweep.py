"""Sweep the chunk count C for the (chunk, level) fused kernel at bs64:
total one-hot gather work scales ~ N_total * Ep_sub / C-ish (gathers stay
within-chunk), but per-grid-step overhead grows with C*L. Find the knee.
"""
import sys
import time

import numpy as np

CHAIN_K = 16
BATCH = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import collate_chunked
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)

    f0 = jax.jit(lambda x: x.sum())
    float(f0(jnp.zeros(8)))
    ts = [
        (lambda t0: (float(f0(jnp.zeros(8))), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    ]
    rt = min(ts)
    log(f"roundtrip {rt*1e3:.1f} ms")

    def timed(f, *args):
        fj = jax.jit(f)
        float(fj(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fj(*args))
            best = min(best, time.perf_counter() - t0)
        return max(best - rt, 1e-9) / CHAIN_K

    for C in (2, 3, 4, 6, 8, 12, 16):
        batch = jax.tree.map(jnp.asarray, collate_chunked(graphs, C))
        n_sub = batch["gate"].shape[0] // C
        ep = batch["lv_edge_src"].shape[-1]
        np_ = batch["lv_nodes"].shape[-1]
        if n_sub > 8192 or ep > 512 or np_ > 512:
            log(f"C={C}: dims N_sub={n_sub} Ep={ep} Np={np_} exceed kernel_fits; skip")
            continue

        def fwd_chain(params, batch):
            def body(i, c):
                p2 = {**params, "hs_linear": {"w": params["hs_linear"]["w"],
                                              "b": params["hs_linear"]["b"] + c * 1e-30}}
                hs, hf, _ = forward(p2, batch, cfg, use_pallas=True)
                return hf[0, 0]
            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

        tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], 64))

        def train_loss(p, batch=batch, tgt=tgt):
            hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
            m = batch["node_valid"][:, None]
            return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))

        def grad_chain(params, batch):
            def body(i, c):
                g = jax.grad(train_loss)({**params, "hs_linear": {
                    "w": params["hs_linear"]["w"],
                    "b": params["hs_linear"]["b"] + c * 1e-30}})
                return g["hs_linear"]["b"][0]
            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

        tf = timed(fwd_chain, params, batch)
        tg = timed(grad_chain, params, batch)
        log(f"C={C:2d} N_sub={n_sub:5d} Ep={ep:4d} Np={np_:4d} | "
            f"fwd {tf*1e3:6.2f} ms ({BATCH/tf:7.0f} g/s) | "
            f"grad {tg*1e3:6.2f} ms ({BATCH/tg:7.0f} g/s)")


if __name__ == "__main__":
    main()
