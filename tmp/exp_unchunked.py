"""Does bs64 fit the VMEM kernel UNCHUNKED with a raised vmem limit?"""
import sys, time
import numpy as np
CHAIN_K = 16
BATCH = 64

def log(*a): print(*a, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    import mgvae_tpu.ops.pallas.level_kernel as K
    K.kernel_fits = lambda n, ep, np_, d: n <= 24576 and ep <= 2048 and np_ <= 1024 and d <= 128
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    n = int(batch["n_nodes"])
    log(f"N={batch['gate'].shape[0]} Ep={batch['lv_edge_src'].shape[1]} Np={batch['lv_nodes'].shape[1]}")

    f0 = jax.jit(lambda x: x.sum()); float(f0(jnp.zeros(8)))
    rt = min((lambda t0: (float(f0(jnp.zeros(8))), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(3))

    _, hf_x, _ = jax.jit(lambda p, b: forward(p, b, cfg))(params, batch)
    _, hf_p, _ = jax.jit(lambda p, b: forward(p, b, cfg, use_pallas=True))(params, batch)
    log(f"parity: {float(jnp.abs(hf_x[:n]-hf_p[:n]).max()):.2e}")

    def chained(params, batch):
        def body(i, c):
            p2 = {**params, "hs_linear": {"w": params["hs_linear"]["w"],
                                          "b": params["hs_linear"]["b"] + c * 1e-30}}
            hs, hf, _ = forward(p2, batch, cfg, use_pallas=True)
            return hf[0, 0]
        return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)
    f = jax.jit(chained); float(f(params, batch))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); float(f(params, batch)); best = min(best, time.perf_counter()-t0)
    per = (best - rt) / CHAIN_K
    log(f"UNCHUNKED bs64 fwd: {per*1e3:.2f} ms ({BATCH/per:.0f} g/s)   [chunked C=3: ~3.2 ms]")

    tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], 64))
    def train_loss(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))
    def grad_chain(params):
        def body(i, c):
            g = jax.grad(train_loss)({**params, "hs_linear": {
                "w": params["hs_linear"]["w"], "b": params["hs_linear"]["b"] + c * 1e-30}})
            return g["hs_linear"]["b"][0]
        return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)
    fg = jax.jit(grad_chain); float(fg(params))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(fg(params)); best = min(best, time.perf_counter()-t0)
    per = (best - rt) / CHAIN_K
    log(f"UNCHUNKED bs64 grad: {per*1e3:.2f} ms ({BATCH/per:.0f} g/s)   [chunked C=3: ~8.2 ms]")

if __name__ == "__main__":
    main()
