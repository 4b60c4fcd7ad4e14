"""HBM-variant training (giant single-batch, C=1) on the real chip."""
import sys, time
import numpy as np
CHAIN_K = 8
BATCH = 64

def log(*a): print(*a, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))  # ONE batch, N=20480
    n = int(batch["n_nodes"])
    log(f"N={batch['gate'].shape[0]} Ep={batch['lv_edge_src'].shape[1]} Np={batch['lv_nodes'].shape[1]}")

    f0 = jax.jit(lambda x: x.sum()); float(f0(jnp.zeros(8)))
    rt = min((lambda t0: (float(f0(jnp.zeros(8))), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(3))

    # parity fwd
    _, hf_x, _ = jax.jit(lambda p, b: forward(p, b, cfg))(params, batch)
    _, hf_h, _ = jax.jit(lambda p, b: forward(p, b, cfg, use_pallas=True))(params, batch)
    log(f"HBM fwd parity |hf| diff: {float(jnp.abs(hf_x[:n]-hf_h[:n]).max()):.2e}")

    tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], 64))
    def train_loss(p, use_pallas):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=use_pallas)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))

    # grad parity
    import jax.flatten_util
    g_x = jax.jit(lambda p: jax.grad(train_loss, argnums=0)(p, False))(params)
    g_h = jax.jit(lambda p: jax.grad(train_loss, argnums=0)(p, True))(params)
    a, _ = jax.flatten_util.ravel_pytree(g_x); b, _ = jax.flatten_util.ravel_pytree(g_h)
    scale = float(jnp.abs(a).max())
    log(f"HBM grad parity rel: {float(jnp.abs(a-b).max())/scale:.2e}")

    def chained_grad(use_pallas):
        def run(params):
            def body(i, c):
                g = jax.grad(lambda p: train_loss(p, use_pallas))({**params, "hs_linear": {
                    "w": params["hs_linear"]["w"], "b": params["hs_linear"]["b"] + c * 1e-30}})
                return g["hs_linear"]["b"][0]
            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)
        return run

    for name, up in (("XLA", False), ("HBM kernel", True)):
        f = jax.jit(chained_grad(up)); float(f(params))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(f(params)); best = min(best, time.perf_counter()-t0)
        per = (best - rt) / CHAIN_K
        log(f"grad {name:11s}: {per*1e3:6.2f} ms ({BATCH/per:6.0f} g/s)")

if __name__ == "__main__":
    main()
