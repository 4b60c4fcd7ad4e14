"""bf16 throughput mode vs f32 on the real chip: bs64 chunked kernel."""
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

    from mgvae_tpu.data.batching import collate_fit
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    params, _ = init_params(jax.random.PRNGKey(0), DGConfig(modality="mig", dim_hidden=64, layernorm=True))
    batch = jax.tree.map(jnp.asarray, collate_fit(graphs))
    n = int(batch["n_nodes"])

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

    for dt in ("float32", "bfloat16"):
        cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True, compute_dtype=dt)

        def fwd_chain(params, batch, cfg=cfg):
            def body(i, c):
                p2 = {**params, "hs_linear": {"w": params["hs_linear"]["w"],
                                              "b": params["hs_linear"]["b"] + c * 1e-30}}
                hs, hf, _ = forward(p2, batch, cfg, use_pallas=True)
                return hf[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

        tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], 64))

        def train_loss(p, cfg=cfg):
            hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
            m = batch["node_valid"][:, None]
            return jnp.sum(jnp.where(m, (hf.astype(jnp.float32) - tgt) ** 2, 0.0))

        def grad_chain(params, cfg=cfg):
            def body(i, c):
                g = jax.grad(train_loss)({**params, "hs_linear": {
                    "w": params["hs_linear"]["w"],
                    "b": params["hs_linear"]["b"] + c * 1e-30}})
                return g["hs_linear"]["b"][0]
            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

        tf = timed(fwd_chain, params, batch)
        tg = timed(grad_chain, params)
        log(f"{dt:9s} | fwd {tf*1e3:6.2f} ms ({BATCH/tf:7.0f} g/s) | grad {tg*1e3:6.2f} ms ({BATCH/tg:7.0f} g/s)")

    # accuracy of bf16 vs f32 forward
    cfg16 = DGConfig(modality="mig", dim_hidden=64, layernorm=True, compute_dtype="bfloat16")
    cfg32 = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    _, hf32, _ = jax.jit(lambda p, b: forward(p, b, cfg32, use_pallas=True))(params, batch)
    _, hf16, _ = jax.jit(lambda p, b: forward(p, b, cfg16, use_pallas=True))(params, batch)
    d = float(jnp.abs(hf32[:n].astype(jnp.float32) - hf16[:n].astype(jnp.float32)).max())
    m = float(jnp.abs(hf32[:n]).max())
    log(f"bf16 vs f32 |hf| max diff: {d:.3e} (scale {m:.3f})")


if __name__ == "__main__":
    main()
