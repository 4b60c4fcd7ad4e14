"""TPU experiment: chunked fused-kernel vs XLA scan vs HBM variant at bs64.

Measures (chained fori_loop protocol, sync latency subtracted):
  * encode fwd: XLA scan | chunked pallas | HBM pallas
  * train fwd+bwd: XLA autodiff | chunked pallas VJP
and checks parity of the chunked kernel against the XLA path on device.
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

    from mgvae_tpu.data.batching import collate, collate_fit
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    graphs = [
        random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64)
        for _ in range(BATCH)
    ]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)

    b_plain = jax.tree.map(jnp.asarray, collate(graphs))
    b_chunk = jax.tree.map(jnp.asarray, collate_fit(graphs))
    C = b_chunk["lv_nodes"].shape[0] if b_chunk["lv_nodes"].ndim == 3 else 1
    log(
        f"plain dims: N={b_plain['gate'].shape[0]} L={b_plain['lv_nodes'].shape[0]} "
        f"Np={b_plain['lv_nodes'].shape[1]} Ep={b_plain['lv_edge_src'].shape[1]}"
    )
    log(
        f"chunked C={C}: N_sub={b_chunk['gate'].shape[0] // C} "
        f"L={b_chunk['lv_nodes'].shape[-2]} Np={b_chunk['lv_nodes'].shape[-1]} "
        f"Ep={b_chunk['lv_edge_src'].shape[-1]}"
    )

    # sync latency
    f0 = jax.jit(lambda x: x.sum())
    x0 = jnp.zeros(8)
    float(f0(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f0(x0))
        ts.append(time.perf_counter() - t0)
    rt = min(ts)
    log(f"roundtrip {rt * 1e3:.1f} ms")

    # parity: chunked pallas vs XLA on the chunked batch
    _, hf_x, _ = jax.jit(lambda p, b: forward(p, b, cfg))(params, b_chunk)
    _, hf_p, _ = jax.jit(lambda p, b: forward(p, b, cfg, use_pallas=True))(params, b_chunk)
    inv = np.asarray(b_chunk["node_inv"])[: int(b_chunk["n_nodes"])]
    d = float(jnp.abs(hf_x[inv] - hf_p[inv]).max())
    log(f"chunked pallas-vs-xla |hf| diff: {d:.2e}")
    assert d < 1e-3

    def timed(f, *args):
        fj = jax.jit(f)
        float(fj(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fj(*args))
            best = min(best, time.perf_counter() - t0)
        return max(best - rt, 1e-9) / CHAIN_K

    def chained_fwd(batch, use_pallas):
        def run(params, batch):
            def body(i, c):
                p2 = {**params, "hs_linear": {"w": params["hs_linear"]["w"],
                                              "b": params["hs_linear"]["b"] + c * 1e-30}}
                hs, hf, _ = forward(p2, batch, cfg, use_pallas=use_pallas)
                return hf[0, 0]
            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)
        return run

    def chained_grad(batch, use_pallas):
        tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], 64))

        def train_loss(p):
            hs, hf, _ = forward(p, batch, cfg, use_pallas=use_pallas)
            m = batch["node_valid"][:, None]
            return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))

        def run(params):
            def body(i, c):
                g = jax.grad(train_loss)({**params, "hs_linear": {
                    "w": params["hs_linear"]["w"],
                    "b": params["hs_linear"]["b"] + c * 1e-30}})
                return g["hs_linear"]["b"][0]
            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)
        return run

    t = timed(chained_fwd(b_plain, False), params, b_plain)
    log(f"fwd  XLA(plain):       {t * 1e3:7.2f} ms -> {BATCH / t:8.0f} g/s")
    t = timed(chained_fwd(b_plain, True), params, b_plain)  # HBM variant
    log(f"fwd  HBM pallas:       {t * 1e3:7.2f} ms -> {BATCH / t:8.0f} g/s")
    t = timed(chained_fwd(b_chunk, True), params, b_chunk)
    log(f"fwd  chunked pallas:   {t * 1e3:7.2f} ms -> {BATCH / t:8.0f} g/s")
    t = timed(chained_fwd(b_chunk, False), params, b_chunk)
    log(f"fwd  XLA(chunked):     {t * 1e3:7.2f} ms -> {BATCH / t:8.0f} g/s")

    t = timed(chained_grad(b_plain, False), params)
    log(f"grad XLA(plain):       {t * 1e3:7.2f} ms -> {BATCH / t:8.0f} g/s")
    t = timed(chained_grad(b_chunk, True), params)
    log(f"grad chunked pallas:   {t * 1e3:7.2f} ms -> {BATCH / t:8.0f} g/s")


if __name__ == "__main__":
    main()
