"""Headline benchmark: AIG+MIG encoding throughput (graphs/sec/chip) vs the
CPU PyTorch reference, plus loss parity (BASELINE.md targets).

Measurement protocol (designed for the tunneled-TPU environment where a
host<->device sync costs ~26 ms and plain dispatch timing under-measures):
K forward passes are CHAINED inside one jitted fori_loop (each iteration's
params perturbed by the previous result so XLA cannot hoist the body), and
the wall clock covers exactly one synchronized call; the single round-trip
is subtracted via a measured no-op baseline.

Baseline: the clean-room torch implementation of the reference semantics
(benchmarks/torch_reference.py) running the reference's own per-level python
``subgraph`` loop on CPU — the same work per graph.

Prints ONE json line:
  {"metric": "graphs_per_sec_encode_aig_mig", "value": ..., "unit":
   "graphs/s", "vs_baseline": ...}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_CIRCUITS = 64
BATCH = 16  # pallas-kernel class; the fused level kernel beats XLA-at-64
NUM_INPUTS = 16
NUM_GATES = 264
CHAIN_K = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_dataset(modality, seed, n=N_CIRCUITS):
    from mgvae_tpu.data.synthetic import random_circuit

    rng = np.random.default_rng(seed)
    return [
        random_circuit(rng, modality, num_inputs=NUM_INPUTS, num_gates=NUM_GATES, num_tt_pairs=64)
        for _ in range(n)
    ]


def measure_roundtrip():
    """One-sync no-op latency (host<->device round trip)."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(8)
    f = jax.jit(lambda x: x.sum())
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_modality(modality, seed, roundtrip):
    import jax
    import jax.numpy as jnp
    import torch

    from benchmarks.torch_reference import ReferenceModel
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.models.dg_ae import DGConfig, forward
    from mgvae_tpu.utils.torch_compat import params_from_torch_state

    torch.manual_seed(seed)
    graphs = make_dataset(modality, seed)
    ref = ReferenceModel(modality, dim_hidden=64, s_rounds=4, t_rounds=4, layernorm=True)
    ref.eval()
    cfg = DGConfig(modality=modality, dim_hidden=64, layernorm=True)
    params, state = params_from_torch_state(ref.state_dict(), cfg)

    # ---- torch CPU baseline (reference semantics incl. subgraph loop) ----
    tg = [
        (
            torch.from_numpy(g.gate).long(),
            torch.from_numpy(g.edge_index),
            torch.from_numpy(g.forward_level).long(),
        )
        for g in graphs
    ]
    with torch.no_grad():
        ref(*tg[0])  # warmup
        t0 = time.perf_counter()
        for gate, ei, lvl in tg:
            ref(gate, ei, lvl)
        torch_time = time.perf_counter() - t0
    torch_gps = len(graphs) / torch_time

    # ---- ours: K chained forwards in one jitted call ---------------------
    batch = jax.tree.map(jnp.asarray, collate(graphs[:BATCH]))
    use_pallas = False
    if jax.default_backend() == "tpu":
        from mgvae_tpu.ops.pallas.level_kernel import kernel_fits

        use_pallas = kernel_fits(
            batch["gate"].shape[0], batch["lv_edge_src"].shape[1],
            batch["lv_nodes"].shape[1], cfg.dim_hidden,
        )
        if use_pallas:  # cross-check fused kernel vs XLA scan on-device
            # at HIGHEST matmul precision the two paths agree to ~1e-7; the
            # residual ~1e-3 at default precision is purely the MXU's single
            # bf16-pass fp32 multiplies (same on both paths) — root cause
            # pinned by tmp/exp_numerics.py, see benchmarks/README.md
            import dataclasses as _dc

            cfg_hi = _dc.replace(cfg, matmul_precision="highest")
            _, hf_x, _ = jax.jit(lambda p, b: forward(p, b, cfg_hi))(params, batch)
            _, hf_p, _ = jax.jit(lambda p, b: forward(p, b, cfg_hi, use_pallas=True))(params, batch)
            n = int(batch["n_nodes"])
            dmax = float(jnp.abs(hf_x[:n] - hf_p[:n]).max())
            log(f"[{modality}] pallas-vs-xla max |hf| diff (highest precision): {dmax:.2e}")
            assert dmax < 1e-5

    def chained(params, batch):
        def body(i, c):
            p2 = {
                **params,
                "hs_linear": {
                    "w": params["hs_linear"]["w"],
                    "b": params["hs_linear"]["b"] + c * 1e-30,
                },
            }
            hs, hf, _ = forward(p2, batch, cfg, use_pallas=use_pallas)
            return hf[0, 0]

        return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

    f = jax.jit(chained)
    float(f(params, batch))  # compile + full execution
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(params, batch))
        times.append(time.perf_counter() - t0)
    per_fwd = max(min(times) - roundtrip, 1e-9) / CHAIN_K
    ours_gps = BATCH / per_fwd

    # ---- loss parity on one graph ----------------------------------------
    from mgvae_tpu.train import losses

    g = graphs[0]
    batch1 = jax.tree.map(jnp.asarray, collate([g]))
    hs_j, hf_j, _ = forward(params, batch1, cfg)
    n, e = g.num_nodes, g.num_edges
    rng = np.random.default_rng(0)
    neg = rng.integers(0, n, size=(2, e))
    neg[1] = (neg[0] + 1 + neg[1] % (n - 1)) % n
    with torch.no_grad():
        hs_t, hf_t = ref(*tg[0])
        from benchmarks.torch_reference import run_losses

        rc_t, pl_t, fl_t, _, _ = run_losses(
            ref, hs_t, hf_t, torch.from_numpy(g.edge_index), torch.from_numpy(neg),
            torch.from_numpy(g.prob).unsqueeze(1), torch.from_numpy(g.tt_pair_index),
            torch.from_numpy(g.tt_dis),
        )
    E_pad = batch1["edge_src"].shape[0]
    inv = np.asarray(batch1["node_inv"])  # map to level-major renumbering
    neg_src = jnp.asarray(np.pad(inv[neg[0]], (0, E_pad - e)).astype(np.int32))
    neg_dst = jnp.asarray(np.pad(inv[neg[1]], (0, E_pad - e), constant_values=1).astype(np.int32))
    rc_j, _ = losses.recon_loss(params, hs_j, batch1, None, neg_edges=(neg_src, neg_dst))
    pl_j, _ = losses.prob_loss(params, state, hf_j, batch1, train=False, rng=None)
    fl_j = losses.func_loss(hf_j, batch1)
    parity = {
        "recon": abs(float(rc_j) - float(rc_t)) / max(abs(float(rc_t)), 1e-9),
        "prob": abs(float(pl_j) - float(pl_t)) / max(abs(float(pl_t)), 1e-9),
        "func": abs(float(fl_j) - float(fl_t)) / max(abs(float(fl_t)), 1e-9),
    }
    log(
        f"[{modality}] ours {ours_gps:.1f} g/s ({per_fwd * 1e3:.2f} ms / {BATCH} graphs) | "
        f"torch-cpu {torch_gps:.1f} g/s | speedup {ours_gps / torch_gps:.1f}x | loss rel-err "
        f"recon {parity['recon']:.2e} prob {parity['prob']:.2e} func {parity['func']:.2e}"
    )
    assert max(parity.values()) < 0.01, f"loss parity violated: {parity}"

    # ---- secondary: full gradient-step throughput (fwd+bwd) ---------------
    tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], cfg.dim_hidden))

    def train_loss(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=use_pallas)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))

    def chained_grad(p):
        def body(i, c):
            g = jax.grad(train_loss)(
                {**p, "hs_linear": {"w": p["hs_linear"]["w"], "b": p["hs_linear"]["b"] + c * 1e-30}}
            )
            return g["hs_linear"]["b"][0]

        return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

    fg = jax.jit(chained_grad)
    float(fg(params))
    t0 = time.perf_counter()
    float(fg(params))
    per_step = max((time.perf_counter() - t0 - roundtrip), 1e-9) / CHAIN_K
    train_gps = BATCH / per_step
    log(f"[{modality}] train fwd+bwd: {per_step * 1e3:.2f} ms / {BATCH} graphs -> {train_gps:.0f} g/s")
    return ours_gps, torch_gps, train_gps


def bench_large_train(roundtrip, batch_graphs=64):
    """bs64 training throughput through the chunked fused-kernel VJP
    (collate_fit -> (chunk, level) Pallas grid) vs the XLA fallback."""
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import collate, collate_fit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    graphs = make_dataset("mig", seed=7, n=batch_graphs)

    def timed_grad(batch, use_pallas):
        tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], cfg.dim_hidden))

        def train_loss(p):
            hs, hf, _ = forward(p, batch, cfg, use_pallas=use_pallas)
            m = batch["node_valid"][:, None]
            return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))

        def chained(p):
            def body(i, c):
                g = jax.grad(train_loss)(
                    {**p, "hs_linear": {"w": p["hs_linear"]["w"], "b": p["hs_linear"]["b"] + c * 1e-30}}
                )
                return g["hs_linear"]["b"][0]

            return jax.lax.fori_loop(0, CHAIN_K, body, 0.0)

        f = jax.jit(chained)
        float(f(params))
        t0 = time.perf_counter()
        float(f(params))
        return max(time.perf_counter() - t0 - roundtrip, 1e-9) / CHAIN_K

    t_xla = timed_grad(jax.tree.map(jnp.asarray, collate(graphs)), False)
    t_krn = timed_grad(jax.tree.map(jnp.asarray, collate_fit(graphs)), True)
    log(
        f"[bs{batch_graphs} train] chunked-kernel {t_krn * 1e3:.2f} ms ({batch_graphs / t_krn:.0f} g/s) "
        f"vs XLA {t_xla * 1e3:.2f} ms ({batch_graphs / t_xla:.0f} g/s) -> {t_xla / t_krn:.2f}x"
    )
    return batch_graphs / t_krn, batch_graphs / t_xla


def main():
    import os

    import jax

    # persistent compile cache: remote TPU compiles are 20s-5min cold
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    roundtrip = measure_roundtrip()
    log(f"host<->device sync latency: {roundtrip * 1e3:.1f} ms (subtracted)")
    # all four modalities (xmg = 5-expert dispatch, the worst case)
    res = {}
    for i, mod in enumerate(("aig", "mig", "xag", "xmg")):
        res[mod] = bench_modality(mod, seed=i, roundtrip=roundtrip)
    big_kernel, big_xla = bench_large_train(roundtrip)
    # headline metric unchanged from round 1 (aig+mig harmonic mean) so
    # rounds stay comparable; the wider coverage rides in "extra"
    ours = 2.0 / (1.0 / res["aig"][0] + 1.0 / res["mig"][0])
    base = 2.0 / (1.0 / res["aig"][1] + 1.0 / res["mig"][1])
    print(
        json.dumps(
            {
                "metric": "graphs_per_sec_encode_aig_mig",
                "value": round(ours, 2),
                "unit": "graphs/s",
                "vs_baseline": round(ours / base, 2),
                "extra": {
                    **{
                        f"{m}_encode_gps": round(r[0], 1)
                        for m, r in res.items()
                    },
                    **{
                        f"{m}_train_gps": round(r[2], 1)
                        for m, r in res.items()
                    },
                    "bs64_train_gps_chunked_kernel": round(big_kernel, 1),
                    "bs64_train_gps_xla": round(big_xla, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
