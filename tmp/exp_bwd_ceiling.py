"""Ceiling probe: how much of the bwd kernel's time is the hf_src recompute
gather? Monkeypatch the bwd kernel to skip that loop (grads become wrong;
timing stays valid) and compare."""
import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import numpy as np

CHAIN_K = 16
BATCH = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import mgvae_tpu.ops.pallas.level_kernel as LK
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], cfg.dim_hidden))

    f0 = jax.jit(lambda x: x.sum())
    float(f0(jnp.zeros(8)))
    rt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f0(jnp.zeros(8)))
        rt = min(rt, time.perf_counter() - t0)
    log(f"roundtrip {rt*1e3:.1f} ms")

    def mse(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))

    def timed():
        def chained(p):
            def step(i, c):
                p2 = {**p, "hs_linear": {"w": p["hs_linear"]["w"],
                                         "b": p["hs_linear"]["b"] + c * 1e-30}}
                return jax.grad(mse)(p2)["hs_linear"]["b"][0]
            return jax.lax.fori_loop(0, CHAIN_K, step, 0.0)
        fj = jax.jit(chained)
        float(fj(params))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fj(params))
            best = min(best, time.perf_counter() - t0)
        return (best - rt) / CHAIN_K * 1e3

    t_norm = timed()
    log(f"grad mse normal bwd      : {t_norm:6.2f} ms")

    # --- variant A: skip the hf_src recompute gather -------------------------
    orig = LK._level_bwd_kernel

    def make_patched(skip_gather=False, skip_ghf_gather=False, skip_scatter=False):
        def patched(start_ref, ghf_in_ref, hf_ref, pack_ref, edge_tbl_ref,
                    node_tbl_ref, wkv_hf_ref, w_ih_ref, b_ih_ref, b_hh_ref,
                    wa_k_ref, dpack_ref, dwkv_ref, dwih_ref, dbih_ref,
                    dbhh_ref, dwak_ref, ghf_ref, *, N, D, T, Ep, Np, n_chunk, L):
            i = pl.program_id(0)
            zero = jnp.zeros((), jnp.int32)
            s = start_ref[(i // L) * L + (L - 1 - i % L)]
            # overwrite start handling by faking SMEM values is not possible;
            # instead reimplement via the original with tweaked closures is
            # complex — so emulate by calling original with start forced 0
            # only for the gathers via monkey-level hacks is impractical.
            return orig(start_ref, ghf_in_ref, hf_ref, pack_ref, edge_tbl_ref,
                        node_tbl_ref, wkv_hf_ref, w_ih_ref, b_ih_ref, b_hh_ref,
                        wa_k_ref, dpack_ref, dwkv_ref, dwih_ref, dbih_ref,
                        dbhh_ref, dwak_ref, ghf_ref, N=N, D=D, T=T, Ep=Ep,
                        Np=Np, n_chunk=n_chunk, L=L)
        return patched

    # Simpler, honest ceiling: force ALL guards off by zeroing lv_start via
    # patched fused_level_scan_bwd (raw_start -> 0): every gather AND scatter
    # in bwd becomes a no-op -> pure VPU floor of the bwd math.
    orig_bwd = LK.fused_level_scan_bwd

    def patched_bwd(ghf_in, hf_final, pack_lv, lv_src, lv_dslot, lv_evalid,
                    lv_nodes, lv_upd, lv_e_n, *args, **kw):
        z = jnp.zeros_like(lv_upd)  # upd=0 -> raw_start==N -> lv_start=0
        return orig_bwd(ghf_in, hf_final, pack_lv, lv_src, lv_dslot, lv_evalid,
                        lv_nodes, z, lv_e_n, *args, **kw)

    LK.fused_level_scan_bwd = patched_bwd
    try:
        t_floor = timed()
    finally:
        LK.fused_level_scan_bwd = orig_bwd
    log(f"grad mse bwd all-guards-off (VPU floor): {t_floor:6.2f} ms")
    log(f"gather+scatter share of bwd: ~{t_norm - t_floor:.2f} ms")


if __name__ == "__main__":
    main()
