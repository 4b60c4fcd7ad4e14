"""Round 3: MXU scaling evidence — D=128 / D=256 rows (VERDICT item 4).

At D=64 the level kernel is per-grid-step overhead-bound, so bf16 measured
neutral. The reference exposes --dim_hidden (config.py:13); this measures
kernel-vs-XLA and full train step at D=128 (and one D=256 point), f32 vs
bf16, plus an MFU estimate.

Hoist-proof protocol v2 (scan over distinct batches, sync subtracted).
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log


def run_dim(D, compute_dtype, rt, K=8, BATCH=16):
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    cfg = DGConfig(modality="mig", dim_hidden=D, layernorm=True,
                   compute_dtype=compute_dtype)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    sbatch, batch0 = stacked_batches("mig", 7, K, BATCH)

    def scan_fwd(params, sbatch, use_pallas):
        def body(acc, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=use_pallas)
            return acc + hf.astype(jnp.float32).sum(), ()

        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

    t_k = timed_scan(lambda p, s: scan_fwd(p, s, True), (params, sbatch), K, rt)
    t_x = timed_scan(lambda p, s: scan_fwd(p, s, False), (params, sbatch), K, rt)
    log(f"[D={D} {compute_dtype}] fwd kernel {t_k*1e3:.2f} ms vs XLA {t_x*1e3:.2f} ms "
        f"({t_x/t_k:.2f}x)")

    opt = make_optimizer(1e-4)
    multi = make_multi_step(cfg, opt, None, donate=False)
    rngs = jax.random.split(jax.random.PRNGKey(3), K)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    opt_state = opt.init(params)

    def train_scan(params, state, opt_state, sbatch, rngs, weights):
        _, _, _, ms = multi(params, state, opt_state, sbatch, rngs, weights)
        return ms

    ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
    assert np.isfinite(np.asarray(ms, np.float32)).all(), "non-finite metrics"
    t_step = timed_scan(train_scan, (params, state, opt_state, sbatch, rngs, weights), K, rt)
    gps = BATCH / t_step
    # rough FLOP count per batch fwd: struct towers (2 towers x s_rounds x 2
    # half-rounds x N x D x D AggConv + GRU 3*(D+F)*D) + level scan
    # (E*(2*2TD*D) kv + N*3TD*D GRU) + losses; x3 for fwd+bwd
    b0 = batch0
    N = int(np.asarray(b0["gate"]).shape[0])
    E = int(np.asarray(b0["edge_src"]).shape[0])
    T = cfg.num_experts
    F = cfg.dim_feature
    struct = 2 * cfg.s_rounds * 2 * (N * D * D + N * 3 * (D + F + D) * D)
    level = E * 4 * T * D * D + N * 3 * T * D * D  # kv (hs+hf sides) + GRU
    flops_train = 3 * 2 * (struct + level)  # *2 mul+add, *3 fwd+bwd
    peak = 197e12 if compute_dtype == "bfloat16" else 98e12  # v5e approx
    mfu = flops_train / t_step / peak
    log(f"[D={D} {compute_dtype}] train {t_step*1e3:.2f} ms -> {gps:.0f} g/s "
        f"(~{flops_train/1e9:.1f} GFLOP/step, MFU ~{mfu*100:.2f}%)")
    return dict(D=D, dtype=compute_dtype, fwd_kernel_ms=t_k * 1e3,
                fwd_xla_ms=t_x * 1e3, train_ms=t_step * 1e3, train_gps=gps,
                mfu_pct=mfu * 100)


def main():
    import jax

    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")
    rows = []
    for D, dt in [(128, "float32"), (128, "bfloat16"), (256, "float32"),
                  (256, "bfloat16")]:
        rows.append(run_dim(D, dt, rt))
    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
