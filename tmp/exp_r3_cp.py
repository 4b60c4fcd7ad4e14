"""Chunk-parallel grid A/B at bs64 MIG: C sweep with CP on vs forced off.
Target (VERDICT item 2): bs64 train g/s >= 1.1x bs16 train g/s (~3424)."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log, make_dataset

K = 4
BATCH = 64


def main():
    import jax
    import jax.numpy as jnp

    import mgvae_tpu.ops.pallas.level_kernel as LK
    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    rngs = jax.random.split(jax.random.PRNGKey(5), K)

    orig_cp = LK.kernel_fits_cp

    def timed(chunks, cp):
        LK.kernel_fits_cp = orig_cp if cp else (lambda *a: False)
        try:
            sbatch, b0 = stacked_batches("mig", 7, K, BATCH, chunks=chunks)
            multi = make_multi_step(cfg, opt, None, donate=False)

            def train_scan(params, state, opt_state, sbatch, rngs, weights):
                _, _, _, ms = multi(params, state, opt_state, sbatch, rngs, weights)
                return ms

            ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
            assert np.isfinite(np.asarray(ms)).all(), f"C={chunks} cp={cp}"
            t = timed_scan(train_scan,
                           (params, state, opt_state, sbatch, rngs, weights), K, rt)
            n_sub = b0["gate"].shape[0] // chunks
            log(f"[C={chunks} cp={int(cp)}] {t*1e3:.2f} ms -> {BATCH/t:.0f} g/s "
                f"(N_sub={n_sub})")
            return t
        finally:
            LK.kernel_fits_cp = orig_cp

    timed(3, False)   # round-2 style per-chunk grid (with residual bwd)
    for C in (3, 4, 6, 8):
        timed(C, True)


if __name__ == "__main__":
    main()
