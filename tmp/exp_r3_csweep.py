"""bs64 chunk-count sweep WITH segmented source windows: the windows cut the
per-level gather span (work ~ Ep_sub * window), so the old 'C=3..6 flat'
result may no longer hold — larger C shrinks both Ep_sub and N_sub."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    K = 4

    for C in (3, 4, 6, 8):
        sbatch, b0 = stacked_batches("mig", 7, K, 64, chunks=C)
        rngs = jax.random.split(jax.random.PRNGKey(5), K)
        multi = make_multi_step(cfg, opt, None, donate=False)

        def train_scan(params, state, opt_state, sbatch, rngs, weights):
            return multi(params, state, opt_state, sbatch, rngs, weights)[3]

        ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
        assert np.isfinite(np.asarray(ms)).all()
        t = timed_scan(train_scan, (params, state, opt_state, sbatch, rngs, weights),
                       K, rt, reps=5)
        n_sub = np.asarray(b0["gate"]).shape[0] // C
        ep = np.asarray(b0["lv_edge_src"]).shape[-1]
        log(f"[C={C}] n_sub {n_sub} Ep {ep}: train {t*1e3:.2f} ms -> {64/t:.0f} g/s")


if __name__ == "__main__":
    main()
