"""Does bs64 pay per graph once compute dominates (D=128)? (VERDICT item 2
follow-through: at D=64 the serial level recurrence is overhead-bound and
bs64 holds ~0.89x bs16 after six measured attack attempts; this measures
the same comparison where the MXU actually works.)"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import bench  # reuse the hoist-proof protocol


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    roundtrip = bench.measure_roundtrip()
    for dim in (64, 128):
        cfg = DGConfig(modality="mig", dim_hidden=dim, layernorm=True)
        params, state = init_params(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(1e-4)
        opt_state = opt.init(params)
        weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])

        def timed(batch_graphs, chunks, k):
            sbatch, _ = bench.stacked_batches("mig", 7, k, batch_graphs, chunks=chunks)
            rngs = jax.random.split(jax.random.PRNGKey(5), k)
            multi = make_multi_step(cfg, opt, None, donate=False)

            def train_scan(params, state, opt_state, sbatch, rngs, weights):
                _, _, _, ms = multi(params, state, opt_state, sbatch, rngs, weights)
                return ms

            ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
            assert np.isfinite(np.asarray(ms)).all()
            return bench.timed_scan(
                train_scan, (params, state, opt_state, sbatch, rngs, weights),
                k, roundtrip)

        t16 = timed(16, 1, bench.SCAN_K)
        g16 = 16 / t16
        for C in (2, 3, 4):
            t64 = timed(64, C, bench.SCAN_K_BIG)
            g64 = 64 / t64
            print(f"D={dim}: bs16 {t16*1e3:.2f} ms ({g16:.0f} g/s) | "
                  f"bs64 C={C} {t64*1e3:.2f} ms ({g64:.0f} g/s) | "
                  f"ratio {g64/g16:.3f}", flush=True)


if __name__ == "__main__":
    main()
