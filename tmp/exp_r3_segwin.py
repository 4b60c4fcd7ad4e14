"""Segmented source windows (src-sorted level edges): bs16 + bs64 train."""
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

    for bs, k, chunks in [(16, 8, 1), (64, 4, 3)]:
        sbatch, _ = stacked_batches("mig", 7, k, bs, chunks=chunks)
        rngs = jax.random.split(jax.random.PRNGKey(5), k)
        multi = make_multi_step(cfg, opt, None, donate=False)

        def train_scan(params, state, opt_state, sbatch, rngs, weights):
            return multi(params, state, opt_state, sbatch, rngs, weights)[3]

        ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
        assert np.isfinite(np.asarray(ms)).all()
        t = timed_scan(train_scan, (params, state, opt_state, sbatch, rngs, weights),
                       k, rt, reps=7)
        log(f"[bs{bs}] train step {t*1e3:.2f} ms -> {bs/t:.0f} g/s")


if __name__ == "__main__":
    main()
