"""On-chip split-G sweep at bs64: is G=4 (the auto policy's per//16)
optimal?  More groups = tighter padding but more per-group pallas_call
fixed cost; fewer = the reverse.  Protocol = bench.py's hoist-proof scan
over SCAN_K_BIG distinct stacked batches, value-checked.

  python tmp/exp_r4_split_gsweep.py     (fresh process, nothing else running)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench
    from mgvae_tpu.data.batching import collate_split, split_dims
    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    roundtrip = bench.measure_roundtrip()
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    K = bench.SCAN_K_BIG
    rngs = jax.random.split(jax.random.PRNGKey(5), K)
    bs = 64
    shards = [bench.make_dataset("mig", 7000 + i, n=bs) for i in range(K)]
    multi = make_multi_step(cfg, opt, None, donate=False)

    def split_scan(params, state, opt_state, sbatch, rngs, weights):
        return multi(params, state, opt_state, sbatch, rngs, weights)[3]

    for G in (2, 4, 8):
        sdims = split_dims(shards, G)
        sbatches = [
            {k: v for k, v in collate_split(s, G, dims=sdims).items()
             if k != "node_inv"} for s in shards
        ]
        sb = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                          *sbatches)
        ms = split_scan(params, state, opt_state, sb, rngs, weights)
        assert np.isfinite(np.asarray(ms)).all(), f"non-finite metrics G={G}"
        t = bench.timed_scan(split_scan,
                             (params, state, opt_state, sb, rngs, weights),
                             K, roundtrip)
        tot_n = sum(int(g["gate"].shape[0]) for g in sbatches[0]["groups"])
        print(f"[G={G}] {t*1e3:.2f} ms/step ({bs/t:.0f} g/s)  padded N={tot_n}",
              flush=True)


if __name__ == "__main__":
    main()
