"""4-arm A/B on real TPU: which gather-transpose fixes pay at bs16 MIG?
  all        : eid tables (recon + statics) + edge_lv_row (pack_lv inverse)
  no-eid     : only edge_lv_row
  no-lvrow   : only eid tables
  none       : round-2 behavior (autodiff scatters everywhere)
Residual bwd kernel is on in all arms."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    K, BATCH = 8, 16
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")
    sbatch, _ = stacked_batches("mig", 7, K, BATCH)

    def strip(sb, keys):
        return {k: v for k, v in sb.items() if k not in keys}

    arms = [
        ("all", sbatch),
        ("no-eid", strip(sbatch, ("fa_eid", "ra_eid"))),
        ("no-lvrow", strip(sbatch, ("edge_lv_row",))),
        ("none", strip(sbatch, ("fa_eid", "ra_eid", "edge_lv_row"))),
    ]

    opt = make_optimizer(1e-4)
    multi = make_multi_step(cfg, opt, None, donate=False)
    rngs = jax.random.split(jax.random.PRNGKey(3), K)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    opt_state = opt.init(params)

    def train_scan(params, state, opt_state, sbatch, rngs, weights):
        _, _, _, ms = multi(params, state, opt_state, sbatch, rngs, weights)
        return ms

    for name, sb in arms:
        ms = train_scan(params, state, opt_state, sb, rngs, weights)
        assert np.isfinite(np.asarray(ms)).all(), name
        t = timed_scan(train_scan, (params, state, opt_state, sb, rngs, weights), K, rt, reps=7)
        log(f"[{name}] train step {t*1e3:.2f} ms -> {BATCH/t:.0f} g/s")


if __name__ == "__main__":
    main()
