"""Where does bs64 spend its extra time vs 4x bs16? Component decomposition
under the hoist-proof protocol + dims comparison (superlinear bucket growth
suspects: EBF/EBR, Ep, L)."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log

K16, K64 = 8, 4


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
    from mgvae_tpu.train import losses
    from mgvae_tpu.train.step import loss_and_metrics

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")

    def dims_of(b):
        return {
            "N": b["gate"].shape[-1], "E": b["edge_src"].shape[-1],
            "P": b["tt_pair_a"].shape[-1],
            "L": b["lv_nodes"].shape[-2], "NP": b["lv_nodes"].shape[-1],
            "EP": b["lv_edge_src"].shape[-1],
            "EBF": b["fa_src"].shape[-1], "EBR": b["ra_src"].shape[-1],
            "C": b["lv_nodes"].shape[0] if np.asarray(b["lv_nodes"]).ndim == 3 else 1,
        }

    for tag, bs, k, chunks in [("bs16", 16, K16, 1), ("bs64c3", 64, K64, 3), ("bs64c4", 64, K64, 4)]:
        sbatch, b0 = stacked_batches("mig", 7, k, bs, chunks=chunks)
        log(f"[{tag}] dims {dims_of(b0)}")

        def scan_of(body):
            def outer(params, sbatch):
                def step(acc, b):
                    return acc + body(params, b), ()
                return jax.lax.scan(step, jnp.zeros(()), sbatch)[0]
            return outer

        # components (fwd only)
        def struct_fwd(params, b):
            from mgvae_tpu.models.dg_ae import struct_input
            from mgvae_tpu.models.encoder import direct_multigcn_apply
            x = struct_input(b["gate"], cfg, jnp.float32)
            s, t = direct_multigcn_apply(params["struct"], x, b, cfg.s_rounds,
                                         cfg.t_rounds, cfg.layernorm)
            return s.sum() + t.sum()

        def full_fwd(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            return hs.sum() + hf.sum()

        def loss_fwd(params, b):
            total, _ = loss_and_metrics(params, state, b, jax.random.PRNGKey(0),
                                        jnp.asarray([1., 4., 2., 0.]), cfg, False)
            return total

        def loss_grad(params, b):
            return jax.grad(
                lambda p: loss_and_metrics(p, state, b, jax.random.PRNGKey(0),
                                           jnp.asarray([1., 4., 2., 0.]), cfg, True)[0]
            )(params)["hs_linear"]["b"].sum()

        per = bs
        for name, body in [("struct-fwd", struct_fwd), ("model-fwd", full_fwd),
                           ("loss-fwd", loss_fwd), ("loss-grad", loss_grad)]:
            t = timed_scan(scan_of(body), (params, sbatch), k, rt)
            log(f"[{tag}] {name}: {t*1e3:.2f} ms ({per/t:.0f} g/s)")


if __name__ == "__main__":
    main()
