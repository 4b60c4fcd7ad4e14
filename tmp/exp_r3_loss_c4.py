"""Why do losses cost ~1.7 ms at bs64 C=4 but ~0 at C=3? Per-term timing."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log

K = 4


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params, hs_decompose
    from mgvae_tpu.train import losses

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()

    for tag, chunks in [("c3", 3), ("c4", 4)]:
        sbatch, b0 = stacked_batches("mig", 7, K, 64, chunks=chunks)

        def scan_of(body):
            def outer(params, sbatch):
                def step(acc, b):
                    return acc + body(params, b), ()
                return jax.lax.scan(step, jnp.zeros(()), sbatch)[0]
            return outer

        def fwd_only(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            return hs.sum() + hf.sum()

        def fwd_recon(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            l, m = losses.recon_loss(params, hs, b, jax.random.PRNGKey(0))
            return l + hf.sum()

        def fwd_prob(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            l, _ = losses.prob_loss(params, state, hf, b, False, jax.random.PRNGKey(0))
            return l + hs.sum()

        def fwd_func(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            return losses.func_loss(hf, b) + hs.sum()

        def fwd_negsample(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            s, t = hs_decompose(params, hs)
            ns, nd = losses.sample_negative_edges(
                jax.random.PRNGKey(0), b["edge_src"].shape[0], b)
            from mgvae_tpu.models.dg_ae import decode_edges
            neg = decode_edges(s, t, ns, nd, sigmoid=False)
            return neg.sum() + hf.sum()

        base = None
        for name, body in [("fwd", fwd_only), ("fwd+recon", fwd_recon),
                           ("fwd+prob", fwd_prob), ("fwd+func", fwd_func),
                           ("fwd+negsample", fwd_negsample)]:
            t = timed_scan(scan_of(body), (params, sbatch), K, rt)
            extra = "" if base is None else f" (+{(t-base)*1e3:.2f})"
            if base is None:
                base = t
            log(f"[{tag}] {name}: {t*1e3:.2f} ms{extra}")


if __name__ == "__main__":
    main()
