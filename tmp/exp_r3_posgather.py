"""Isolate the C=4 recon pos-path cost: plain takes vs gather_rows_t vs
recon with the eid tables stripped (decode_edges fallback)."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log

K = 4


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params, hs_decompose
    from mgvae_tpu.models.encoder import gather_rows_t
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

        def fwd_take(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            s, t = hs_decompose(params, hs)
            pos = jnp.sum(s[b["edge_src"]] * t[b["edge_dst"]], axis=-1)
            return pos.sum() + hf.sum()

        def fwd_grt(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            s, t = hs_decompose(params, hs)
            s_e = gather_rows_t(s, b["edge_src"],
                                (b["ra_eid"], b["ra_slot"], b["ra_valid"]))
            t_e = gather_rows_t(t, b["edge_dst"],
                                (b["fa_eid"], b["fa_slot"], b["fa_valid"]))
            pos = jnp.sum(s_e * t_e, axis=-1)
            return pos.sum() + hf.sum()

        def fwd_recon_noeid(params, b):
            b2 = {k: v for k, v in b.items()
                  if k not in ("ra_eid", "fa_eid")}
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            l, m = losses.recon_loss(params, hs, b2, jax.random.PRNGKey(0))
            return l + hf.sum()

        def fwd_recon(params, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            l, m = losses.recon_loss(params, hs, b, jax.random.PRNGKey(0))
            return l + hf.sum()

        base = None
        for name, body in [("fwd", fwd_only), ("fwd+take", fwd_take),
                           ("fwd+gather_rows_t", fwd_grt),
                           ("fwd+recon-noeid", fwd_recon_noeid),
                           ("fwd+recon", fwd_recon)]:
            t = timed_scan(scan_of(body), (params, sbatch), K, rt)
            extra = "" if base is None else f" (+{(t-base)*1e3:.2f})"
            if base is None:
                base = t
            log(f"[{tag}] {name}: {t*1e3:.2f} ms{extra}")


if __name__ == "__main__":
    main()
