"""Round 5: one-hot chunk-width sweep for the fused level kernel.

The gather/scatter one-hot matmuls run at chunk granularity; per level only
chunks overlapping the source window execute. Windows at MIG bs16 are
~300-400 ids wide while the default chunk is 2048 — most of each guarded
compare+matmul is wasted. Sweep MGVAE_NCHUNK in a FRESH PROCESS per value
(CLAUDE.md: XLA + repeated Pallas compiles in one process can wedge the
tunnel).

Usage: MGVAE_NCHUNK=512 python tmp/exp_r5_chunk.py
Measures fwd-only and fwd+bwd (VJP) level scans, hoist-proof K-scan protocol,
plus a grad value-check vs XLA autodiff.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    K, BATCH = 16, 16  # K=16: at K=8 the ~27 ms sync dwarfs the 8-step signal
    nchunk = os.environ.get("MGVAE_NCHUNK", "default")
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()
    log(f"nchunk={nchunk} backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")
    sbatch, batch0 = stacked_batches("mig", 7, K, BATCH)

    # grad value-check vs XLA autodiff (cheap insurance that the knob is
    # purely a schedule change)
    def loss(p, b, use_pallas):
        hs, hf, _ = forward(p, b, cfg, use_pallas=use_pallas)
        m = b["node_valid"][:, None]
        return jnp.sum(jnp.where(m, hf * jnp.cos(hf), 0.0))

    b0 = jax.tree.map(lambda x: x[0], sbatch)
    g_x = jax.jit(jax.grad(lambda p: loss(p, b0, False)))(params)
    g_p = jax.jit(jax.grad(lambda p: loss(p, b0, True)))(params)
    import jax.flatten_util

    a, _ = jax.flatten_util.ravel_pytree(g_x)
    b, _ = jax.flatten_util.ravel_pytree(g_p)
    rel = float(jnp.abs(a - b).max()) / max(float(jnp.abs(a).max()), 1e-9)
    log(f"grad parity vs XLA: rel {rel:.2e}")
    assert rel < 2e-2, rel  # default precision; exp_r3_bwd checks highest

    def scan_fwd(params, sbatch):
        def body(acc, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            return acc + hf.sum(), ()

        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

    t_fwd = timed_scan(scan_fwd, (params, sbatch), K, rt)
    log(f"RESULT nchunk={nchunk} fwd: {t_fwd*1e3:.3f} ms")

    def scan_grad(params, sbatch):
        def body(acc, b):
            g = jax.grad(
                lambda p: forward(p, b, cfg, use_pallas=True)[1].sum()
            )(params)
            leaves = jax.tree.leaves(g)
            return acc + sum(l.sum() for l in leaves), ()

        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

    t_grad = timed_scan(scan_grad, (params, sbatch), K, rt)
    log(f"RESULT nchunk={nchunk} fwd+bwd: {t_grad*1e3:.3f} ms "
        f"(bwd-only ~{(t_grad-t_fwd)*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
