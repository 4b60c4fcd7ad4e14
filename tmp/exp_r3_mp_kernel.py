"""VERDICT r2 item 6: can the fused level kernel run under mp (within-level
sharding), or should the mp path stay XLA?

The sequential level recurrence forces a cross-shard softmax collective
BETWEEN levels (level i+1's scores read level i's normalized output), and a
collective cannot run mid-grid inside one Pallas launch. So "kernel under
mp" necessarily means ONE PALLAS LAUNCH PER LEVEL inside the lax.scan, with
the collectives between launches. This measures what that structure costs on
the real chip:

  a) the fused kernel (one launch, grid over all levels)   [today's path]
  b) the XLA scan                                          [today's mp path]
  c) per-level pallas launches inside lax.scan: the SAME level body, grid
     (1,), hf carried as a scan state — the launch/dispatch overhead the mp
     composition would pay L times

If (c) >= (b), composing the kernel with mp cannot beat the XLA scan it
would replace, independent of collective costs (which only add).
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")
    K = 8
    sbatch, batch0 = stacked_batches("mig", 7, K, 16)
    L = int(np.asarray(batch0["lv_nodes"]).shape[-2])
    log(f"levels per batch: {L}")

    def scan_fwd(params, sbatch, use_pallas):
        def body(acc, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=use_pallas)
            return acc + hf.astype(jnp.float32).sum(), ()

        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

    t_kernel = timed_scan(lambda p, s: scan_fwd(p, s, True), (params, sbatch), K, rt)
    t_xla = timed_scan(lambda p, s: scan_fwd(p, s, False), (params, sbatch), K, rt)
    log(f"(a) fused kernel {t_kernel*1e3:.2f} ms  (b) XLA scan {t_xla*1e3:.2f} ms")

    # (c) per-launch overhead: a minimal pallas kernel (one [128,128] copy —
    # far LESS work than a real level body) launched L times inside a scan,
    # with a data dependency so launches can't fuse or hoist
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    call = pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def launches(x, _):
        def body(h, _):
            return call(h), ()

        return jax.lax.scan(body, x, None, length=L)[0]

    xs = jnp.zeros((K, 128, 128), jnp.float32)

    def scan_launches(params, xs):
        def body(acc, x):
            return acc + launches(x, params).sum(), ()

        return jax.lax.scan(body, jnp.zeros(()), xs)[0]

    t_launch = timed_scan(scan_launches, (params, xs), K, rt)
    log(f"(c) {L} minimal per-level pallas launches: {t_launch*1e3:.2f} ms "
        f"({t_launch/L*1e6:.1f} us/launch)")
    log(f"verdict: per-level launches alone cost {t_launch/t_xla:.2f}x the "
        f"entire XLA scan -> kernel-under-mp loses before collectives")


if __name__ == "__main__":
    main()
