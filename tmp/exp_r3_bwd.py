"""Round 3: residual-saving Pallas backward — on-chip A/B at MIG bs16.

Measures (hoist-proof scan over distinct batches, sync subtracted):
  1. level-scan forward only (kernel)
  2. level-scan value+grad through pallas_level_scan's VJP
  3. full train step (losses + bwd + Adam)
Round-2 baselines: fwd 0.83 ms, VJP fwd+bwd ~2.3 ms, full step 5.04 ms.
Also value-checks grads vs XLA autodiff on-device.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, timed_scan, log


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    K, BATCH = 8, 16
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")
    sbatch, batch0 = stacked_batches("mig", 7, K, BATCH)

    # grad parity vs XLA autodiff (on-device, highest precision)
    import dataclasses as dc

    cfg_hi = dc.replace(cfg, matmul_precision="highest")

    def loss(p, b, use_pallas):
        hs, hf, _ = forward(p, b, cfg_hi, use_pallas=use_pallas)
        m = b["node_valid"][:, None]
        return jnp.sum(jnp.where(m, hf * jnp.cos(hf), 0.0))

    b0 = jax.tree.map(lambda x: x[0], sbatch)
    g_x = jax.jit(jax.grad(lambda p: loss(p, b0, False)))(params)
    g_p = jax.jit(jax.grad(lambda p: loss(p, b0, True)))(params)
    import jax.flatten_util

    a, _ = jax.flatten_util.ravel_pytree(g_x)
    b, _ = jax.flatten_util.ravel_pytree(g_p)
    scale = float(jnp.abs(a).max())
    rel = float(jnp.abs(a - b).max()) / max(scale, 1e-9)
    log(f"grad parity (kernel vs XLA autodiff, highest): rel {rel:.2e}")
    assert rel < 1e-4, rel

    # 1. forward only
    def scan_fwd(params, sbatch):
        def body(acc, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            return acc + hf.sum(), ()

        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

    t_fwd = timed_scan(scan_fwd, (params, sbatch), K, rt)
    log(f"level+struct fwd: {t_fwd*1e3:.2f} ms")

    # 2. fwd + bwd through the VJP (grad wrt params of sum(hf))
    def scan_grad(params, sbatch):
        def body(acc, b):
            g = jax.grad(
                lambda p: forward(p, b, cfg, use_pallas=True)[1].sum()
            )(params)
            leaves = jax.tree.leaves(g)
            return acc + sum(l.sum() for l in leaves), ()

        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

    t_grad = timed_scan(scan_grad, (params, sbatch), K, rt)
    log(f"fwd+bwd (VJP): {t_grad*1e3:.2f} ms (bwd-only ~{(t_grad-t_fwd)*1e3:.2f} ms)")

    # 3. full train step
    opt = make_optimizer(1e-4)
    multi = make_multi_step(cfg, opt, None, donate=False)
    rngs = jax.random.split(jax.random.PRNGKey(3), K)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    opt_state = opt.init(params)

    def train_scan(params, state, opt_state, sbatch, rngs, weights):
        _, _, _, ms = multi(params, state, opt_state, sbatch, rngs, weights)
        return ms

    ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
    assert np.isfinite(np.asarray(ms)).all()
    t_step = timed_scan(train_scan, (params, state, opt_state, sbatch, rngs, weights), K, rt)
    log(f"full train step: {t_step*1e3:.2f} ms -> {BATCH/t_step:.0f} g/s")


if __name__ == "__main__":
    main()
