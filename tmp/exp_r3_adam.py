"""Locate the ~1.9 ms between grad (2.55 ms) and the full train step
(4.47 ms) at MIG bs16: grads-only vs +Adam vs +metrics vs make_multi_step."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import SCAN_K, measure_roundtrip, stacked_batches, timed_scan, log


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import (loss_and_metrics, make_multi_step,
                                      make_optimizer, make_train_step)

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    rt = measure_roundtrip()
    sbatch, _ = stacked_batches("mig", 7, SCAN_K, 16)
    rngs = jax.random.split(jax.random.PRNGKey(5), SCAN_K)

    def scan_of(body, carry_init):
        def outer(*args):
            def step(carry, xs):
                return body(carry, xs)
            return jax.lax.scan(step, carry_init(*args), (sbatch, rngs))[0]
        return outer

    grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)

    # 1. grads only (accumulate into params-shaped carry so nothing hoists)
    def g_only(params, *_):
        def body(p, xs):
            b, r = xs
            (_, (_, m)), g = grad_fn(p, state, b, r, weights, cfg, True)
            p = jax.tree.map(lambda a, b_: a + 1e-30 * b_, p, g)
            return p, ()
        return jax.lax.scan(body, params, (sbatch, rngs))[0]

    def run(fn, args, label):
        t = timed_scan(fn, args, SCAN_K, rt)
        log(f"{label}: {t*1e3:.2f} ms")
        return t

    def leaves_sum(t):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t))

    run(lambda p: g_only(p), (params,), "grad only")

    # 2. grad + Adam update (no metrics consumption)
    def g_adam(params, opt_state):
        def body(carry, xs):
            p, os = carry
            b, r = xs
            (_, (_, m)), g = grad_fn(p, state, b, r, weights, cfg, True)
            up, os = opt.update(g, os, p)
            p = optax.apply_updates(p, up)
            return (p, os), ()
        (p, os), _ = jax.lax.scan(body, (params, opt_state), (sbatch, rngs))
        return leaves_sum(p)

    run(lambda p, o: g_adam(p, o), (params, opt_state), "grad+adam")

    # 3. grad + Adam + metrics stacked (what multi_step returns)
    def g_full(params, opt_state):
        def body(carry, xs):
            p, os = carry
            b, r = xs
            (_, (ns, m)), g = grad_fn(p, state, b, r, weights, cfg, True)
            up, os = opt.update(g, os, p)
            p = optax.apply_updates(p, up)
            from mgvae_tpu.train.step import METRIC_KEYS
            row = jnp.stack([m[k] for k in METRIC_KEYS])
            return (p, os), row
        (p, os), rows = jax.lax.scan(body, (params, opt_state), (sbatch, rngs))
        return leaves_sum(p) + rows.sum()

    run(lambda p, o: g_full(p, o), (params, opt_state), "grad+adam+metrics")

    # 4. the real make_multi_step
    multi = make_multi_step(cfg, opt, None, donate=False)

    def real(params, state_, opt_state):
        p, s, os, ms = multi(params, state_, opt_state, sbatch, rngs, weights)
        return leaves_sum(p) + ms.sum()

    run(lambda p, s, o: real(p, s, o), (params, state, opt_state), "make_multi_step")


if __name__ == "__main__":
    main()
