"""Gradient-step breakdown at bs16 MIG: where do the ~1.6 ms go?
fwd (kernel) vs fwd+bwd of the level scan only vs full train loss grad.
Run AFTER bench.py finishes (fresh process; TPU tunnel dislikes sharing)."""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

CHAIN_K = 16
BATCH = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
    from mgvae_tpu.train import losses
    from mgvae_tpu.train.step import make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))

    f0 = jax.jit(lambda x: x.sum())
    float(f0(jnp.zeros(8)))
    rt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f0(jnp.zeros(8)))
        rt = min(rt, time.perf_counter() - t0)
    log(f"roundtrip {rt*1e3:.1f} ms")

    def timed(fn, arg):
        fj = jax.jit(fn)
        float(fj(arg))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fj(arg))
            best = min(best, time.perf_counter() - t0)
        return (best - rt) / CHAIN_K * 1e3

    def chain(body):
        def run(params):
            def step(i, c):
                p2 = {**params, "hs_linear": {"w": params["hs_linear"]["w"],
                                              "b": params["hs_linear"]["b"] + c * 1e-30}}
                return body(p2)
            return jax.lax.fori_loop(0, CHAIN_K, step, 0.0)
        return run

    tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], cfg.dim_hidden))

    # 1. fwd only
    t_fwd = timed(chain(lambda p: forward(p, batch, cfg, use_pallas=True)[1][0, 0]), params)

    # 2. grad of a trivial loss on hf (isolates fwd+bwd of the model)
    def mse(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0))

    t_mse = timed(chain(lambda p: jax.grad(mse)(p)["hs_linear"]["b"][0]), params)

    # 3. grad of the REAL multi-task loss (recon+prob+func)
    w = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    key = jax.random.PRNGKey(1)

    def real_loss(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        rc, _ = losses.recon_loss(p, hs, batch, key)
        pl, _ = losses.prob_loss(p, state, hf, batch, train=True, rng=key)
        fl = losses.func_loss(hf, batch)
        return w[0] * rc + w[1] * pl + w[2] * fl

    t_real = timed(chain(lambda p: jax.grad(real_loss)(p)["hs_linear"]["b"][0]), params)

    # 4. the full train_step (loss grads + Adam + metrics)
    opt = make_optimizer(1e-4)
    train_step, _ = make_train_step(cfg, opt, None)
    opt_state = opt.init(params)

    def full_step(p):
        p2, st2, os2, m = train_step(p, state, opt_state, batch, key, w)
        return p2["hs_linear"]["b"][0]

    def chain_full(p):
        def step(i, c):
            p2 = {**p, "hs_linear": {"w": p["hs_linear"]["w"],
                                     "b": p["hs_linear"]["b"] + c * 1e-30}}
            return full_step(p2)
        return jax.lax.fori_loop(0, CHAIN_K, step, 0.0)

    t_full = timed(chain_full, params)

    log(f"fwd (kernel)             : {t_fwd:6.2f} ms")
    log(f"grad mse  (fwd+bwd model): {t_mse:6.2f} ms (bwd ~{t_mse - t_fwd:.2f})")
    log(f"grad real multi-task loss: {t_real:6.2f} ms (losses add ~{t_real - t_mse:.2f})")
    log(f"full train_step          : {t_full:6.2f} ms (adam+metrics ~{t_full - t_real:.2f})")


if __name__ == "__main__":
    main()


def per_loss():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
    from mgvae_tpu.train import losses

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    key = jax.random.PRNGKey(1)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (batch["gate"].shape[0], cfg.dim_hidden))

    f0 = jax.jit(lambda x: x.sum())
    float(f0(jnp.zeros(8)))
    rt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f0(jnp.zeros(8)))
        rt = min(rt, time.perf_counter() - t0)

    def timed(fn, arg):
        fj = jax.jit(fn)
        float(fj(arg))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fj(arg))
            best = min(best, time.perf_counter() - t0)
        return (best - rt) / CHAIN_K * 1e3

    def chain(body):
        def run(params):
            def step(i, c):
                p2 = {**params, "hs_linear": {"w": params["hs_linear"]["w"],
                                              "b": params["hs_linear"]["b"] + c * 1e-30}}
                return body(p2)
            return jax.lax.fori_loop(0, CHAIN_K, step, 0.0)
        return run

    def base(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        m = batch["node_valid"][:, None]
        return jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)) * 1e-9

    def with_recon(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        rc, _ = losses.recon_loss(p, hs, batch, key)
        m = batch["node_valid"][:, None]
        return rc + jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)) * 1e-9

    def with_prob(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        pl, _ = losses.prob_loss(p, state, hf, batch, train=True, rng=key)
        m = batch["node_valid"][:, None]
        return pl + jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)) * 1e-9

    def with_func(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        fl = losses.func_loss(hf, batch)
        m = batch["node_valid"][:, None]
        return fl + jnp.sum(jnp.where(m, (hf - tgt) ** 2, 0.0)) * 1e-9

    t0 = timed(chain(lambda p: jax.grad(base)(p)["hs_linear"]["b"][0]), params)
    tr = timed(chain(lambda p: jax.grad(with_recon)(p)["hs_linear"]["b"][0]), params)
    tp = timed(chain(lambda p: jax.grad(with_prob)(p)["hs_linear"]["b"][0]), params)
    tf = timed(chain(lambda p: jax.grad(with_func)(p)["hs_linear"]["b"][0]), params)
    log(f"base grad {t0:.2f} ms | +recon {tr - t0:+.2f} | +prob {tp - t0:+.2f} | +func {tf - t0:+.2f}")


if __name__ == "__main__":
    per_loss()
