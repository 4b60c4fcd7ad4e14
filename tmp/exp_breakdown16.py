"""Component breakdown at bs64 (chunked C=3): struct encoder vs per-edge
statics vs fused level kernel — where does the 3.2 ms forward go?"""
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
    from mgvae_tpu.models.dg_ae import (
        DGConfig, _level_scan_pallas, _level_statics, _lv_views, forward,
        init_params, struct_input,
    )
    from mgvae_tpu.models.encoder import direct_multigcn_apply

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(BATCH)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))

    f0 = jax.jit(lambda x: x.sum())
    float(f0(jnp.zeros(8)))
    rt = min(
        (lambda t0: (float(f0(jnp.zeros(8))), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    log(f"roundtrip {rt*1e3:.1f} ms")

    def timed(fn):
        fj = jax.jit(fn)
        float(fj(params))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fj(params))
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

    # 1. struct encoder only
    def enc_only(p):
        x = struct_input(batch["gate"], cfg, jnp.float32)
        s, t = direct_multigcn_apply(p["struct"], x, batch, cfg.s_rounds, cfg.t_rounds, cfg.layernorm)
        return s[0, 0]

    # 2. struct + hs + statics (no level scan)
    def statics_only(p):
        x = struct_input(batch["gate"], cfg, jnp.float32)
        s, t = direct_multigcn_apply(p["struct"], x, batch, cfg.s_rounds, cfg.t_rounds, cfg.layernorm)
        from mgvae_tpu.ops.init import linear_apply
        hs = linear_apply(p["hs_linear"], jnp.concatenate([s, t], axis=-1))
        expert = cfg.expert_of_gate[batch["gate"]]
        pack, wkv = _level_statics(p, batch, cfg, hs, expert)
        return pack[0, 0]

    # 3. full forward with kernel
    def full(p):
        hs, hf, _ = forward(p, batch, cfg, use_pallas=True)
        return hf[0, 0]

    t_enc = timed(chain(enc_only))
    t_stat = timed(chain(statics_only))
    t_full = timed(chain(full))
    log(f"struct encoder only : {t_enc:6.2f} ms")
    log(f"+ hs + statics      : {t_stat:6.2f} ms (statics ~{t_stat - t_enc:.2f})")
    log(f"full fwd (kernel)   : {t_full:6.2f} ms (level kernel ~{t_full - t_stat:.2f})")


if __name__ == "__main__":
    main()
