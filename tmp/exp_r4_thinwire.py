"""On-chip A/B for the thin wire (data/rehydrate): does deriving the index
tables on device beat shipping them over the ~85 MB/s tunnel?

Three measurements, one process (shared compile cache):
  1. device-step delta: K=8-step multi_step over DISTINCT stacked bs16
     batches (hoist-proof), thin vs full — the derive sort/gather cost.
     Param trees must bit-match between arms (derive correctness on-chip).
  2. bs16 e2e: Trainer epoch throughput, thin_wire True vs False.
  3. bs64 split e2e: same A/B on the split(G auto) path.

Run on the TPU host, fresh process, NOTHING else running:
  python tmp/exp_r4_thinwire.py [step|e2e16|e2e64|all]
"""
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_ds(n=512, seed=7):
    from mgvae_tpu.data.synthetic import random_circuit

    rng = np.random.default_rng(seed)
    return [random_circuit(rng, "mig", num_inputs=int(rng.integers(6, 14)),
                           num_gates=int(rng.integers(60, 420)), num_tt_pairs=64)
            for _ in range(n)]


def bench_step():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data import batching as B
    from mgvae_tpu.data.rehydrate import wire_drop
    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer
    from mgvae_tpu.utils import transfer as T

    ds = make_ds()
    K = 8
    shards = [ds[k * 16:(k + 1) * 16] for k in range(K)]
    pre = [B.shard_dims(s) for s in shards]
    dims = {k: max(d[k] for d in pre) for k in pre[0]}
    fulls = [B.collate(s, dims=dims) for s in shards]
    thins = [wire_drop(b) for b in fulls]
    _, fb = T._plan(fulls, 0)
    _, tb = T._plan(thins, 0)
    log(f"wire bytes/step: full {fb/1e3:.0f} KB thin {tb/1e3:.0f} KB "
        f"({fb/tb:.2f}x cut)")

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    ms = make_multi_step(cfg, opt, donate=False)
    rngs = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(1), i))(jnp.arange(K))
    w = jnp.asarray([1.0, 4.0, 2.0, 0.0])

    results = {}
    for label, batches in (("full", fulls), ("thin", thins)):
        stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
                   for k in batches[0]}
        sb = jax.tree.map(jnp.asarray, stacked)
        out = ms(params, state, opt_state, sb, rngs, w)  # compile
        float(jax.tree.leaves(out[0])[0].reshape(-1)[0])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = ms(params, state, opt_state, sb, rngs, w)
            float(jax.tree.leaves(out[0])[0].reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        # one ~26-27 ms sync round trip per dispatched call
        per_step = (best - 0.0265) / K
        results[label] = (per_step, out)
        m = np.asarray(out[3])
        assert np.isfinite(m).all(), f"{label}: non-finite metrics"
        log(f"[{label}] multi_step best {best*1e3:.1f} ms -> "
            f"{per_step*1e3:.2f} ms/step device(+dispatch)")
    pf = jax.tree.leaves(results["full"][1][0])
    pt = jax.tree.leaves(results["thin"][1][0])
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(pf, pt))
    log(f"param tree |full - thin| max = {worst:.2e} (expect 0.0)")
    assert worst == 0.0, "thin params diverge from full"
    log(f"derive device cost: {(results['thin'][0]-results['full'][0])*1e3:+.2f} ms/step")


def bench_e2e(bs, split, tag):
    import jax

    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    ds = make_ds()
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    args = types.SimpleNamespace(model="DG_AE", type="mig")
    for thin in (True, False):
        tr = Trainer(args, cfg, training_id=f"tw_{tag}_{thin}",
                     save_dir="/tmp/exp_thinwire", lr=1e-4, batch_size=bs,
                     distributed=False, seed=3, split=split, thin_wire=thin)
        tr.train(4, ds, ds[:bs])  # compiles + dims running-max convergence
        best = 1e9
        for _ in range(5):  # per-epoch timing, best-of (late recompiles skew means)
            t0 = time.perf_counter()
            m = tr.train(1, ds, ds[:bs])
            best = min(best, time.perf_counter() - t0)
        steps = len(ds) // bs
        gps = steps * bs / best
        assert np.isfinite(m["recon"]), f"{tag} thin={thin}: non-finite recon"
        log(f"[{tag} thin={thin}] split={tr._split} best epoch {best:.2f}s -> "
            f"{gps:.0f} g/s e2e (recon {m['recon']:.4f})")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    setup_cache()
    if which in ("step", "all"):
        bench_step()
    if which in ("e2e16", "all"):
        bench_e2e(16, 0, "bs16")
    if which in ("e2e64", "all"):
        bench_e2e(64, "auto", "bs64split")


if __name__ == "__main__":
    main()
