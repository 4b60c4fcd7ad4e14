"""On-chip K (steps_per_call) re-sweep AFTER the thin wire landed.

Round-3 verdict was K=16 WORSE than K=8 (9.9 vs 6.9 ms/step e2e) — but that
was measured with the FULL wire (407 KB/step: a K=16 group = 6.5 MB, ~76 ms
on the ~85 MB/s tunnel, vs a 2-group-deep prefetch queue). The thin wire
cut the step to ~101 KB, so a K=16 group is now ~1.6 MB (~19 ms) — the
queue-fill argument may have flipped. Each dispatched call costs a ~27 ms
round trip, so K=8 -> 16 would save ~1.7 ms/step if transfer no longer
starves the queue.

Protocol (CLAUDE.md e2e A/B rule): 2048 graphs -> 128 steps/epoch at bs16,
warm >= 3 epochs per arm (dims running-max + compile), then INTERLEAVE the
timed epochs round-robin across arms and report per-arm medians.

Run on the TPU host, fresh process, nothing else running:
  python tmp/exp_r4_ksweep.py [bs16|bs64|all]
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


def make_ds(n=2048, seed=7):
    from mgvae_tpu.data.synthetic import random_circuit

    rng = np.random.default_rng(seed)
    return [random_circuit(rng, "mig", num_inputs=int(rng.integers(6, 14)),
                           num_gates=int(rng.integers(60, 420)), num_tt_pairs=64)
            for _ in range(n)]


def sweep(bs, split, tag, ks=(8, 16), epochs=5):
    import jax  # noqa: F401  (device contact before timing)

    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    # every arm keeps >= 128 steps/epoch (the e2e A/B rule: few steps/epoch
    # serializes epoch-boundary collate+wire vs device and biases the arm)
    ds = make_ds(n=max(2048, 128 * bs))
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    args = types.SimpleNamespace(model="DG_AE", type="mig")
    steps = len(ds) // bs
    arms = {}
    for K in ks:
        tr = Trainer(args, cfg, training_id=f"ks_{tag}_{K}",
                     save_dir="/tmp/exp_ksweep", lr=1e-4, batch_size=bs,
                     distributed=False, seed=3, split=split,
                     steps_per_call=K)
        t0 = time.perf_counter()
        tr.train(3, ds, ds[:bs])  # warm: compile + dims convergence
        log(f"[{tag} K={K}] warm 3 epochs in {time.perf_counter()-t0:.1f}s")
        arms[K] = (tr, [])
    for e in range(epochs):  # interleaved round-robin
        for K in ks:
            tr, ts = arms[K]
            t0 = time.perf_counter()
            m = tr.train(1, ds, ds[:bs])
            ts.append(time.perf_counter() - t0)
            assert np.isfinite(m["recon"]), f"K={K}: non-finite recon"
    for K in ks:
        _, ts = arms[K]
        med = float(np.median(ts))
        # NOTE: the timed epoch includes the val phase (one step on ds[:bs])
        # and the per-epoch checkpoint save but divides by TRAIN steps only —
        # absolute g/s is slightly conservative-biased; the A/B verdict is
        # unaffected (the overhead is identical across arms).
        log(f"[{tag} K={K}] epochs {['%.2f' % t for t in ts]} -> median "
            f"{med:.2f}s = {steps*bs/med:.0f} g/s e2e "
            f"({med/steps*1e3:.2f} ms/step; incl. val+ckpt overhead)")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "bs16"
    setup_cache()
    if which in ("bs16", "all"):
        sweep(16, 0, "bs16")
    if which in ("bs64", "all"):
        sweep(64, "auto", "bs64split", ks=(8, 16))


if __name__ == "__main__":
    main()
