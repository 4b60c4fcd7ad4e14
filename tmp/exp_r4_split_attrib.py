"""Attribute the split-vs-chunked e2e delta: per-dispatch host times via
Trainer.step_times for both arms (warm cache; fresh process; TPU)."""
import os, sys, time, types
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    rng = np.random.default_rng(7)
    ds = [random_circuit(rng, "mig", num_inputs=int(rng.integers(6, 14)),
                         num_gates=int(rng.integers(60, 420)), num_tt_pairs=64)
          for _ in range(512)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    args = types.SimpleNamespace(model="DG_AE", type="mig")

    for label, split in (("split-auto", "auto"), ("chunked", 0)):
        tr = Trainer(args, cfg, training_id=f"at_{label}",
                     save_dir="/tmp/exp_split_at", lr=1e-4,
                     batch_size=64, distributed=False, seed=3, split=split)
        tr.train(2, ds, ds[:64])          # warmup epochs pay compiles
        tr.step_times = times = []
        t0 = time.perf_counter()
        tr.train(20, ds, ds[:64])
        dt = time.perf_counter() - t0
        tt = {}
        for kind, sd, d in times:
            tt.setdefault(kind, []).append(d)
        parts = {k: (len(v), sum(v), max(v)) for k, v in tt.items()}
        print(f"[{label}] split={tr._split} chunks={tr._chunks} 20 epochs {dt:.2f}s")
        for k, (n, s, mx) in sorted(parts.items()):
            print(f"    {k:14s} n={n:3d} total={s:7.3f}s max={mx*1000:7.1f}ms")
        acc = sum(s for _, s, _ in parts.values())
        print(f"    accounted {acc:.2f}s of {dt:.2f}s (rest = collate/prefetch/log)")


if __name__ == "__main__":
    main()
