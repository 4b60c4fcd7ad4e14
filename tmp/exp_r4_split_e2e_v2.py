"""On-chip e2e epoch throughput: split-trainer vs chunked-trainer at bs64.

The device-step bench already proved split(G=4) 3678 g/s beats chunked C=3
3219 (tmp/r4_onchip/bench.log). This measures the TRAINER e2e (host collate
+ packed transfer + prefetch + dispatch) for the same comparison, deciding
whether split becomes the default bs64 path end-to-end.

Run on the TPU host, fresh process, NOTHING else running:
  python tmp/exp_r4_split_e2e.py
"""
import os
import sys
import time
import types

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
    # same population as bench.make_dataset("mig", ...): varied sizes
    ds = [random_circuit(rng, "mig", num_inputs=int(rng.integers(6, 14)),
                         num_gates=int(rng.integers(60, 420)), num_tt_pairs=64)
          for _ in range(512)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    args = types.SimpleNamespace(model="DG_AE", type="mig")

    for label, split in (("split-auto", "auto"), ("chunked", 0)):
        tr = Trainer(args, cfg, training_id=f"e2e_{label}",
                     save_dir="/tmp/exp_split_e2e", lr=1e-4,
                     batch_size=64, distributed=False, seed=3, split=split)
        # epoch 0 pays compiles; epochs 1-3 measured
        tr.train(2, ds, ds[:64])
        t0 = time.perf_counter()
        m = tr.train(8, ds, ds[:64])
        dt = time.perf_counter() - t0
        steps = (len(ds) // 64) * 8
        gps = steps * 64 / dt
        print(f"[{label}] split={tr._split} chunks={tr._chunks} "
              f"3 train epochs {dt:.2f}s -> {gps:.0f} g/s e2e "
              f"(recon {m['recon']:.4f})")
        assert np.isfinite(m["recon"]), f"{label}: non-finite recon"


if __name__ == "__main__":
    main()
