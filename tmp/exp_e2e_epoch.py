"""End-to-end Trainer epoch throughput on the real chip (bs16 MIG,
fixed-dims, prefetch overlap): graphs/sec including ALL host work."""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main():
    import jax

    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n = 512
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(n)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    tr = Trainer(None, cfg, batch_size=16, distributed=False, save_dir="/tmp/e2e_exp")
    # warmup epoch (compiles)
    t0 = time.perf_counter()
    tr.train(1, graphs, graphs[:16])
    print(f"epoch 0 (compile): {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    for ep in range(3):
        t0 = time.perf_counter()
        tr.train(1, graphs, graphs[:16])
        dt = time.perf_counter() - t0
        print(f"epoch {ep + 1}: {dt:.2f}s -> {n / dt:.0f} graphs/s (train+val, all host work)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
