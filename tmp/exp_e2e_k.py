"""K-sweep: e2e Trainer epoch throughput (train only, no val) on the chip.
Usage: python tmp/exp_e2e_k.py <K>"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main():
    import jax

    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    n = 2048
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(n)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    tr = Trainer(None, cfg, batch_size=16, distributed=False,
                 save_dir="/tmp/e2e_exp", steps_per_call=K)
    t0 = time.perf_counter()
    tr.train(1, graphs, [])
    print(f"K={K} epoch 0 (compile): {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    best = 1e9
    for ep in range(4):
        t0 = time.perf_counter()
        tr.train(1, graphs, [])
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"K={K} epoch {ep + 1}: {dt:.2f}s -> {n / dt:.0f} g/s", file=sys.stderr)
    print(f"K={K} BEST {n / best:.0f} g/s ({best / (n // 16) * 1e3:.1f} ms/step)", file=sys.stderr)


if __name__ == "__main__":
    main()
