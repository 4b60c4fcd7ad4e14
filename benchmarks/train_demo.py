"""Convergence demonstration: train DG_AE on all four modalities (synthetic
labeled circuits) and record per-stage losses to benchmarks/train_demo.json.

This is evidence that the full training loop (3-stage schedule, all three
losses, Adam, DP) optimizes correctly — complementing bench.py's throughput
number. Run on TPU: python benchmarks/train_demo.py
"""
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import mgvae_tpu
from mgvae_tpu.models.dg_ae import DGConfig

EPOCHS = int(os.environ.get("EPOCHS", "4"))
N_CIRCUITS = int(os.environ.get("N_CIRCUITS", "128"))


def main():
    results = {}
    for modality in ("aig", "mig", "xmg", "xag"):
        rng = np.random.default_rng(7)
        graphs = [
            mgvae_tpu.random_circuit(rng, modality, num_inputs=12, num_gates=148, num_tt_pairs=48)
            for _ in range(N_CIRCUITS)
        ]
        cut = int(N_CIRCUITS * 0.9)
        cfg = DGConfig(modality=modality, dim_hidden=64, layernorm=True)
        tr = mgvae_tpu.Trainer(
            types.SimpleNamespace(model="DG_AE"), cfg,
            training_id=f"demo_{modality}", save_dir="/tmp/train_demo",
            batch_size=16, distributed=False, lr=1e-4, seed=1,
        )
        tr.set_training_args(lr_step=50)
        stages = []
        for weights in ([1.0, 0.0, 0.0], [1.0, 5.0, 0.0], [1.0, 4.0, 4.0]):
            tr.set_training_args(rc_prob_func_weight=weights, lr=1e-4, lr_step=50)
            first = tr.train(1, graphs[:cut], graphs[cut:])
            for _ in range(EPOCHS - 1):
                last = tr.train(1, graphs[:cut], graphs[cut:])
            stages.append({
                "weights": weights,
                "first": {k: round(float(first[k]), 4) for k in ("recon", "prob", "func", "acc")},
                "last": {k: round(float(last[k]), 4) for k in ("recon", "prob", "func", "acc")},
            })
            print(f"[{modality}] stage {weights}: recon {first['recon']:.4f}->{last['recon']:.4f} "
                  f"prob {first['prob']:.4f}->{last['prob']:.4f} func {first['func']:.4f}->{last['func']:.4f} "
                  f"acc {last['acc']*100:.1f}%", flush=True)
        results[modality] = stages
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "train_demo.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
