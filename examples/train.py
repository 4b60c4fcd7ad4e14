"""Two-stage training example (parity with DG_VAE/examples/train.py, with
the stale arg names fixed and a synthetic-dataset fallback)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import types

import numpy as np

import deepgate

DATA_DIR = os.environ.get("DATA_DIR", "")

if __name__ == "__main__":
    num_epochs = int(os.environ.get("EPOCHS", "2"))

    print("[INFO] Parse Dataset")
    if DATA_DIR:
        circuit_path = os.path.join(DATA_DIR, "graphs.npz")
        parser = deepgate.NpzParser(DATA_DIR, circuit_path, circuit_path, "aig")
        train_dataset, val_dataset = parser.get_dataset()
    else:
        import mgvae_tpu

        rng = np.random.default_rng(0)
        graphs = [
            mgvae_tpu.random_circuit(rng, "aig", num_inputs=8, num_gates=64)
            for _ in range(32)
        ]
        train_dataset, val_dataset = graphs[:28], graphs[28:]

    print("[INFO] Create Model and Trainer")
    cfg = deepgate.DGConfig(modality="aig", dim_hidden=64)
    trainer = deepgate.Trainer(types.SimpleNamespace(model="DG_AE"), cfg, batch_size=4, distributed=True)

    print("[INFO] Stage 1 Training ...")
    trainer.set_training_args(rc_prob_func_weight=[3.0, 1.0, 0.0], lr=1e-4, lr_step=50)
    trainer.train(num_epochs, train_dataset, val_dataset)

    print("[INFO] Stage 2 Training ...")
    trainer.set_training_args(rc_prob_func_weight=[3.0, 1.0, 2.0], lr=1e-4, lr_step=50)
    trainer.train(num_epochs, train_dataset, val_dataset)
