"""Resume training from exp/<id>/model_last.pth (parity with
DG_VAE/examples/resume.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import types

import numpy as np

import deepgate
import mgvae_tpu

if __name__ == "__main__":
    rng = np.random.default_rng(0)
    graphs = [mgvae_tpu.random_circuit(rng, "mig", num_inputs=8, num_gates=64) for _ in range(32)]
    cfg = deepgate.DGConfig(modality="mig", dim_hidden=64)
    trainer = deepgate.Trainer(
        types.SimpleNamespace(model="DG_AE"), cfg, training_id="resume_demo", batch_size=4, distributed=False
    )
    if trainer.resume():
        print("[INFO] Resumed from", os.path.join(trainer.log_dir, "model_last.pth"))
    trainer.set_training_args(rc_prob_func_weight=[1.0, 4.0, 2.0], lr=1e-4, lr_step=50)
    trainer.train(int(os.environ.get("EPOCHS", "1")), graphs[:28], graphs[28:])
    trainer.save(os.path.join(trainer.log_dir, "model_last.pth"))
