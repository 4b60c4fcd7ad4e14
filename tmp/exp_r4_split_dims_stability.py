"""Host-side probe: does the stratified split layout's running dims max
ever grow after the first epoch?  Every growth event = one remote recompile
(20s-5min tunneled), which is what turned tmp/exp_r4_split_e2e.py's measured
window from ~2.4s into 21.2s.  Pure host work — runs on CPU in seconds.

  python tmp/exp_r4_split_dims_stability.py
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig
from mgvae_tpu.train.trainer import Trainer


def main():
    rng = np.random.default_rng(7)
    ds = [random_circuit(rng, "mig", num_inputs=int(rng.integers(6, 14)),
                         num_gates=int(rng.integers(60, 420)), num_tt_pairs=64)
          for _ in range(512)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    args = types.SimpleNamespace(model="DG_AE", type="mig")
    tr = Trainer(args, cfg, training_id="dims_stab", save_dir="/tmp/dims_stab",
                 lr=1e-4, batch_size=64, distributed=False, seed=3, split=4)

    prev = None
    grow_events = 0
    for ep in range(30):
        idx, n_steps, step_graphs, dims, chunks = tr._epoch_plan(ds, shuffle=True)
        assert isinstance(dims, list), f"split dims expected, got {type(dims)}"
        key = tuple(tuple(sorted(d.items())) for d in dims)
        if prev is not None and key != prev:
            grow_events += 1
            for g, (dn, dp) in enumerate(zip(dims, prev_dims)):
                diff = {k: (dp_v, dn[k]) for k, dp_v in dp.items() if dn[k] != dp_v}
                if diff:
                    print(f"  epoch {ep}: group {g} grew {diff}")
        prev = key
        prev_dims = [dict(d) for d in dims]
    print(f"layout={tr._split_layout} split={tr._split} "
          f"growth events after epoch 0: {grow_events}")
    print("final dims:")
    for g, d in enumerate(prev_dims):
        print(f"  g{g}: {d}")


if __name__ == "__main__":
    main()
