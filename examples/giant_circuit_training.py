"""Training a single circuit BIGGER than VMEM: the chip-scale path.

A ~102k-node layered circuit (width 512 x depth 200) cannot hold its hf
state in VMEM, so the level recurrence runs the HBM-streaming Pallas kernel
(ops/pallas/level_kernel.fused_level_scan_hbm): hf lives in HBM and each
level's gather/scatter DMA-streams double-buffered chunks through VMEM.
Training works too — the hand-written backward streams hf AND the ghf
cotangent the same way (pallas_level_scan_hbm, f32).

This is the scaling answer to the reference's serial per-level loop
(DG_VAE/deepgate/dg_ae_model_mig.py:85-129), which at this size walks
~200 python-level iterations per forward on one GPU.

Measured on the real chip (round 3): N=102,912 / E=205,273 / 201 levels,
full train step (3 losses + backward + Adam) ~400 ms (~27 ms of that is
the tunnel sync), loss decreasing from the first step.

Run on the TPU host:  python examples/giant_circuit_training.py [depth]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import layered_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import make_optimizer, make_train_step

depth = int(_sys.argv[1]) if len(_sys.argv) > 1 else 200
rng = np.random.default_rng(0)
print(f"generating layered circuit: width 512 x depth {depth} ...", flush=True)
g = layered_circuit(rng, "mig", width=512, depth=depth, num_tt_pairs=512)
print(f"nodes {g.num_nodes}  edges {g.num_edges}  levels {g.num_levels}")

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
optimizer = make_optimizer(1e-4)
opt_state = optimizer.init(params)
train_step, _ = make_train_step(cfg, optimizer)

batch = jax.tree.map(jnp.asarray, collate([g]))
n = batch["gate"].shape[0]
print(f"padded nodes {n} ({n * cfg.dim_hidden * 4 / 1e6:.1f} MB hf) — "
      f"HBM-streamed kernel engages above the VMEM gate", flush=True)

weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
t_last = None
for step in range(4):
    t0 = time.perf_counter()
    params, state, opt_state, m = train_step(
        params, state, opt_state, batch, jax.random.PRNGKey(step), weights
    )
    loss = float(m["loss"])  # forces the sync (block_until_ready lies here)
    t_last = time.perf_counter() - t0
    tag = " (compile)" if step == 0 else ""
    print(f"step {step}: loss {loss:.4f} recon {float(m['recon_loss']):.4f} "
          f"[{t_last*1e3:.0f} ms]{tag}", flush=True)
print(f"train step at N={g.num_nodes}: ~{t_last*1e3:.0f} ms (incl. ~27 ms sync)")
