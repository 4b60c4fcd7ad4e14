"""Large-batch training through the chunked fused kernel.

A big batch is C disjoint sub-batches (data/batching.collate_fit picks the
smallest C whose chunks fit the kernel's VMEM gate); the Pallas level kernel
then runs a (chunk, level) grid with a per-chunk VMEM-resident state and its
hand-written VJP — constant VMEM at any batch size, ~2.4x over the XLA scan
for bs64 gradient steps on a v5e chip.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mgvae_tpu.data.batching import collate_fit
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import make_optimizer, make_train_step

rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64)
          for _ in range(64)]

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
optimizer = make_optimizer(1e-4)
opt_state = optimizer.init(params)
train_step, _ = make_train_step(cfg, optimizer)

batch = jax.tree.map(jnp.asarray, collate_fit(graphs))
C = batch["lv_nodes"].shape[0] if batch["lv_nodes"].ndim == 3 else 1
print(f"bs{len(graphs)} collated as {C} chunk(s) of "
      f"{batch['gate'].shape[0] // C} padded nodes")

weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
for step in range(5):
    params, state, opt_state, m = train_step(
        params, state, opt_state, batch, jax.random.PRNGKey(step), weights
    )
    print(f"step {step}: loss {float(m['loss']):.4f} recon {float(m['recon_loss']):.4f}")
