"""Data-parallel embedding extraction across all four modalities
(BASELINE.json config #5): one jitted forward per modality, batches sharded
over the dp mesh."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import mgvae_tpu
from mgvae_tpu.data.batching import collate
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for modality in ("aig", "mig", "xmg", "xag"):
        cfg = DGConfig(modality=modality, dim_hidden=64, layernorm=True)
        params, _ = init_params(jax.random.PRNGKey(0), cfg)
        graphs = [mgvae_tpu.random_circuit(rng, modality, num_inputs=8, num_gates=96) for _ in range(16)]
        batch = jax.tree.map(jnp.asarray, collate(graphs))
        hs, hf, _ = jax.jit(lambda p, b: forward(p, b, cfg))(params, batch)
        n = int(batch["n_nodes"])
        print(f"{modality}: hs {hs[:n].shape} hf {hf[:n].shape} "
              f"|hf| mean {float(jnp.abs(hf[:n]).mean()):.4f}")
