"""On-chip NaN matrix: chunked kernel VJP at various (C, size) configs."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate_chunked
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, _ = init_params(jax.random.PRNGKey(0), cfg)

def check(tag, n_graphs, gates, C):
    r = np.random.default_rng(1)
    graphs = [random_circuit(r, "mig", num_inputs=8, num_gates=gates, num_tt_pairs=16) for _ in range(n_graphs)]
    bc = jax.tree.map(jnp.asarray, collate_chunked(graphs, C))
    @jax.jit
    def g(p):
        def loss(p):
            hs, hf, _ = forward(p, bc, cfg, use_pallas=True)
            return jnp.sum(jnp.where(bc["node_valid"][:, None], hf, 0.0) ** 2) + hs.sum()*0
        return jax.grad(loss)(p)
    gg = g(params)
    n_nan = sum(int(jnp.isnan(v).sum()) for v in jax.tree.leaves(gg))
    print(f"[{tag}] C={C} graphs={n_graphs}x{gates}: nan={n_nan}", file=sys.stderr, flush=True)

check("small", 6, 30, 2)
check("small3", 6, 30, 3)
check("big2", 64, 264, 2)
check("big3", 64, 264, 3)
