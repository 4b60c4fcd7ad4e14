"""Which cotangent pattern triggers the chunked-kernel bwd NaN on chip?"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate_fit
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
from mgvae_tpu.train import losses as L

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
r = np.random.default_rng(0)
graphs = [random_circuit(r, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(64)]
bc = jax.tree.map(jnp.asarray, collate_fit(graphs))
key = jax.random.PRNGKey(0)

def check(tag, loss_fn):
    @jax.jit
    def g(p):
        return jax.grad(loss_fn)(p)
    gg = g(params)
    n_nan = sum(int(jnp.isnan(v).sum()) for v in jax.tree.leaves(gg))
    print(f"[{tag}] nan={n_nan}", file=sys.stderr, flush=True)

def fwd(p):
    hs, hf, _ = forward(p, bc, cfg, use_pallas=True)
    return hs, hf

check("unmasked hf^2", lambda p: (fwd(p)[1] ** 2).sum())
check("recon only   ", lambda p: L.recon_loss(p, fwd(p)[0], bc, key)[0])
check("prob only    ", lambda p: L.prob_loss(p, state, fwd(p)[1], bc, train=True, rng=key)[0])
check("func only    ", lambda p: L.func_loss(fwd(p)[1], bc))
