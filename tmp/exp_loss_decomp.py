"""Hoist-proof loss-gradient decomposition at MIG bs16: which loss's bwd
costs what. Roundtrip subtracted."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate, chunked_shard_dims
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params, forward
from mgvae_tpu.train import losses as L

K = 8
def mkgraphs(seed):
    r = np.random.default_rng(seed)
    return [random_circuit(r, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(16)]
all_graphs = [mkgraphs(1+i) for i in range(K)]
dmaxs = [chunked_shard_dims(g, 1) for g in all_graphs]
dims = {k: max(d[k] for d in dmaxs) for k in dmaxs[0]}
batches = [collate(g, dims=dims) for g in all_graphs]
sb = {k: np.stack([np.asarray(b[k]) for b in batches]) for k in batches[0]}
sbatch = jax.tree.map(jnp.asarray, sb)
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
key = jax.random.PRNGKey(1)

f0 = jax.jit(lambda x: x.sum()); float(f0(jnp.zeros(8)))
ts=[]
for _ in range(5):
    t0=time.perf_counter(); float(f0(jnp.zeros(8))); ts.append(time.perf_counter()-t0)
rt = min(ts)

def run(name, loss_fn):
    def outer(params, sbatch):
        def body(acc, b):
            g = jax.grad(lambda p: loss_fn(p, b))(params)
            return acc + sum(jnp.sum(x) for x in jax.tree.leaves(g)), ()
        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]
    f = jax.jit(outer)
    out = f(params, sbatch); float(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); float(f(params, sbatch)); best = min(best, time.perf_counter()-t0)
    print(f"{name}: {(best-rt)/K*1e3:6.2f} ms/step", file=sys.stderr, flush=True)

def base(p, b):
    hs, hf, _ = forward(p, b, cfg, use_pallas=True)
    return (hs * jnp.cos(hf)).sum() * 1e-6

def with_recon(p, b):
    hs, hf, _ = forward(p, b, cfg, use_pallas=True)
    rc, _ = L.recon_loss(p, hs, b, key)
    return rc + (hs * jnp.cos(hf)).sum() * 1e-6

def with_prob(p, b):
    hs, hf, _ = forward(p, b, cfg, use_pallas=True)
    pl, _ = L.prob_loss(p, state, hf, b, train=True, rng=key)
    return pl + (hs * jnp.cos(hf)).sum() * 1e-6

def with_func(p, b):
    hs, hf, _ = forward(p, b, cfg, use_pallas=True)
    fl = L.func_loss(hf, b)
    return fl + (hs * jnp.cos(hf)).sum() * 1e-6

run("grad model only    ", base)
run("  +recon           ", with_recon)
run("  +prob            ", with_prob)
run("  +func            ", with_func)
