"""Is there a fixed per-iteration cost in scan on this platform? Empty body
vs tiny body vs struct-with-fewer-rounds."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate, chunked_shard_dims
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params, struct_input
from mgvae_tpu.models.encoder import direct_multigcn_apply, multigcn_apply

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

def run(name, outer, *args):
    f = jax.jit(outer)
    out = f(*args); float(np.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args); float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best/K*1e3:6.2f} ms/step ({best*1e3:.1f} total)", file=sys.stderr, flush=True)

def empty(sbatch):
    def body(acc, b):
        return acc + b["gate"][0].astype(jnp.float32), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

def tiny(sbatch):
    def body(acc, b):
        return acc + b["node_valid"].astype(jnp.float32).sum(), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

def one_tower_1round(params, sbatch):
    def body(acc, b):
        x = struct_input(b["gate"], cfg, jnp.float32)
        s = multigcn_apply(params["struct"]["source"], x, b, 1, cfg.layernorm)
        return acc + s.sum(), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

def one_tower_4round(params, sbatch):
    def body(acc, b):
        x = struct_input(b["gate"], cfg, jnp.float32)
        s = multigcn_apply(params["struct"]["source"], x, b, 4, cfg.layernorm)
        return acc + s.sum(), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

run("empty body          ", empty, sbatch)
run("tiny body           ", tiny, sbatch)
run("1 tower x 1 round   ", one_tower_1round, params, sbatch)
run("1 tower x 4 rounds  ", one_tower_4round, params, sbatch)
