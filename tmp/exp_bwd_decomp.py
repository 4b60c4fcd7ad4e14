"""Hoist-proof backward decomposition: grad of struct-only vs level-only vs
full loss; roundtrip subtracted."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate, chunked_shard_dims
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params, struct_input, _level_scan_pallas
from mgvae_tpu.models.encoder import direct_multigcn_apply

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

# measured sync roundtrip
f0 = jax.jit(lambda x: x.sum()); float(f0(jnp.zeros(8)))
rt = min((lambda ts: ts)( [ (lambda t0: (float(f0(jnp.zeros(8))), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(5)] ))

def run(name, outer, *args):
    f = jax.jit(outer)
    out = f(*args); float(np.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args); float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {(best-rt)/K*1e3:6.2f} ms/step", file=sys.stderr, flush=True)

def grad_struct(params, sbatch):
    def body(acc, b):
        def loss(p):
            x = struct_input(b["gate"], cfg, jnp.float32)
            s, t = direct_multigcn_apply(p["struct"], x, b, cfg.s_rounds, cfg.t_rounds, cfg.layernorm)
            return (s * t).sum()
        g = jax.grad(loss)(params)
        return acc + sum(jnp.sum(x) for x in jax.tree.leaves(g["struct"])), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

def grad_level(params, sbatch):
    def body(acc, b):
        def loss(p):
            x = struct_input(b["gate"], cfg, jnp.float32)
            hs = jnp.tile(x, (1, cfg.dim_hidden // x.shape[1] + 1))[:, :cfg.dim_hidden] @ p["hs_linear"]["w"][:cfg.dim_hidden]
            expert = cfg.expert_of_gate[b["gate"]]
            hf = _level_scan_pallas(params={**p}, batch=b, cfg=cfg, hs=hs, expert=expert)
            return hf.sum()
        g = jax.grad(loss)(params)
        return acc + sum(jnp.sum(x) for x in jax.tree.leaves(g)), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

run("grad struct only  ", grad_struct, params, sbatch)
run("grad level (VJP)  ", grad_level, params, sbatch)
