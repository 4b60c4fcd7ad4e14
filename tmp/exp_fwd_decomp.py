"""Hoist-proof forward component split: struct encoder vs level scan, over
K distinct batches."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate, chunked_shard_dims
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params, struct_input, _level_scan_pallas, _level_scan_fast
from mgvae_tpu.models.encoder import direct_multigcn_apply
from mgvae_tpu.ops.init import linear_apply

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
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args); float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best/K*1e3:6.2f} ms/step", file=sys.stderr, flush=True)

def struct_only(params, sbatch):
    def body(acc, b):
        x = struct_input(b["gate"], cfg, jnp.float32)
        s, t = direct_multigcn_apply(params["struct"], x, b, cfg.s_rounds, cfg.t_rounds, cfg.layernorm)
        return acc + s.sum() + t.sum(), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

def level_only(params, sbatch):
    # hs from a cheap linear on features (avoids struct cost, keeps per-batch data dependence)
    def body(acc, b):
        x = struct_input(b["gate"], cfg, jnp.float32)
        n = b["gate"].shape[0]
        hs = jnp.tile(x, (1, cfg.dim_hidden // x.shape[1] + 1))[:, :cfg.dim_hidden]
        expert = cfg.expert_of_gate[b["gate"]]
        hf = _level_scan_pallas(params, b, cfg, hs, expert)
        return acc + hf.sum(), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

def level_xla(params, sbatch):
    def body(acc, b):
        x = struct_input(b["gate"], cfg, jnp.float32)
        hs = jnp.tile(x, (1, cfg.dim_hidden // x.shape[1] + 1))[:, :cfg.dim_hidden]
        expert = cfg.expert_of_gate[b["gate"]]
        hf = _level_scan_fast(params, b, cfg, hs, expert)
        return acc + hf.sum(), ()
    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

run("struct encoder only ", struct_only, params, sbatch)
run("level scan (pallas) ", level_only, params, sbatch)
run("level scan (xla)    ", level_xla, params, sbatch)
