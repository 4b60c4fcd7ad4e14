"""Honest (v2) bf16 vs f32 comparison: full train step scanned over K
distinct batches; roundtrip subtracted."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate, chunked_shard_dims
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import make_multi_step, make_optimizer

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

f0 = jax.jit(lambda x: x.sum()); float(f0(jnp.zeros(8)))
ts=[]
for _ in range(5):
    t0=time.perf_counter(); float(f0(jnp.zeros(8))); ts.append(time.perf_counter()-t0)
rt = min(ts)

opt = make_optimizer(1e-4)
w = jnp.asarray([1.0,4.0,2.0,0.0])
rngs = jax.random.split(jax.random.PRNGKey(1), K)

for dtype in ("float32", "bfloat16"):
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True, compute_dtype=dtype)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    multi = make_multi_step(cfg, opt, None, donate=False)
    opt_state = opt.init(params)
    out = multi(params, state, opt_state, sbatch, rngs, w)
    float(out[3][-1,0])
    best=1e9
    for _ in range(5):
        t0=time.perf_counter()
        out = multi(params, state, opt_state, sbatch, rngs, w)
        float(out[3][-1,0]); best=min(best, time.perf_counter()-t0)
    print(f"{dtype}: {(best-rt)/K*1e3:6.2f} ms/step", file=sys.stderr, flush=True)
