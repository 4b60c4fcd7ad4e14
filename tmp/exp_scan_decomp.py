"""Hoist-proof decomposition of the true per-step cost: scan over K DISTINCT
batches, stage by stage (fwd / fwd+losses / grad / full step)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
from mgvae_tpu.train.step import make_optimizer, loss_and_metrics, METRIC_KEYS
from mgvae_tpu.train import losses as L
import optax

K = 8
rng = np.random.default_rng(0)
def mkbatch(seed):
    r = np.random.default_rng(seed)
    gs = [random_circuit(r, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(16)]
    return collate(gs)
def mkgraphs(seed):
    r = np.random.default_rng(seed)
    return [random_circuit(r, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(16)]
from mgvae_tpu.data.batching import chunked_shard_dims
all_graphs = [mkgraphs(1+i) for i in range(K)]
dmaxs = [chunked_shard_dims(g, 1) for g in all_graphs]
dims = {k: max(d[k] for d in dmaxs) for k in dmaxs[0]}
batches = [collate(g, dims=dims) for g in all_graphs]
sb = {k: np.stack([np.asarray(b[k]) for b in batches]) for k in batches[0]}
sbatch = jax.tree.map(jnp.asarray, sb)
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
opt = make_optimizer(1e-4)
w = jnp.asarray([1.0,4.0,2.0,0.0])
rngs = jax.random.split(jax.random.PRNGKey(1), K)

def scan_over(fn, init):
    def outer(params, state, opt_state, sbatch, rngs):
        def body(carry, xs):
            return fn(carry, xs)
        return jax.lax.scan(body, init(params, state, opt_state), (sbatch, rngs))
    return outer

def run(name, outer, *args):
    f = jax.jit(outer)
    out = f(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best/K*1e3:6.2f} ms/step", file=sys.stderr, flush=True)

# A: fwd only (accumulate hf sum so nothing is DCE'd)
def A(params, state, opt_state, sbatch, rngs):
    def body(acc, xs):
        b, r = xs
        hs, hf, _ = forward(params, b, cfg, use_pallas=True)
        return acc + hf.sum() + hs.sum(), ()
    return jax.lax.scan(body, jnp.zeros(()), (sbatch, rngs))[0]

# B: fwd + all losses (no grad)
def B(params, state, opt_state, sbatch, rngs):
    def body(acc, xs):
        b, r = xs
        tot, (ns, m) = loss_and_metrics(params, state, b, r, w, cfg, True)
        return acc + tot, ()
    return jax.lax.scan(body, jnp.zeros(()), (sbatch, rngs))[0]

# C: grad of full loss (carry params grads accumulated; no adam)
def C(params, state, opt_state, sbatch, rngs):
    def body(acc, xs):
        b, r = xs
        g = jax.grad(lambda p: loss_and_metrics(p, state, b, r, w, cfg, True)[0])(params)
        return acc + g["hs_linear"]["b"].sum() + sum(jnp.sum(x) for x in jax.tree.leaves(g)), ()
    return jax.lax.scan(body, jnp.zeros(()), (sbatch, rngs))[0]

# D: full step (params/opt carried)
def D(params, state, opt_state, sbatch, rngs):
    def body(carry, xs):
        p, s, o = carry
        b, r = xs
        grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
        (_, (ns, m)), grads = grad_fn(p, s, b, r, w, cfg, True)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, s | ns, o), jnp.stack([m[k] for k in METRIC_KEYS])
    return jax.lax.scan(body, (params, state, opt_state), (sbatch, rngs))[1]

run("A fwd only          ", A, params, state, opt.init(params), sbatch, rngs)
run("B fwd+losses        ", B, params, state, opt.init(params), sbatch, rngs)
run("C grad full loss    ", C, params, state, opt.init(params), sbatch, rngs)
run("D full step         ", D, params, state, opt.init(params), sbatch, rngs)
