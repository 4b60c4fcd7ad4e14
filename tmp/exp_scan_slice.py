"""Isolate the multi-step scan's per-iteration cost: same-batch closure vs
xs-sliced batches vs arena-sliced (1 slice + fused unpack)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import make_optimizer, loss_and_metrics, METRIC_KEYS
import optax

K = 8
rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(16)]
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
batch = jax.tree.map(jnp.asarray, collate(graphs))
opt = make_optimizer(1e-4)
w = jnp.asarray([1.0,4.0,2.0,0.0])
rngs = jax.random.split(jax.random.PRNGKey(1), K)
sbatch = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,)+x.shape), batch)

def step(p, s, o, b, r):
    grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
    (_, (ns, m)), grads = grad_fn(p, s, b, r, w, cfg, True)
    updates, o = opt.update(grads, o, p)
    p = optax.apply_updates(p, updates)
    return p, s | ns, o, jnp.stack([m[k] for k in METRIC_KEYS])

def scan_same(params, state, opt_state, rngs):
    def body(carry, r):
        p, s, o = carry
        p, s, o, m9 = step(p, s, o, batch, r)
        return (p, s, o), m9
    (p, s, o), ms = jax.lax.scan(body, (params, state, opt_state), rngs)
    return p, s, o, ms

def scan_xs(params, state, opt_state, sbatch, rngs):
    def body(carry, xs):
        p, s, o = carry
        b, r = xs
        p, s, o, m9 = step(p, s, o, b, r)
        return (p, s, o), m9
    (p, s, o), ms = jax.lax.scan(body, (params, state, opt_state), (sbatch, rngs))
    return p, s, o, ms

def run(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); v = float(out[3][-1,0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args); v = float(out[3][-1,0])
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best*1e3:.1f} ms total -> {best/K*1e3:.2f} ms/step", file=sys.stderr, flush=True)

run("scan same-batch (closure)", scan_same, params, state, opt.init(params), rngs)
run("scan xs-sliced batches   ", scan_xs, params, state, opt.init(params), sbatch, rngs)
