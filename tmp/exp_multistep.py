import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import make_optimizer, loss_and_metrics
import optax

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(16)]
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
batch = jax.tree.map(jnp.asarray, collate(graphs))
opt = make_optimizer(1e-4); opt_state = opt.init(params)
w = jnp.asarray([1.0,4.0,2.0,0.0])
sbatch = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,)+x.shape), batch)
rngs = jax.random.split(jax.random.PRNGKey(1), K)

def multi(params, state, opt_state, sbatch, rngs, weights):
    def body(carry, xs):
        p, s, o = carry
        b, r = xs
        grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
        (_, (ns, m)), grads = grad_fn(p, s, b, r, weights, cfg, True)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        m9 = jnp.stack([m[k] for k in ("recon_loss","prob_loss","func_loss","kl_loss","tp","fp","tn","fn","n_pred")])
        return (p, s | ns, o), m9
    (p, s, o), ms = jax.lax.scan(body, (params, state, opt_state), (sbatch, rngs))
    return p, s, o, ms

mj = jax.jit(multi, donate_argnums=(0,1,2))
t0=time.perf_counter()
p, s, o, ms = mj(params, state, opt_state, sbatch, rngs, w)
print("compile+run:", round(time.perf_counter()-t0,1), "s; last loss", float(ms[-1,0]+ms[-1,1]+ms[-1,2]), flush=True)
for _ in range(3):
    t0=time.perf_counter()
    p, s, o, ms = mj(p, s, o, sbatch, rngs, w)
    v = float(ms[-1,0])
    dt = time.perf_counter()-t0
    print(f"K={K} steps in one dispatch: {dt*1e3:.1f} ms -> {dt/K*1e3:.2f} ms/step", flush=True)
