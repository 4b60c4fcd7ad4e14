import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate_fit
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import loss_and_metrics
import mgvae_tpu.train.step as S

mode = sys.argv[1]
if mode == "xla":
    S._auto_pallas = lambda batch, cfg: False

rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(64)]
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
batch = jax.tree.map(jnp.asarray, collate_fit(graphs))
w = jnp.asarray([1.0, 4.0, 2.0, 0.0])

@jax.jit
def grads(p):
    g = jax.grad(lambda p: loss_and_metrics(p, state, batch, jax.random.PRNGKey(0), w, cfg, True)[0])(p)
    return g

g = grads(params)
flat = jax.tree_util.tree_flatten_with_path(g)[0]
bad = [(jax.tree_util.keystr(k), int(jnp.isnan(v).sum()), float(jnp.abs(v).max())) for k, v in flat]
for k, n, mx in bad:
    if n or not np.isfinite(mx) or mx > 1e4:
        print(f"[{mode}] {k}: nans={n} absmax={mx:.3e}", file=sys.stderr, flush=True)
print(f"[{mode}] total nan params:", sum(n for _, n, _ in bad), file=sys.stderr, flush=True)
