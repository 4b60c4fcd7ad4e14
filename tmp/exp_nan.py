import sys
sys.path.insert(0, "/root/repo")
import os
import numpy as np, jax, jax.numpy as jnp
from mgvae_tpu.data.batching import collate_fit
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import make_optimizer, make_train_step

mode = sys.argv[1] if len(sys.argv) > 1 else "current"
if mode == "no_linear_call":
    import mgvae_tpu.models.encoder as E
    E._blocked_neighbor_sum_t = lambda state, fwd, rev: E.blocked_neighbor_sum(state, *fwd)
if mode == "no_stacked":
    import mgvae_tpu.models.encoder as E
    def seq(params, x_feat, batch, s_rounds, t_rounds, layernorm):
        s = E.multigcn_apply(params["source"], x_feat, batch, s_rounds, layernorm)
        t = E.multigcn_apply(params["target"], x_feat, batch, t_rounds, layernorm)
        return s, t
    E.direct_multigcn_apply = seq
    import mgvae_tpu.models.dg_ae as M
    M.direct_multigcn_apply = seq

rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(64)]
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
opt = make_optimizer(1e-4); opt_state = opt.init(params)
train_step, _ = make_train_step(cfg, opt)
batch = jax.tree.map(jnp.asarray, collate_fit(graphs))
w = jnp.asarray([1.0, 4.0, 2.0, 0.0])
for step in range(5):
    params, state, opt_state, m = train_step(params, state, opt_state, batch, jax.random.PRNGKey(step), w)
    print(f"[{mode}] step {step}: loss {float(m['loss']):.4f} recon {float(m['recon_loss']):.4f}", file=sys.stderr, flush=True)
