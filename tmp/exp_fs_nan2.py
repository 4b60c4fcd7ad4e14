"""Probe stage-2 divergence: per-step logit ranges / update norms, and the
failing batch evaluated with the pre-update stage-1 params."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax, jax.numpy as jnp
import optax
jax.config.update("jax_platforms", "cpu")

from benchmarks.full_schedule import gen_graphs
from mgvae_tpu.models.dg_ae import DGConfig, forward, hs_decompose
from mgvae_tpu.train.trainer import Trainer
from mgvae_tpu.train.step import loss_and_metrics

graphs = gen_graphs("mig", 256, seed=11)
cfg = DGConfig(modality="mig", layernorm=True)
tr = Trainer(None, cfg, training_id="nanrepro", save_dir="/tmp/nanrepro",
             batch_size=16, distributed=False, seed=7, log_every=10**9)
tr.load("/tmp/fs_mig/exp/fs/stage_1.pth")
params0 = jax.tree.map(lambda x: x.copy(), tr.params)
tr.set_training_args(rc_prob_func_weight=[1.0, 5.0, 0.0], lr=1e-4, lr_step=50)
weights = tr.weights

grad_fn = jax.jit(jax.value_and_grad(loss_and_metrics, has_aux=True),
                  static_argnums=(5, 6))


def gmax(t):
    return max(float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(t))


def probe(params, state, batch, rng, tag):
    hs, hf, aux = forward(params, batch, cfg, rng=None, use_pallas=False)
    s, t = hs_decompose(params, hs)
    ev = batch["edge_valid"]
    pos_logit = jnp.sum(s[batch["edge_src"]] * t[batch["edge_dst"]], axis=-1)
    pl = jnp.where(ev, pos_logit, 0.0)
    print(f"  [{tag}] hs_max {float(jnp.max(jnp.abs(hs))):.3g} "
          f"hf_max {float(jnp.max(jnp.abs(hf))):.3g} "
          f"pos_logit [{float(jnp.min(pl)):.3g},{float(jnp.max(pl)):.3g}] "
          f"s_max {float(jnp.max(jnp.abs(s))):.3g}")


tr._rng, epoch_key = jax.random.split(tr._rng)
saved = []
step = 0
for kind, item in tr._iter_grouped(graphs, False):
    batch = tr._to_device(item)
    rng = jax.random.fold_in(epoch_key, step)
    (total, (new_state, metrics)), grads = grad_fn(
        tr.params, tr.state, batch, rng, weights, cfg, True)
    finite = np.isfinite(float(total))
    print(f"step {step}: total={float(total):.4g} "
          f"recon={float(metrics['recon_loss']):.4g} "
          f"prob={float(metrics['prob_loss']):.4g} "
          f"grad_max={gmax(grads):.4g} param_max={gmax(tr.params):.4g}")
    probe(tr.params, tr.state, batch, rng, "cur params")
    if not finite:
        probe(params0, tr.state, batch, rng, "stage1 params")
        # which recon term?
        from mgvae_tpu.train.losses import recon_loss, sample_negative_edges, EPS, masked_mean
        k_vae, k_neg, k_drop = jax.random.split(rng, 3)
        hs, hf, aux = forward(tr.params, batch, cfg, rng=None, use_pallas=False)
        s, t = hs_decompose(tr.params, hs)
        from mgvae_tpu.models.encoder import gather_rows_t
        s_e = gather_rows_t(s, batch["edge_src"],
                            (batch["ra_eid"], batch["ra_slot"], batch["ra_valid"]))
        t_e = gather_rows_t(t, batch["edge_dst"],
                            (batch["fa_eid"], batch["fa_slot"], batch["fa_valid"]))
        pos_pred = jax.nn.sigmoid(jnp.sum(s_e * t_e, axis=-1))
        ev = batch["edge_valid"]
        print("  pos_pred min at valid:",
              float(jnp.min(jnp.where(ev, pos_pred, 1.0))))
        neg_src, neg_dst = sample_negative_edges(k_neg, batch["edge_src"].shape[0], batch)
        from mgvae_tpu.models.dg_ae import decode_edges
        neg_pred = decode_edges(s, t, neg_src, neg_dst)
        print("  neg_pred max at valid:",
              float(jnp.max(jnp.where(ev, neg_pred, 0.0))))
        print("  pos term:", float(masked_mean(-jnp.log(pos_pred + EPS), ev,
              jnp.maximum(batch["n_edges"].astype(hs.dtype), 1.0))))
        print("  neg term:", float(masked_mean(-jnp.log(1.0 - neg_pred + EPS), ev,
              jnp.maximum(batch["n_edges"].astype(hs.dtype), 1.0))))
        break
    updates, tr.opt_state = tr.optimizer.update(grads, tr.opt_state, tr.params)
    print(f"  update_max={gmax(updates):.4g}")
    tr.params = optax.apply_updates(tr.params, updates)
    tr.state = tr.state | new_state
    step += 1
    if step > 8:
        break
