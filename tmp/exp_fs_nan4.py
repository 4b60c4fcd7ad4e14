"""Post-fix check: stage-2 start stays finite and recon recovers."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import optax
jax.config.update("jax_platforms", "cpu")

from benchmarks.full_schedule import gen_graphs
from mgvae_tpu.models.dg_ae import DGConfig
from mgvae_tpu.train.trainer import Trainer
from mgvae_tpu.train.step import loss_and_metrics

graphs = gen_graphs("mig", 256, seed=11)
cfg = DGConfig(modality="mig", layernorm=True)
tr = Trainer(None, cfg, training_id="nanrepro", save_dir="/tmp/nanrepro",
             batch_size=16, distributed=False, seed=7, log_every=10**9)
tr.load("/tmp/fs_mig/exp/fs/stage_1.pth")
tr.set_training_args(rc_prob_func_weight=[1.0, 5.0, 0.0], lr=1e-4, lr_step=50)
weights = tr.weights

grad_fn = jax.jit(jax.value_and_grad(loss_and_metrics, has_aux=True),
                  static_argnums=(5, 6))

step = 0
for epoch in range(12):
    tr._rng, epoch_key = jax.random.split(tr._rng)
    recs, accs = [], []
    for kind, item in tr._iter_grouped(graphs, False):
        batch = tr._to_device(item)
        rng = jax.random.fold_in(epoch_key, step)
        (total, (new_state, metrics)), grads = grad_fn(
            tr.params, tr.state, batch, rng, weights, cfg, True)
        assert np.isfinite(float(total)), f"non-finite at step {step}"
        updates, tr.opt_state = tr.optimizer.update(grads, tr.opt_state, tr.params)
        tr.params = optax.apply_updates(tr.params, updates)
        tr.state = tr.state | new_state
        recs.append(float(metrics["recon_loss"]))
        accs.append((float(metrics["tp"]) + float(metrics["tn"])) / max(float(metrics["n_pred"]), 1))
        step += 1
    print(f"epoch {epoch}: recon {np.mean(recs):.4f} (max {np.max(recs):.3f}) "
          f"acc {np.mean(accs)*100:.2f}")
print("finite throughout:", step, "steps")
