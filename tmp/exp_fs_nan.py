"""Repro the stage-2 NaN from the full-schedule run on CPU.

Load stage_1.pth (end of the healthy recon-only stage), switch weights to
stage 2 [1,5,0], and step batch-by-batch checking metrics and grads for
the first non-finite value; then bisect by loss term.
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax, jax.numpy as jnp
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


def bad_leaves(t, tag):
    out = []
    for p, leaf in jax.tree_util.tree_leaves_with_path(t):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            out.append(f"{tag}{jax.tree_util.keystr(p)}")
    return out


grad_fn = jax.jit(
    jax.value_and_grad(loss_and_metrics, has_aux=True),
    static_argnums=(5, 6),
)

step = 0
found = False
for epoch in range(3):
    tr._rng, epoch_key = jax.random.split(tr._rng)
    for kind, item in tr._iter_grouped(graphs, False):
        assert kind == "single"
        batch = tr._to_device(item)
        rng = jax.random.fold_in(epoch_key, step)
        (total, (new_state, metrics)), grads = grad_fn(
            tr.params, tr.state, batch, rng, weights, cfg, True)
        bads = bad_leaves(grads, "grad") + bad_leaves(metrics, "metric")
        if bads or not np.isfinite(float(total)):
            print(f"step {step}: total={float(total)} FIRST NON-FINITE:")
            for b in bads[:20]:
                print("  ", b)
            print("metrics:", {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0})
            # bisect per loss term
            for i, name in enumerate(["recon", "prob", "func", "kl"]):
                w = np.zeros(4, np.float32); w[i] = 1.0
                (_, (_, m2)), g2 = grad_fn(tr.params, tr.state, batch, rng,
                                           jnp.asarray(w), cfg, True)
                b2 = bad_leaves(g2, "g")
                print(f"  term {name}: loss={float(m2['loss']):.6f} "
                      f"nan_grads={len(b2)} e.g. {b2[:3]}")
            np.save("/tmp/nan_step.npy", np.asarray([step]))
            found = True
            break
        # apply the update like the real trainer
        import optax
        updates, tr.opt_state = tr.optimizer.update(grads, tr.opt_state, tr.params)
        tr.params = optax.apply_updates(tr.params, updates)
        tr.state = tr.state | new_state
        if step % 10 == 0:
            print(f"step {step}: total={float(total):.4f} "
                  f"prob={float(metrics['prob_loss']):.4f}")
        step += 1
    if found:
        break
print("done, found =", found)
