"""GradNormTrainer: learned multi-task loss weights (GradNorm, Chen et al.).

Rebuild of DG_VAE/deepgate/gradnorm.py:6-98 as a WORKING trainer (the
reference implements the update but wires it into no trainer). Each step:
  1. three per-task gradients in one jit (trainer_balancer.task_grads);
  2. raw per-task norms on the shared ``hs_linear`` reference layer — the
     analogue of the reference's ``self.ref_layer`` grads (gradnorm.py:55);
  3. gradnorm_update moves the task weights toward equalized, rate-balanced
     gradient norms (train/gradnorm.py:96-125);
  4. the parameter update applies sum_i w_i * g_i directly (no 4th backward
     pass — d(w_i L_i)/dtheta = w_i dL_i/dtheta for scalar weights).

Distributed: per-task grads are pmean'd over 'dp' BEFORE the norm/weight
computation, so every device learns identical task weights.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.dg_ae import DGConfig
from ..utils.logger import AverageMeter
from .gradnorm import GradNormConfig, gradnorm_init, gradnorm_update, tree_norm
from .trainer import Trainer
from .trainer_balancer import task_grads


def make_gradnorm_train_step(cfg: DGConfig, optimizer, gn_cfg: GradNormConfig,
                             mesh: Mesh | None = None):
    def _train(params, state, gn_state, opt_state, batch, rng):
        grads, (rc, pl, fl), new_state, m = task_grads(cfg, params, state, batch, rng)
        if mesh is not None:
            grads = [jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), g) for g in grads]
            new_state = jax.tree.map(lambda s: jax.lax.pmean(s, "dp"), new_state)
            rc, pl, fl = (jax.lax.pmean(x, "dp") for x in (rc, pl, fl))
            m = jax.tree.map(lambda x: jax.lax.pmean(x, "dp"), m)
        losses = jnp.stack([rc, pl, fl])
        raw_norms = jnp.stack([tree_norm(g["hs_linear"]) for g in grads])
        gn_state, w, l_grad = gradnorm_update(gn_state, losses, raw_norms, gn_cfg)
        total_grad = jax.tree.map(
            lambda g0, g1, g2: w[0] * g0 + w[1] * g1 + w[2] * g2, *grads
        )
        updates, opt_state = optimizer.update(total_grad, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(m)
        metrics.update(
            recon_loss=rc, prob_loss=pl, func_loss=fl, kl_loss=jnp.zeros(()),
            loss=w[0] * rc + w[1] * pl + w[2] * fl, l_grad=l_grad,
            w_recon=w[0], w_prob=w[1], w_func=w[2],
        )
        return params, state | new_state, gn_state, opt_state, metrics

    if mesh is None:
        return jax.jit(_train)

    rep, dp = P(), P("dp")

    def _train_sharded(params, state, gn_state, opt_state, batch, rng):
        batch = jax.tree.map(lambda x: x[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        return _train(params, state, gn_state, opt_state, batch, rng)

    return jax.jit(
        jax.shard_map(
            _train_sharded, mesh=mesh,
            in_specs=(rep, rep, rep, rep, dp, rep),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        )
    )


class GradNormTrainer(Trainer):
    """Trainer whose task weights are learned by GradNorm instead of the
    static rc_prob_func_weight (which seeds nothing here: GradNorm always
    starts from uniform weights, gradnorm.py:23)."""

    def __init__(self, *args, alpha: float = 1.5, gn_lr: float = 0.025,
                 gn_lr_warmup: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.gn_cfg = GradNormConfig(alpha=alpha, num_tasks=3, lr=gn_lr,
                                     lr_warmup=gn_lr_warmup)
        self.gn_state = gradnorm_init(self.gn_cfg)
        self._gn_step = make_gradnorm_train_step(
            self.model_cfg, self.optimizer, self.gn_cfg, self.mesh
        )

    @property
    def task_weights(self):
        return [float(x) for x in self.gn_state["w"]]

    def train(self, num_epoch: int, train_dataset, val_dataset):
        meters = {k: AverageMeter() for k in ("recon", "prob", "func", "l_grad", "time")}
        for epoch in range(num_epoch):
            for k in meters:
                meters[k] = AverageMeter()
            t0 = time.time()
            # metrics stay on-device; ONE stacked fetch per epoch (a host
            # sync costs ~26 ms on a tunneled chip — see Trainer.train)
            pending = []
            for batch in self._iter_batches(train_dataset, shuffle=True):
                batch = self._to_device(batch)
                rng = self._next_rng()
                self.params, self.state, self.gn_state, self.opt_state, m = self._gn_step(
                    self.params, self.state, self.gn_state, self.opt_state, batch, rng
                )
                pending.append(jnp.stack(
                    [m["recon_loss"], m["prob_loss"], m["func_loss"], m["l_grad"]]
                ))
                meters["time"].update(time.time() - t0)
                t0 = time.time()
            if pending:
                for rc, pl, fl, lg in np.asarray(jnp.stack(pending)):
                    meters["recon"].update(float(rc))
                    meters["prob"].update(float(pl))
                    meters["func"].update(float(fl))
                    meters["l_grad"].update(float(lg))
            if self.is_chief:
                w = self.task_weights
                self.logger.write(
                    "gradnorm| Epoch: {:}/{:} |Recon: {:.4f} |Prob: {:.4f} |Func: {:.4f} "
                    "|W: [{:.3f} {:.3f} {:.3f}] |Lgrad: {:.4f}|Net: {:.2f}s\n".format(
                        epoch, num_epoch, meters["recon"].avg, meters["prob"].avg,
                        meters["func"].avg, w[0], w[1], w[2], meters["l_grad"].avg,
                        meters["time"].avg,
                    )
                )
            self.model_epoch += 1
        out = {k: v.avg for k, v in meters.items()}
        out["task_weights"] = self.task_weights
        return out
