"""BalancerTrainer: gradient-norm-rescaled multi-task loss weighting.

Rebuild of DG_VAE/deepgate/trainer_balancer.py — which is stale in the
reference (expects an older 3-tuple model API, trainer_balancer.py:170,
SURVEY.md §8 quirk 13) — as a WORKING variant: per-task gradients are
computed inside one jitted step (three backward passes), their norms on the
shared ``hs_linear`` layer drive Balancer EMA rescaling (gradnorm.py:137-219
semantics), and the parameter update applies the scaled gradient sum
directly — no fourth backward pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.dg_ae import DGConfig, forward
from .gradnorm import BalancerConfig, balancer_init, balancer_scales, tree_norm
from .losses import func_loss, prob_loss, recon_loss
from .step import make_optimizer, rehydrate
from .trainer import Trainer


def task_grads(cfg: DGConfig, params, state, batch, rng):
    """Three per-task gradients (recon/prob/func) in one traced step: the
    JAX equivalent of the reference's per-loss ``torch.autograd.grad`` calls
    (gradnorm.py:160-178). Returns (grads[3], losses[3], new_state, metrics)."""
    batch = rehydrate(batch)

    def task_losses(params):
        k_vae, k_neg, k_drop = jax.random.split(rng, 3)
        hs, hf, _ = forward(params, batch, cfg, rng=k_vae if cfg.variational else None)
        rc, rc_metrics = recon_loss(params, hs, batch, k_neg)
        pl, new_state = prob_loss(params, state, hf, batch, True, k_drop)
        fl = func_loss(hf, batch)
        return rc, pl, fl, new_state, rc_metrics

    grads, losses, aux = [], [], None
    for i in range(3):
        def one(params, i=i):
            rc, pl, fl, new_state, m = task_losses(params)
            return (rc, pl, fl)[i], (new_state, m, (rc, pl, fl))

        (l, a), g = jax.value_and_grad(one, has_aux=True)(params)
        grads.append(g)
        losses.append(l)
        aux = a
    new_state, m, _ = aux
    return grads, losses, new_state, m


def make_balancer_train_step(cfg: DGConfig, optimizer, bal_cfg: BalancerConfig,
                             mesh: Mesh | None = None):
    """Balancer-weighted train step; with ``mesh``, runs data-parallel under
    shard_map: per-task grads are pmean'd over 'dp' FIRST, so the Balancer's
    norms (and therefore the scales) are those of the true global gradient
    and identical on every device — unlike the reference, whose per-rank
    balancers drift apart (trainer_balancer.py + quirk 1)."""

    def _train(params, state, bal_state, opt_state, batch, rng):
        grads, (rc, pl, fl), new_state, m = task_grads(cfg, params, state, batch, rng)
        if mesh is not None:
            grads = [jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), g) for g in grads]
            new_state = jax.tree.map(lambda s: jax.lax.pmean(s, "dp"), new_state)
            rc, pl, fl = (jax.lax.pmean(x, "dp") for x in (rc, pl, fl))
            m = jax.tree.map(lambda x: jax.lax.pmean(x, "dp"), m)
        norms = jnp.stack([tree_norm(g["hs_linear"]) for g in grads])
        bal_state, scales = balancer_scales(bal_state, norms, bal_cfg)
        total_grad = jax.tree.map(
            lambda g0, g1, g2: scales[0] * g0 + scales[1] * g1 + scales[2] * g2, *grads
        )
        updates, opt_state = optimizer.update(total_grad, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(m)
        metrics.update(
            recon_loss=rc, prob_loss=pl, func_loss=fl, kl_loss=jnp.zeros(()),
            loss=scales[0] * rc + scales[1] * pl + scales[2] * fl,
            scale_recon=scales[0], scale_prob=scales[1], scale_func=scales[2],
        )
        return params, state | new_state, bal_state, opt_state, metrics

    if mesh is None:
        return jax.jit(_train)

    rep, dp = P(), P("dp")

    def _train_sharded(params, state, bal_state, opt_state, batch, rng):
        batch = jax.tree.map(lambda x: x[0], batch)  # drop local dp axis
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        return _train(params, state, bal_state, opt_state, batch, rng)

    return jax.jit(
        jax.shard_map(
            _train_sharded, mesh=mesh,
            in_specs=(rep, rep, rep, rep, dp, rep),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        )
    )


class BalancerTrainer(Trainer):
    """Trainer whose loss weighting is driven by the Balancer instead of the
    static rc_prob_func_weight."""

    def __init__(self, *args, rescale_grads=True, total_norm=1.0, ema_decay=0.999, **kwargs):
        super().__init__(*args, **kwargs)
        self.bal_cfg = BalancerConfig(
            weights=tuple(self.rc_prob_func_weight),
            rescale_grads=rescale_grads,
            total_norm=total_norm,
            ema_decay=ema_decay,
        )
        self.bal_state = balancer_init(self.bal_cfg)
        # distributed-aware: _iter_batches emits dp-stacked shards when a
        # mesh is set, and the step pmean-syncs per-task grads + norms
        self._bal_step = make_balancer_train_step(
            self.model_cfg, self.optimizer, self.bal_cfg, self.mesh
        )

    def train(self, num_epoch: int, train_dataset, val_dataset):
        import time

        import numpy as np

        from ..utils.logger import AverageMeter

        for epoch in range(num_epoch):
            meters = {k: AverageMeter() for k in ("recon", "prob", "func", "time")}
            t0 = time.time()
            # metrics stay on-device; ONE stacked fetch per epoch (a host
            # sync costs ~26 ms on a tunneled chip — see Trainer.train)
            pending = []
            for batch in self._iter_batches(train_dataset, shuffle=True):
                batch = self._to_device(batch)
                rng = self._next_rng()
                self.params, self.state, self.bal_state, self.opt_state, m = self._bal_step(
                    self.params, self.state, self.bal_state, self.opt_state, batch, rng
                )
                pending.append(jnp.stack([m["recon_loss"], m["prob_loss"], m["func_loss"]]))
                meters["time"].update(time.time() - t0)
                t0 = time.time()
            if pending:
                for rc, pl, fl in np.asarray(jnp.stack(pending)):
                    meters["recon"].update(float(rc))
                    meters["prob"].update(float(pl))
                    meters["func"].update(float(fl))
            if self.is_chief:
                self.logger.write(
                    "balancer| Epoch: {:}/{:} |Recon: {:.4f} |Prob: {:.4f} |Func: {:.4f}|Net: {:.2f}s\n".format(
                        epoch, num_epoch, meters["recon"].avg, meters["prob"].avg,
                        meters["func"].avg, meters["time"].avg,
                    )
                )
            self.model_epoch += 1
        return {k: v.avg for k, v in meters.items()}
