"""Multi-task loss balancing: GradNorm + EMA gradient-norm Balancer.

JAX-native rebuild of DG_VAE/deepgate/gradnorm.py (GradNorm :6-98, averager
:112-130, Balancer :137-219). Key translation: the reference computes
per-task gradient norms w.r.t. a shared reference layer with
``torch.autograd.grad`` inside the step; here the caller supplies per-task
gradient pytrees (one ``jax.grad`` per task inside the same jit) and the
balancing itself is pure arithmetic on their norms — no nested autodiff is
needed because d(w_i * L_i)/dtheta = w_i * dL_i/dtheta for scalar w_i.

State is carried functionally (EMA accumulators as arrays) so the whole
balanced step stays inside one compiled XLA program.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def tree_norm(tree, per_batch_item: bool = False):
    """Global L2 norm of a gradient pytree (Balancer's norm with
    per_batch_item=False; the reference's per-item mean applies to its
    [dim] reference-layer grads where it coincides with the global norm)."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


# ---------------------------------------------------------------------------
# EMA averager (gradnorm.py:112-130): total = total*beta + value; fix likewise
# ---------------------------------------------------------------------------

def averager_init(num_tasks: int):
    return {"total": jnp.zeros(num_tasks), "fix": jnp.zeros(num_tasks)}


def averager_update(state, values, beta: float = 0.999, weight: float = 1.0):
    total = state["total"] * beta + weight * values
    fix = state["fix"] * beta + weight
    avg = total / jnp.maximum(fix, 1e-12)
    return {"total": total, "fix": fix}, avg


# ---------------------------------------------------------------------------
# Balancer (gradnorm.py:137-219)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BalancerConfig:
    weights: tuple            # per-task weight coefficients
    rescale_grads: bool = True
    total_norm: float = 1.0
    ema_decay: float = 0.999
    epsilon: float = 1e-12


def balancer_init(cfg: BalancerConfig):
    return {"avg": averager_init(len(cfg.weights))}


def balancer_scales(state, norms, cfg: BalancerConfig):
    """norms: [T] per-task reference-layer grad norms.
    Returns (new_state, scales[T]) — Balancer.compute_scaling_factors."""
    new_avg, avg_norms = averager_update(state["avg"], norms, cfg.ema_decay)
    w = jnp.asarray(cfg.weights)
    if cfg.rescale_grads:
        ratios = w / jnp.sum(w)
        scales = ratios * cfg.total_norm / (cfg.epsilon + avg_norms)
    else:
        scales = w
    return {"avg": new_avg}, scales


# ---------------------------------------------------------------------------
# GradNorm (gradnorm.py:6-98)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GradNormConfig:
    alpha: float
    num_tasks: int
    lr: float = 0.01
    lr_warmup: float | None = None


def gradnorm_init(cfg: GradNormConfig):
    return {
        "w": jnp.ones(cfg.num_tasks),
        "L0": jnp.zeros(cfg.num_tasks),
        "has_L0": jnp.zeros((), bool),
        "step": jnp.zeros((), jnp.int32),
    }


def gradnorm_update(state, losses, raw_norms, cfg: GradNormConfig):
    """One GradNorm step.

    losses:    [T] current task losses
    raw_norms: [T] ||d L_i / d theta_ref|| (unweighted)
    Returns (new_state, task_weights[T], L_grad scalar).
    """
    L0 = jnp.where(state["has_L0"], state["L0"], losses)
    w = state["w"]
    G = w * raw_norms                       # G_W_i for scalar weights
    G_bar = jnp.mean(G)
    tilde = losses / jnp.maximum(L0, 1e-12)
    r = tilde / jnp.maximum(jnp.mean(tilde), 1e-12)
    target = jax.lax.stop_gradient(G_bar * jnp.power(r, cfg.alpha))
    L_grad = jnp.mean(jnp.abs(G - target))
    # dL_grad/dw_i = sign(G_i - target_i) * raw_norms_i / T
    grad_w = jnp.sign(G - target) * raw_norms / cfg.num_tasks
    lr = cfg.lr
    if cfg.lr_warmup is not None:
        lr = lr * jnp.minimum(1.0, (state["step"] + 1).astype(jnp.float32) / cfg.lr_warmup)
    w = w - lr * grad_w
    w = w / jnp.sum(w) * cfg.num_tasks       # renormalize to sum T
    w = jnp.maximum(w, 1e-8)                 # clamp negatives (gradnorm.py:94-96)
    new_state = {
        "w": w,
        "L0": L0,
        "has_L0": jnp.ones((), bool),
        "step": state["step"] + 1,
    }
    return new_state, w, L_grad
