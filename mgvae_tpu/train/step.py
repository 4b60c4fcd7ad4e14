"""Jitted train/eval steps, single-chip and shard_map data-parallel.

One fused XLA program per step: forward (struct encode + level scan), all
losses, backward, Adam update — replacing the reference's eager loop
(trainer.py:208-234). The reference initializes NCCL but never wraps the
model in DDP, so ranks silently diverge (SURVEY.md §8 quirk 1); here
gradients (and BatchNorm running stats) are ``pmean``-ed over the ``dp``
mesh axis inside the step — a deliberate, documented correctness upgrade
riding ICI collectives.

Loss weighting: trainer.py:229-231 uses only [recon, prob, func]; the KL
term is computed but NEVER added to the total (the VAE is vestigial in the
reference). We keep that parity by default (kl weight 0) but expose a real
kl weight for the fixed DG_VAE mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..models.dg_ae import DGConfig, forward
from .losses import func_loss, kl_loss, prob_loss, recon_loss


# epoch-metric row layout shared by the trainer and the multi-step scan
METRIC_KEYS = ("recon_loss", "prob_loss", "func_loss", "kl_loss",
               "tp", "fp", "tn", "fn", "n_pred")


def make_optimizer(lr: float):
    """Adam with torch defaults; learning rate is a mutable hyperparam so
    the 3-stage schedule / lr-step decay never trigger recompilation."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)


def set_lr(opt_state, lr):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def _auto_pallas(batch, cfg: DGConfig) -> bool:
    """Use the fused Pallas level kernel (with its hand-written VJP) when on
    TPU and each batch chunk fits VMEM. Decided at trace time from static
    shapes. Large batches built with collate_chunked/collate_fit carry a
    leading [C, L] level-table axis; the kernel's VMEM footprint is then one
    chunk, so any batch size qualifies as long as the chunks were sized to
    kernel_fits.

    History (round 2): chunked TRAINING briefly produced all-NaN grads on
    the real chip — root-caused to func_loss's unmasked-norm cosine
    backward emitting NaN cotangents at padding pairs, which XLA's sparse
    transpose never reads but the kernel's dense one-hot matmuls ingest
    (0 * NaN = NaN). Fixed at the source (train/losses.func_loss masks
    before the norm); bench.py value-checks every path it times since."""
    if cfg.num_rounds != 1 or jax.default_backend() != "tpu":
        return False
    from ..ops.pallas.level_kernel import kernel_fits, kernel_fits_hbm_bwd

    if "groups" in batch:
        # split batch (collate_split): groups are collated at bs16-class
        # dims by construction; per-group fallbacks inside
        # _level_scan_pallas handle any group that still doesn't fit
        return True
    lv = batch["lv_nodes"]
    num_chunks = lv.shape[0] if lv.ndim == 3 else 1
    n_sub = batch["gate"].shape[0] // num_chunks
    ep, np_ = batch["lv_edge_src"].shape[-1], lv.shape[-1]
    if kernel_fits(n_sub, ep, np_, cfg.dim_hidden):
        return True
    # giant single graphs: HBM-streamed variant, fwd + bwd. bf16 values are
    # supported since round 4 (vdt/f32 discipline, tests/test_pallas_kernel
    # test_hbm_variant_bf16); the old f32-only gate silently sent bf16 giant
    # TRAIN steps to the XLA scan fallback, whose per-level autodiff
    # residuals are O(L*N*D) — a 32 GB pred tensor at N=513k
    # (tmp/r5_onchip/giant_513k_bf16.log, first attempt)
    return num_chunks == 1 and kernel_fits_hbm_bwd(n_sub, ep, np_, cfg.dim_hidden)


# split-batch globals the wire can omit: exact concatenations of the
# per-group tables, rebuilt on device by rehydrate_split (the trainer's
# stacked split collate drops them before packing — 187 KB/step of the
# 1.7 MB bs64 split wire at the tunnel's ~85 MB/s)
SPLIT_WIRE_DERIVABLE = ("gate", "node_valid", "forward_level",
                        "edge_src", "edge_dst", "edge_valid")


def rehydrate_split(batch):
    """Rebuild a split batch's global loss arrays from its ``groups`` tuple
    when the wire omitted them: the globals are exact axis-(-1) concats of
    the per-group padded tables, with each group's node-id arrays shifted by
    the (static) padded-node offset — the device-side mirror of
    data/batching.collate_split's ``cat`` (free under jit: XLA fuses the
    copies into consumers)."""
    if "groups" not in batch or "gate" in batch:
        return batch
    import numpy as np

    gbs = batch["groups"]
    offs = np.cumsum([0] + [int(gb["gate"].shape[-1]) for gb in gbs])
    cat = lambda k: jnp.concatenate([gb[k] for gb in gbs], axis=-1)
    cat_off = lambda k: jnp.concatenate(
        [gb[k] + np.int32(offs[g]) for g, gb in enumerate(gbs)], axis=-1)
    out = dict(batch)
    out["gate"] = cat("gate")
    out["node_valid"] = cat("node_valid")
    out["forward_level"] = cat("forward_level")
    out["edge_src"] = cat_off("edge_src")
    out["edge_dst"] = cat_off("edge_dst")
    out["edge_valid"] = cat("edge_valid")
    return out


def rehydrate(batch):
    """Rebuild whatever the wire omitted: split-batch globals
    (rehydrate_split) and/or the thin-wire index tables
    (data/rehydrate.derive_tables, marked by the zero-byte ``tdims``
    placeholder). Every jitted loss path must funnel batches through this."""
    if "groups" in batch and any("tdims" in gb for gb in batch["groups"]):
        from ..data.rehydrate import derive_tables

        batch = dict(batch)
        batch["groups"] = tuple(
            derive_tables(gb) if "tdims" in gb else gb for gb in batch["groups"]
        )
    batch = rehydrate_split(batch)
    if "tdims" in batch:
        from ..data.rehydrate import derive_tables

        batch = derive_tables(batch)
    return batch


def loss_and_metrics(params, state, batch, rng, weights, cfg: DGConfig, train: bool):
    """weights: [w_recon, w_prob, w_func, w_kl]."""
    batch = rehydrate(batch)
    k_vae, k_neg, k_drop = jax.random.split(rng, 3)
    hs, hf, aux = forward(
        params, batch, cfg, rng=k_vae if cfg.variational else None,
        use_pallas=_auto_pallas(batch, cfg),
    )
    rc, rc_metrics = recon_loss(params, hs, batch, k_neg,
                                mask_collisions=cfg.neg_collision_mask)
    pl, new_state = prob_loss(params, state, hf, batch, train, k_drop)
    fl = func_loss(hf, batch)
    kl = kl_loss(aux, batch) if cfg.variational else jnp.zeros((), hs.dtype)
    total = weights[0] * rc + weights[1] * pl + weights[2] * fl + weights[3] * kl
    metrics = dict(rc_metrics)
    metrics.update(recon_loss=rc, prob_loss=pl, func_loss=fl, kl_loss=kl, loss=total)
    return total, (new_state, metrics)


def make_train_step(cfg: DGConfig, optimizer, mesh: Mesh | None = None, donate: bool = True):
    """Returns (train_step, eval_step).

    Single chip: train_step(params, state, opt_state, batch, rng, weights)
      -> (params, state, opt_state, metrics)
    With a mesh: same signature; batch leaves must carry a leading 'dp'
      axis of size mesh.shape['dp'].
    """

    def _train(params, state, opt_state, batch, rng, weights):
        grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
        (_, (new_state, metrics)), grads = grad_fn(params, state, batch, rng, weights, cfg, True)
        if mesh is not None:
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
            new_state = jax.tree.map(lambda s: jax.lax.pmean(s, "dp"), new_state)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, "dp"), metrics)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, state | new_state, opt_state, metrics

    def _eval(params, state, batch, rng, weights):
        _, (_, metrics) = loss_and_metrics(params, state, batch, rng, weights, cfg, False)
        if mesh is not None:
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, "dp"), metrics)
        return metrics

    if mesh is None:
        train_step = jax.jit(_train, donate_argnums=(0, 1, 2) if donate else ())
        eval_step = jax.jit(_eval)
        return train_step, eval_step

    rep = P()
    dp = P("dp")

    def _train_sharded(params, state, opt_state, batch, rng, weights):
        batch = jax.tree.map(lambda x: x[0], batch)  # drop local shard axis
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        return _train(params, state, opt_state, batch, rng, weights)

    def _eval_sharded(params, state, batch, rng, weights):
        batch = jax.tree.map(lambda x: x[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        return _eval(params, state, batch, rng, weights)

    train_step = jax.jit(
        shard_map(
            _train_sharded, mesh=mesh,
            in_specs=(rep, rep, rep, dp, rep, rep),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2) if donate else (),
    )
    eval_step = jax.jit(
        shard_map(
            _eval_sharded, mesh=mesh,
            in_specs=(rep, rep, dp, rep, rep),
            out_specs=rep,
            check_vma=False,
        )
    )
    return train_step, eval_step


def make_multi_step(cfg: DGConfig, optimizer, mesh: Mesh | None = None, donate: bool = True):
    """K optimizer steps in ONE dispatched program via ``lax.scan``.

    multi_step(params, state, opt_state, sbatch, rngs, weights)
      -> (params, state, opt_state, metrics[K, len(METRIC_KEYS)])

    ``sbatch`` leaves carry a leading step axis [K, ...] (with a mesh:
    [K, dp, ...]); ``rngs`` is [K, 2]. K is static (one compile per distinct
    K; the trainer always calls with a single fixed K and runs tails through
    the per-step path). Motivation: on a remotely-tunneled chip every
    dispatched program costs a host<->device round trip (~26 ms); at a ~2 ms
    device step the per-step dispatch dominates wall clock. Scanning K steps
    per dispatch amortizes it (measured 28 -> 9.3 ms/step at K=8, bs16 MIG).
    The reference dispatches (many) kernels per step from Python
    (trainer.py:208-234); XLA sees the whole K-step window here.
    """

    def _train(params, state, opt_state, batch, rng, weights):
        grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
        (_, (new_state, metrics)), grads = grad_fn(params, state, batch, rng, weights, cfg, True)
        if mesh is not None:
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
            new_state = jax.tree.map(lambda s: jax.lax.pmean(s, "dp"), new_state)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, "dp"), metrics)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, state | new_state, opt_state, metrics

    def _scan(params, state, opt_state, sbatch, rngs, weights, *, sharded: bool):
        def body(carry, xs):
            p, s, o = carry
            b, r = xs
            if sharded:
                b = jax.tree.map(lambda x: x[0], b)  # drop local dp axis
                r = jax.random.fold_in(r, jax.lax.axis_index("dp"))
            p, s, o, m = _train(p, s, o, b, r, weights)
            return (p, s, o), jnp.stack([m[k] for k in METRIC_KEYS])
        (params, state, opt_state), ms = jax.lax.scan(
            body, (params, state, opt_state), (sbatch, rngs)
        )
        return params, state, opt_state, ms

    if mesh is None:
        return jax.jit(
            functools.partial(_scan, sharded=False),
            donate_argnums=(0, 1, 2) if donate else (),
        )

    rep = P()
    return jax.jit(
        shard_map(
            functools.partial(_scan, sharded=True), mesh=mesh,
            in_specs=(rep, rep, rep, P(None, "dp"), rep, rep),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2) if donate else (),
    )


def make_multi_eval(cfg: DGConfig, mesh: Mesh | None = None):
    """K eval steps in ONE dispatched program (the val-phase analogue of
    make_multi_step): multi_eval(params, state, sbatch, rngs, weights)
    -> metrics[K, len(METRIC_KEYS)]. Same dispatch-amortization rationale."""

    def _eval1(params, state, batch, rng, weights):
        _, (_, metrics) = loss_and_metrics(params, state, batch, rng, weights, cfg, False)
        if mesh is not None:
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, "dp"), metrics)
        return jnp.stack([metrics[k] for k in METRIC_KEYS])

    def _scan(params, state, sbatch, rngs, weights, *, sharded: bool):
        def body(carry, xs):
            b, r = xs
            if sharded:
                b = jax.tree.map(lambda x: x[0], b)
                r = jax.random.fold_in(r, jax.lax.axis_index("dp"))
            return carry, _eval1(params, state, b, r, weights)
        return jax.lax.scan(body, 0, (sbatch, rngs))[1]

    if mesh is None:
        return jax.jit(functools.partial(_scan, sharded=False))

    rep = P()
    return jax.jit(
        shard_map(
            functools.partial(_scan, sharded=True), mesh=mesh,
            in_specs=(rep, rep, P(None, "dp"), rep, rep),
            out_specs=rep,
            check_vma=False,
        )
    )
