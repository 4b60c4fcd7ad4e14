"""MLP with (masked) BatchNorm1d, ReLU and Dropout, matching torch semantics.

Rebuild of DG_VAE/deepgate/arch/mlp.py:14-55: a stack of ``num_layer`` Linear
layers; every layer except the last is followed by optional BatchNorm1d,
activation and Dropout. Used for ``readout_prob`` (D->32->32->1, p=0.2,
batchnorm+relu, dg_ae_model_mig.py:62) and the trainer's ``readout_rc``
(trainer.py:77).

TPU-specific deviation (documented, not accidental): batches are padded to
static shapes, so batch statistics must be computed over *valid* rows only —
otherwise padding would pollute the normalization, breaking parity with the
unpadded reference. All entry points therefore accept a ``valid`` mask.

Trainable params and running statistics are kept in separate pytrees so the
optimizer only touches the former; apply() in train mode returns the updated
running stats (functional equivalent of torch's in-place update).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .init import linear_apply, linear_init

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def batchnorm_init(dim: int, dtype=jnp.float32):
    params = {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def batchnorm_apply(params, state, x, valid=None, train: bool = True):
    """torch BatchNorm1d: biased batch var to normalize, unbiased to track."""
    if train:
        if valid is None:
            n = jnp.asarray(x.shape[0], x.dtype)
            mean = jnp.mean(x, axis=0)
            var = jnp.mean(jnp.square(x - mean), axis=0)
        else:
            v = valid.astype(x.dtype)[:, None]
            n = jnp.maximum(jnp.sum(v), 1.0)
            mean = jnp.sum(x * v, axis=0) / n
            var = jnp.sum(jnp.square(x - mean) * v, axis=0) / n
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "mean": (1 - _BN_MOMENTUM) * state["mean"] + _BN_MOMENTUM * mean,
            "var": (1 - _BN_MOMENTUM) * state["var"] + _BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * params["w"] + params["b"]
    return y, new_state


def dropout(key, x, p: float, train: bool):
    if not train or p <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def mlp_init(
    key,
    dim_in: int,
    dim_hidden: int = 32,
    dim_pred: int = 1,
    num_layer: int = 3,
    norm_layer: str | None = None,
    dtype=jnp.float32,
):
    """Mirror of MLP.__init__ (arch/mlp.py:15-52)."""
    assert num_layer >= 2, "The number of layers should be >= 2."
    keys = jax.random.split(key, num_layer)
    dims = [dim_in] + [dim_hidden] * (num_layer - 1) + [dim_pred]
    layers = [linear_init(keys[i], dims[i], dims[i + 1], dtype) for i in range(num_layer)]
    params = {"layers": layers}
    state = {"bn": []}
    if norm_layer == "batchnorm":
        bns = [batchnorm_init(dim_hidden, dtype) for _ in range(num_layer - 1)]
        params["bn"] = [p for p, _ in bns]
        state["bn"] = [s for _, s in bns]
    return params, state


def mlp_apply(
    params,
    state,
    x,
    *,
    valid=None,
    train: bool = True,
    p_drop: float = 0.0,
    act: str | None = "relu",
    sigmoid: bool = False,
    tanh: bool = False,
    rng=None,
):
    """Mirror of MLP.forward; returns (out, new_state)."""
    layers = params["layers"]
    has_bn = bool(params.get("bn"))
    new_bn = []
    n_hidden = len(layers) - 1
    if p_drop > 0.0 and train:
        assert rng is not None, "dropout in train mode needs an rng"
        drop_keys = jax.random.split(rng, n_hidden)
    for i in range(n_hidden):
        x = linear_apply(layers[i], x)
        if has_bn:
            x, s = batchnorm_apply(params["bn"][i], state["bn"][i], x, valid=valid, train=train)
            new_bn.append(s)
        if act == "relu":
            x = jax.nn.relu(x)
        elif act == "relu6":
            x = jnp.clip(x, 0.0, 6.0)
        elif act == "sigmoid":
            x = jax.nn.sigmoid(x)
        if p_drop > 0.0 and train:
            x = dropout(drop_keys[i], x, p_drop, train)
    x = linear_apply(layers[-1], x)
    if sigmoid:
        x = jax.nn.sigmoid(x)
    if tanh:
        x = jnp.tanh(x)
    return x, {"bn": new_bn if has_bn else state["bn"]}
