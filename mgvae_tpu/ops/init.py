"""Parameter initializers matching torch defaults.

The parity bar (BASELINE.md: losses within 1% of the PyTorch reference)
requires initial distributions to match torch's:

  - ``nn.Linear``: kaiming_uniform_(a=sqrt(5)) on weight == U(-1/sqrt(fan_in),
    1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
  - ``nn.GRU``: every weight/bias U(-1/sqrt(hidden), 1/sqrt(hidden)).
  - ``nn.LayerNorm`` / ``nn.BatchNorm1d``: weight=1, bias=0.

Weights are stored transposed relative to torch (``[in, out]``) so applies
are plain ``x @ w + b`` row-major matmuls (MXU friendly, no transpose op).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_init(key, dim_in: int, dim_out: int, dtype=jnp.float32) -> dict:
    """torch nn.Linear default init; weight stored as [in, out]."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(dim_in)
    return {
        "w": jax.random.uniform(kw, (dim_in, dim_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (dim_out,), dtype, -bound, bound),
    }


def linear_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def gru_cell_init(key, dim_in: int, dim_hidden: int, dtype=jnp.float32) -> dict:
    """torch nn.GRU(single layer) init.

    torch stores weight_ih_l0 [3H, in] with gate order (r, z, n) and two
    separate biases. We keep the transposed [in, 3H] layout and both biases
    to reproduce torch numerics exactly (b_ih + b_hh are NOT fused because
    the candidate gate applies r * (h @ W_hn + b_hn) with b_hn inside).
    Reference consumer: DG_VAE/deepgate/dg_ae_model_mig.py:55-59,
    digae_layer.py:249-252.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(dim_hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(k1, (dim_in, 3 * dim_hidden)),
        "w_hh": u(k2, (dim_hidden, 3 * dim_hidden)),
        "b_ih": u(k3, (3 * dim_hidden,)),
        "b_hh": u(k4, (3 * dim_hidden,)),
    }


def gru_cell_apply(p: dict, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step with torch gate order/semantics.

    r = sigmoid(x Wir + b_ir + h Whr + b_hr)
    z = sigmoid(x Wiz + b_iz + h Whz + b_hz)
    n = tanh(x Win + b_in + r * (h Whn + b_hn))
    h' = (1 - z) * n + z * h
    """
    hidden = h.shape[-1]
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    del hidden
    return (1.0 - z) * n + z * h


def layernorm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def layernorm_apply(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.LayerNorm over the last axis (biased variance, eps inside sqrt)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]
