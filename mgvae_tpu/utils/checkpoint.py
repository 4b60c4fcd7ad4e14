"""Checkpoint save/restore.

Same logical contract as the reference ({epoch, state_dict, optimizer} .pth,
trainer.py:105-129 + utils/model_utils.py:3-66) but serialized with flax
msgpack (framework-neutral, no pickle execution risk). Files keep the
reference's ``model_last.pth`` naming so resume flows are drop-in.

Also provides a tolerant restore (shape-mismatch skip, missing-key fill)
mirroring Model.load (dg_ae_model_mig.py:139-162), and a loader for REAL
torch .pth checkpoints via utils.torch_compat when torch is installed.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_checkpoint(path: str, epoch: int, params, state, opt_state, lr: float):
    payload = {
        "epoch": np.int64(epoch),
        "lr": np.float64(lr),
        "params": serialization.to_state_dict(jax.tree.map(np.asarray, params)),
        "state": serialization.to_state_dict(jax.tree.map(np.asarray, state)),
        "opt_state": serialization.to_state_dict(jax.tree.map(np.asarray, opt_state)),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, params, state, opt_state):
    """Restore into the given templates; returns (epoch, lr, params, state, opt_state)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    new_params = tolerant_merge(params, raw["params"])
    new_state = tolerant_merge(state, raw["state"])
    try:
        new_opt = serialization.from_state_dict(opt_state, raw["opt_state"])
    except Exception:
        new_opt = opt_state  # tolerate optimizer-layout drift like the reference
    return int(raw["epoch"]), float(raw["lr"]), new_params, new_state, new_opt


def tolerant_merge(template, loaded):
    """Model.load semantics: skip shape mismatches, keep template for
    missing keys, drop unknown keys (dg_ae_model_mig.py:148-162)."""
    if isinstance(template, dict):
        out = {}
        loaded = loaded if isinstance(loaded, dict) else {}
        for k, tv in template.items():
            out[k] = tolerant_merge(tv, loaded[k]) if k in loaded else tv
        return out
    if isinstance(template, (list, tuple)):
        if isinstance(loaded, dict):  # msgpack stores lists as {'0': ..}
            loaded = [loaded.get(str(i)) for i in range(len(template))]
        loaded = loaded if isinstance(loaded, (list, tuple)) else []
        merged = [
            tolerant_merge(tv, loaded[i]) if i < len(loaded) and loaded[i] is not None else tv
            for i, tv in enumerate(template)
        ]
        return tuple(merged) if isinstance(template, tuple) else merged
    if loaded is None:
        return template
    arr = np.asarray(loaded)
    if hasattr(template, "shape") and tuple(arr.shape) != tuple(np.shape(template)):
        return template  # shape-mismatch skip
    return jnp.asarray(arr)


def load_torch_checkpoint(path: str, cfg):
    """Load a REAL reference .pth (torch pickle) into mgvae_tpu pytrees."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    from .torch_compat import params_from_torch_state

    params, state = params_from_torch_state(sd, cfg)
    return int(ckpt.get("epoch", 0)), params, state
