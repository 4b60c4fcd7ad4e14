"""Convert reference-style PyTorch state_dicts into mgvae_tpu param pytrees.

Understands the exact parameter names of the reference models
(dg_ae_model_{aig,mig,xag,xmg}.py + digae_layer.py:232-297), including:
  * the per-modality struct-encoder attribute (``struct_encoder`` /
    ``mig_struct_encoder`` / ...)
  * ``module.`` prefixes from DDP-saved checkpoints (stripped, matching the
    tolerant Model.load at dg_ae_model_mig.py:139-162)
  * the MLP's inner ``fc`` Sequential (``readout_prob.fc.0.weight``)

Used by tests (parity vs the torch oracle) and by users migrating real
reference ``.pth`` checkpoints onto TPU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

STRUCT_ATTR = {
    "aig": "struct_encoder",
    "mig": "mig_struct_encoder",
    "xag": "xag_struct_encoder",
    "xmg": "xmg_struct_encoder",
}
GATE_MODULES = {
    "aig": {1: "and", 2: "not"},
    "mig": {2: "not", 3: "and", 4: "or", 1: "maj"},
    "xag": {3: "and", 2: "not", 5: "xor"},
    "xmg": {3: "and", 2: "not", 5: "xor", 1: "maj", 4: "or"},
}


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _normalize_keys(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith("module.") and not k.startswith("module_list"):
            k = k[7:]
        k = k.replace("readout_prob.fc.", "readout_prob.")
        out[k] = v
    return out


def _linear(sd, prefix):
    return {"w": jnp.asarray(_np(sd[prefix + ".weight"]).T), "b": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _gru(sd, prefix):
    return {
        "w_ih": jnp.asarray(_np(sd[prefix + ".weight_ih_l0"]).T),
        "w_hh": jnp.asarray(_np(sd[prefix + ".weight_hh_l0"]).T),
        "b_ih": jnp.asarray(_np(sd[prefix + ".bias_ih_l0"])),
        "b_hh": jnp.asarray(_np(sd[prefix + ".bias_hh_l0"])),
    }


def _multigcn(sd, prefix, layernorm):
    p = {
        "aggr": _linear(sd, prefix + ".aggr.msg"),
        "update": _gru(sd, prefix + ".update"),
        "aggr_r": _linear(sd, prefix + ".aggr_r.msg"),
        "update_r": _gru(sd, prefix + ".update_r"),
    }
    if layernorm:
        p["ln"] = {"w": jnp.asarray(_np(sd[prefix + ".ln.weight"])), "b": jnp.asarray(_np(sd[prefix + ".ln.bias"]))}
    return p


def params_from_torch_state(state_dict: dict, cfg) -> tuple[dict, dict]:
    """Returns (params, state) pytrees matching models.dg_ae.init_params."""
    sd = _normalize_keys(state_dict)
    D = cfg.dim_hidden
    attr = STRUCT_ATTR[cfg.modality]
    layernorm = cfg.layernorm

    params = {
        "struct": {
            "source": _multigcn(sd, f"{attr}.source_conv", layernorm),
            "target": _multigcn(sd, f"{attr}.target_conv", layernorm),
        },
        "hs_linear": _linear(sd, "hs_linear"),
        "hs_decompose": _linear(sd, "hs_decompose"),
    }

    # experts, stacked in cfg.gate_types order
    gm = GATE_MODULES[cfg.modality]
    per = {k: [] for k in ("wq", "bq", "wk", "bk", "wv", "bv", "wa_q", "wa_k", "ba", "w_ih", "w_hh", "b_ih", "b_hh")}
    for gid in cfg.gate_types:
        name = gm[gid]
        q = _linear(sd, f"aggr_{name}_func.msg_q")
        k_ = _linear(sd, f"aggr_{name}_func.msg_k")
        v = _linear(sd, f"aggr_{name}_func.msg_v")
        a = _linear(sd, f"aggr_{name}_func.attn_lin")
        g = _gru(sd, f"update_{name}_func")
        per["wq"].append(q["w"]); per["bq"].append(q["b"])
        per["wk"].append(k_["w"]); per["bk"].append(k_["b"])
        per["wv"].append(v["w"]); per["bv"].append(v["b"])
        per["wa_q"].append(a["w"][:D, 0]); per["wa_k"].append(a["w"][D:, 0]); per["ba"].append(a["b"][0])
        per["w_ih"].append(g["w_ih"]); per["w_hh"].append(g["w_hh"])
        per["b_ih"].append(g["b_ih"]); per["b_hh"].append(g["b_hh"])
    params["experts"] = {
        "wq": jnp.concatenate(per["wq"], axis=1),
        "wk": jnp.concatenate(per["wk"], axis=1),
        "wv": jnp.concatenate(per["wv"], axis=1),
        "bq": jnp.stack(per["bq"]), "bk": jnp.stack(per["bk"]), "bv": jnp.stack(per["bv"]),
        "wa_q": jnp.stack(per["wa_q"]), "wa_k": jnp.stack(per["wa_k"]), "ba": jnp.stack(per["ba"]),
        "w_ih": jnp.concatenate(per["w_ih"], axis=1),
        "w_hh": jnp.concatenate(per["w_hh"], axis=1),
        "b_ih": jnp.stack(per["b_ih"]), "b_hh": jnp.stack(per["b_hh"]),
    }

    # readout_prob MLP: Sequential indices 0/4/8 Linear, 1/5 BatchNorm
    params["readout_prob"] = {
        "layers": [_linear(sd, f"readout_prob.{i}") for i in (0, 4, 8)],
        "bn": [
            {"w": jnp.asarray(_np(sd[f"readout_prob.{i}.weight"])), "b": jnp.asarray(_np(sd[f"readout_prob.{i}.bias"]))}
            for i in (1, 5)
        ],
    }
    state = {
        "readout_prob": {
            "bn": [
                {
                    "mean": jnp.asarray(_np(sd[f"readout_prob.{i}.running_mean"])),
                    "var": jnp.asarray(_np(sd[f"readout_prob.{i}.running_var"])),
                }
                for i in (1, 5)
            ]
        }
    }
    if cfg.variational:
        for head in ("fc_s_mu", "fc_s_logstd", "fc_t_mu", "fc_t_logstd"):
            if f"{head}.weight" in sd:
                params[head] = _linear(sd, head)
    return params, state
