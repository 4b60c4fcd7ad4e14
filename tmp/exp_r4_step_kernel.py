"""Scratch: validate pallas_level_step (single-level kernel) against the
fused kernel, fwd + grads, interpret mode on CPU."""
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import (
    DGConfig, init_params, forward, _level_statics, _lv_views, _pack_lv_gather,
    struct_input,
)
from mgvae_tpu.ops.pallas.level_kernel import (
    _round_up, LANE, fused_level_scan, pallas_level_scan, pallas_level_step,
    level_step_call,
)

rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=8, num_gates=120, num_tt_pairs=32)
          for _ in range(4)]
batch = {k: jnp.asarray(v) for k, v in collate(graphs).items()}
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)

# build kernel inputs exactly as _level_scan_pallas does
from mgvae_tpu.models import dg_ae

D, T = cfg.dim_hidden, cfg.num_experts
ex = params["experts"]
hs, hf_ref_out, _ = forward(params, batch, cfg)  # XLA reference hf

expert = cfg.expert_of_gate[batch["gate"]]
pack, wkv_hf = _level_statics(params, batch, cfg, hs, expert)
pw = _round_up(D + 2, LANE)
pack = jnp.pad(pack, ((0, 0), (0, pw - pack.shape[1])))
tabs, lv_off, C = _lv_views(batch)
n_sub = hs.shape[0] // C
pack_lv = _pack_lv_gather(pack, batch, tabs)
lv_nodes = tabs["lv_nodes"]
nodes_glob = lv_nodes + lv_off[:, None]
lv_upd = (tabs["lv_node_valid"] & (expert[nodes_glob] >= 0)).astype(jnp.int32)
lv_e_n = jnp.maximum(expert[nodes_glob], 0)
src = tabs["lv_edge_src"]
dslot = tabs["lv_edge_dst_slot"]
evalid = tabs["lv_edge_valid"].astype(jnp.int32)

args = (pack_lv, src, dslot, evalid, lv_nodes, lv_upd, lv_e_n,
        wkv_hf, ex["w_ih"], ex["b_ih"], ex["b_hh"], ex["wa_k"])
hf_fused = fused_level_scan(*args, num_nodes=n_sub, dim=D, num_experts=T,
                            num_chunks=C, interpret=True)

# step-kernel path: scan over levels, XLA scatter between
N = hs.shape[0]
assert C == 1


def step_scan(pack_lv, wkv_hf, w_ih, b_ih, b_hh, wa_k):
    def body(hf, lv):
        h_new = pallas_level_step(
            hf, lv["pack"], lv["src"], lv["dslot"], lv["evalid"],
            lv["nodes"], lv["upd"], lv["e_n"],
            wkv_hf, w_ih, b_ih, b_hh, wa_k,
            D, T, True, None,
        )
        return hf.at[lv["nodes"]].set(jnp.where(lv["upd"][:, None] > 0, h_new, 0.0)), None

    lvs = dict(pack=pack_lv, src=src, dslot=dslot, evalid=evalid,
               nodes=lv_nodes, upd=lv_upd, e_n=lv_e_n)
    hf0 = jnp.zeros((N, D), pack_lv.dtype)
    return jax.lax.scan(body, hf0, lvs)[0]


hf_step = step_scan(pack_lv, wkv_hf, ex["w_ih"], ex["b_ih"], ex["b_hh"], ex["wa_k"])
n_valid = int(batch["n_nodes"])
print("fwd step-vs-fused:", float(jnp.abs(hf_step[:n_valid] - hf_fused[:n_valid]).max()))

# grads: sum(hf * w) wrt pack_lv + weights, step vs fused VJP
w = jnp.asarray(np.random.default_rng(1).normal(size=(N, D)), jnp.float32)
w = w.at[n_valid:].set(0.0)


def loss_fused(pack_lv, wkv_hf, w_ih, b_ih, b_hh, wa_k):
    hf = pallas_level_scan(pack_lv, src, dslot, evalid, lv_nodes, lv_upd, lv_e_n,
                           wkv_hf, w_ih, b_ih, b_hh, wa_k,
                           n_sub, D, T, C, True, None)
    return jnp.sum(hf * w)


def loss_step(pack_lv, wkv_hf, w_ih, b_ih, b_hh, wa_k):
    hf = step_scan(pack_lv, wkv_hf, w_ih, b_ih, b_hh, wa_k)
    return jnp.sum(hf * w)


g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
    pack_lv, wkv_hf, ex["w_ih"], ex["b_ih"], ex["b_hh"], ex["wa_k"])
g_s = jax.grad(loss_step, argnums=(0, 1, 2, 3, 4, 5))(
    pack_lv, wkv_hf, ex["w_ih"], ex["b_ih"], ex["b_hh"], ex["wa_k"])
for name, a, b in zip(("pack", "wkv", "wih", "bih", "bhh", "wak"), g_f, g_s):
    d = float(jnp.abs(a - b).max())
    r = d / (float(jnp.abs(a).max()) + 1e-12)
    print(f"grad {name}: absmax diff {d:.3e} rel {r:.3e}")
