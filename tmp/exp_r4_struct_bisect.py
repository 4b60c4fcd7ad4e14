"""Bisect the struct-kernel on-chip parity failure.

One fused_struct_towers run WITH residual streaming gives every
intermediate ([nbr | state_in | r | z | nw | gh_n | preln] per half-round,
per tower). Recompute the same loop in float64 NUMPY from the identical
folded inputs and report, per half-round and per quantity, the first
divergence. Run on the TPU host:  python tmp/exp_r4_struct_bisect.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import stacked_batches
from mgvae_tpu.models.dg_ae import DGConfig, init_params, struct_input
from mgvae_tpu.ops.pallas import struct_kernel as sk

NUM_ROUNDS = 4
LAYERNORM = True

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=LAYERNORM,
               matmul_precision="highest")
params, _ = init_params(jax.random.PRNGKey(0), cfg)
_, batch0 = stacked_batches("mig", 7, 1, 16)
batch = {k: np.asarray(v) for k, v in batch0.items()}
x_feat = np.asarray(struct_input(jnp.asarray(batch["gate"]), cfg, jnp.float32))

# ---- rebuild the EXACT kernel inputs the wrapper builds (in numpy) --------
enc = jax.tree.map(np.asarray, params["struct"])
st = jax.tree.map(lambda a, b: np.stack([a, b]), enc["source"], enc["target"])
D = st["aggr"]["w"].shape[-1]
N = batch["gate"].shape[0]
deg = {0: batch["deg_in"].astype(np.float64),
       1: batch["deg_out"].astype(np.float64)}
aggr = {0: st["aggr"], 1: st["aggr_r"]}
gru = {0: st["update"], 1: st["update_r"]}

xi_l, wfold_l, whh_l, bhh_l = [], [], [], []
for d in (0, 1):
    w_ihD = gru[d]["w_ih"][:, :D].astype(np.float64)
    w_ihX = gru[d]["w_ih"][:, D:].astype(np.float64)
    wfold_l.append(np.einsum("tij,tjk->tik", aggr[d]["w"].astype(np.float64), w_ihD))
    degb = deg[d][None, :, None] * aggr[d]["b"].astype(np.float64)[:, None, :]
    xi_l.append(np.einsum("nf,tfk->tnk", x_feat.astype(np.float64), w_ihX)
                + gru[d]["b_ih"].astype(np.float64)[:, None, :]
                + np.einsum("tnj,tjk->tnk", degb, w_ihD))
    whh_l.append(gru[d]["w_hh"].astype(np.float64))
    bhh_l.append(gru[d]["b_hh"].astype(np.float64)[:, None, :])
xi = np.stack(xi_l); wfold = np.stack(wfold_l)
whh = np.stack(whh_l); bhh = np.stack(bhh_l)
if LAYERNORM:
    ln_w = np.asarray(st["ln"]["w"])[:, None, :].astype(np.float64)
    ln_b = np.asarray(st["ln"]["b"])[:, None, :].astype(np.float64)
else:
    ln_w = np.ones((2, 1, D)); ln_b = np.zeros((2, 1, D))

# dense A per direction from the blocked tables (what the kernel consumes)
def dense_A(src, slot, valid):
    nb, Eb = src.shape
    A = np.zeros((N, N), np.float64)
    for b in range(nb):
        for e in range(Eb):
            if valid[b, e]:
                A[b * 128 + slot[b, e], src[b, e]] += 1.0
    return A

A = {0: dense_A(batch["fa_src"], batch["fa_slot"], batch["fa_valid"]),
     1: dense_A(batch["ra_src"], batch["ra_slot"], batch["ra_valid"])}

# ---- f64 numpy reference loop (same math as the kernel) --------------------
def ln_fwd(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b

state = np.ones((2, N, D))
ref_steps = []
for i in range(2 * NUM_ROUNDS):
    d = i % 2
    step = []
    for t in range(2):
        nbr = A[d] @ state[t]
        gi = nbr @ wfold[d, t] + xi[d, t]
        gh = state[t] @ whh[d, t] + bhh[d, t]
        r = 1 / (1 + np.exp(-(gi[:, :D] + gh[:, :D])))
        z = 1 / (1 + np.exp(-(gi[:, D:2 * D] + gh[:, D:2 * D])))
        gh_n = gh[:, 2 * D:]
        nw = np.tanh(gi[:, 2 * D:] + r * gh_n)
        h = (1 - z) * nw + z * state[t]
        step.append(dict(nbr=nbr, state_in=state[t].copy(), r=r, z=z,
                         nw=nw, gh_n=gh_n, preln=h))
        state[t] = ln_fwd(h, ln_w[t], ln_b[t]) if LAYERNORM else h
    ref_steps.append(step)
ref_final = state.copy()

# ---- kernel run with residuals (on chip) -----------------------------------
iv = lambda k: jnp.asarray(batch[k]).astype(jnp.int32)
eb = max(batch["fa_src"].shape[1], batch["ra_src"].shape[1])
pad = lambda a: jnp.pad(a, ((0, 0), (0, eb - a.shape[1])))
tbl = jnp.stack([
    jnp.stack([pad(iv("fa_src")), pad(iv("fa_slot")),
               pad(iv("fa_valid")), pad(iv("fa_valid"))], axis=-1),
    jnp.stack([pad(iv("ra_src")), pad(iv("ra_slot")),
               pad(iv("ra_valid")), pad(iv("ra_valid"))], axis=-1),
])
jargs = [jnp.asarray(a, jnp.float32) for a in (xi, wfold, whh, bhh, ln_w, ln_b)]

kstate, kres = jax.jit(lambda *a: sk.fused_struct_towers(
    *a, tbl, NUM_ROUNDS, layernorm=LAYERNORM, with_residuals=True,
    precision="highest"))(*jargs)
kstate = np.asarray(kstate); kres = np.asarray(kres)
print(f"final |state| diff: {np.abs(kstate - ref_final).max():.3e}", flush=True)

names = ["nbr", "state_in", "r", "z", "nw", "gh_n", "preln"]
nvalid = int(batch["n_nodes"])
for i in range(2 * NUM_ROUNDS):
    for t in range(2):
        diffs = []
        for q, nm in enumerate(names):
            kq = kres[i, t, :nvalid, q * D:(q + 1) * D]
            rq = ref_steps[i][t][nm][:nvalid]
            diffs.append(f"{nm} {np.abs(kq - rq).max():.1e}")
        print(f"step {i} dir {i % 2} tower {t}: " + "  ".join(diffs), flush=True)

# ---- no-residual variant (the program the parity exp actually ran) ---------
kstate2 = jax.jit(lambda *a: sk.fused_struct_towers(
    *a, tbl, NUM_ROUNDS, layernorm=LAYERNORM, with_residuals=False,
    precision="highest"))(*jargs)
print(f"no-residual final |state| diff vs f64: "
      f"{np.abs(np.asarray(kstate2) - ref_final).max():.3e}", flush=True)

# ---- XLA encoder at DEFAULT precision vs f64 (the old exp's reference) -----
from mgvae_tpu.models.encoder import direct_multigcn_apply
xla_def = jax.jit(lambda p: direct_multigcn_apply(
    p, jnp.asarray(x_feat), {k: jnp.asarray(v) for k, v in batch.items()},
    NUM_ROUNDS, NUM_ROUNDS, LAYERNORM))(jax.tree.map(jnp.asarray, enc))
sx = np.stack([np.asarray(xla_def[0]), np.asarray(xla_def[1])])
print(f"XLA-default final |state| diff vs f64: "
      f"{np.abs(sx - ref_final).max():.3e}", flush=True)
with jax.default_matmul_precision("highest"):
    xla_hi = jax.jit(lambda p: direct_multigcn_apply(
        p, jnp.asarray(x_feat), {k: jnp.asarray(v) for k, v in batch.items()},
        NUM_ROUNDS, NUM_ROUNDS, LAYERNORM))(jax.tree.map(jnp.asarray, enc))
sxh = np.stack([np.asarray(xla_hi[0]), np.asarray(xla_hi[1])])
print(f"XLA-highest final |state| diff vs f64: "
      f"{np.abs(sxh - ref_final).max():.3e}", flush=True)
