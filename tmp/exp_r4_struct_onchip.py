"""On-chip struct-kernel check: Mosaic compile, parity vs XLA at highest
precision, and honest timings (fwd + full train step with/without)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench import SCAN_K, measure_roundtrip, stacked_batches, timed_scan
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params, struct_input
from mgvae_tpu.models.encoder import direct_multigcn_apply
from mgvae_tpu.ops.pallas.struct_kernel import struct_towers_pallas

roundtrip = measure_roundtrip()
print(f"roundtrip {roundtrip*1e3:.1f} ms", flush=True)

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True,
               matmul_precision="highest")
params, state = init_params(jax.random.PRNGKey(0), cfg)
sbatch, batch0 = stacked_batches("mig", 7, SCAN_K, 16)
batch = jax.tree.map(jnp.asarray, batch0)
x_feat = struct_input(batch["gate"], cfg, jnp.float32)

# ---- parity at highest precision ------------------------------------------
t0 = time.time()
s1, t1 = jax.jit(lambda p: struct_towers_pallas(
    p["struct"], x_feat, batch, 4, True, precision="highest"))(params)
s1v = float(np.asarray(s1[0, 0]))
print(f"struct kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
# the XLA reference must ALSO run at highest precision: at default, its 8
# recurrent rounds drift 7.4e-2 from f64 on the MXU (tmp/
# exp_r4_struct_bisect.py) — comparing kernel@highest vs XLA@default was
# the round-4 "parity failure" (methodology, not a kernel bug)
with jax.default_matmul_precision("highest"):
    s0, t0_ = jax.jit(lambda p: direct_multigcn_apply(
        p["struct"], x_feat, batch, 4, 4, True))(params)
n = int(batch["n_nodes"])
ds = float(jnp.abs(s1[:n] - s0[:n]).max())
dt = float(jnp.abs(t1[:n] - t0_[:n]).max())
print(f"parity (highest): |s| {ds:.2e}  |t| {dt:.2e}")
assert ds < 5e-4 and dt < 5e-4

# ---- timings (default precision, protocol v2) ------------------------------
cfgd = DGConfig(modality="mig", dim_hidden=64, layernorm=True)


def scan_struct(params, sbatch, use_kernel):
    def body(acc, b):
        xf = struct_input(b["gate"], cfgd, jnp.float32)
        if use_kernel:
            s, t = struct_towers_pallas(params["struct"], xf, b, 4, True)
        else:
            s, t = direct_multigcn_apply(params["struct"], xf, b, 4, 4, True)
        return acc + s.sum() + t.sum(), ()

    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]


tk = timed_scan(lambda p, s: scan_struct(p, s, True), (params, sbatch), SCAN_K, roundtrip)
tx = timed_scan(lambda p, s: scan_struct(p, s, False), (params, sbatch), SCAN_K, roundtrip)
print(f"struct fwd: kernel {tk*1e3:.3f} ms vs XLA {tx*1e3:.3f} ms ({tx/tk:.2f}x)")


def scan_struct_grad(params, sbatch, use_kernel):
    def body(acc, b):
        xf = struct_input(b["gate"], cfgd, jnp.float32)

        def loss(p):
            if use_kernel:
                s, t = struct_towers_pallas(p["struct"], xf, b, 4, True)
            else:
                s, t = direct_multigcn_apply(p["struct"], xf, b, 4, 4, True)
            return jnp.sum(s * s) + jnp.sum(t * t)

        g = jax.grad(loss)(params)
        # consume the WHOLE grad tree (single-leaf consumption gets DCE'd)
        acc = acc + sum(jnp.sum(x) for x in jax.tree.leaves(g["struct"]))
        return acc, ()

    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]


gk = timed_scan(lambda p, s: scan_struct_grad(p, s, True), (params, sbatch), SCAN_K, roundtrip)
gx = timed_scan(lambda p, s: scan_struct_grad(p, s, False), (params, sbatch), SCAN_K, roundtrip)
print(f"struct fwd+bwd: kernel {gk*1e3:.3f} ms vs XLA {gx*1e3:.3f} ms ({gx/gk:.2f}x)")

# ---- full train step with/without the struct kernel ------------------------
# _auto_pallas turns the kernel on automatically on TPU; compare against a
# forward where the struct kernel is force-disabled by monkeypatching the gate
from mgvae_tpu.train.step import make_multi_step, make_optimizer

opt = make_optimizer(1e-4)
opt_state = opt.init(params)
weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
rngs = jax.random.split(jax.random.PRNGKey(3), SCAN_K)
multi = make_multi_step(cfgd, opt, None, donate=False)


def train_scan(params, state, opt_state, sbatch, rngs, weights):
    return multi(params, state, opt_state, sbatch, rngs, weights)[3]


ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
assert np.isfinite(np.asarray(ms)).all(), "non-finite train metrics (struct kernel on)"
t_on = timed_scan(train_scan, (params, state, opt_state, sbatch, rngs, weights),
                  SCAN_K, roundtrip)

import mgvae_tpu.ops.pallas.struct_kernel as SK

orig = SK.struct_kernel_fits
SK.struct_kernel_fits = lambda *a: False
try:
    multi_off = make_multi_step(cfgd, opt, None, donate=False)

    def train_scan_off(params, state, opt_state, sbatch, rngs, weights):
        return multi_off(params, state, opt_state, sbatch, rngs, weights)[3]

    ms = train_scan_off(params, state, opt_state, sbatch, rngs, weights)
    assert np.isfinite(np.asarray(ms)).all()
    t_off = timed_scan(train_scan_off, (params, state, opt_state, sbatch, rngs, weights),
                       SCAN_K, roundtrip)
finally:
    SK.struct_kernel_fits = orig
print(f"FULL train step / 16 graphs: struct-kernel ON {t_on*1e3:.3f} ms vs OFF "
      f"{t_off*1e3:.3f} ms ({t_off/t_on:.2f}x) -> {16/t_on:.0f} g/s")
