"""On-chip (single real chip) numbers for the round-4 kernel paths:

1. the STEP-kernel scan vs the fused kernel vs XLA on a bs16 forward
   (the step kernel is the mp path's engine; at mp=1 shapes this bounds
   its per-level overhead),
2. the mp=1 shard_map'ed sharded-pallas train step vs the plain train step
   (shows the sharded path's machinery costs nothing and actually rides
   the kernel on hardware).
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
from jax.sharding import Mesh

from bench import SCAN_K, measure_roundtrip, stacked_batches, timed_scan
from mgvae_tpu.data.batching import collate_shards, shard_levels_by_dst
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import (
    DGConfig, _level_scan_fast, _level_scan_pallas, _level_scan_step,
    forward, init_params,
)
from mgvae_tpu.parallel.sharded import make_sharded_train_step
from mgvae_tpu.train.step import make_optimizer, make_train_step

roundtrip = measure_roundtrip()
print(f"roundtrip {roundtrip*1e3:.1f} ms", flush=True)

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
sbatch, batch0 = stacked_batches("mig", 7, SCAN_K, 16)

# ---- 1. step-kernel scan vs fused kernel vs XLA (forward) ------------------
import mgvae_tpu.ops.pallas.level_kernel as K


def scan_fwd(params, sbatch, mode):
    def body(acc, b):
        if mode == "step":
            orig = K.kernel_fits
            K.kernel_fits = lambda *a: False
            try:
                hs, hf, _ = forward(params, b, cfg, use_pallas=True)
            finally:
                K.kernel_fits = orig
        else:
            hs, hf, _ = forward(params, b, cfg, use_pallas=(mode == "fused"))
        return acc + hf.sum() + hs.sum(), ()

    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]


# NB batch0 is multi-graph with C=1 -> forcing kernel_fits False sends the
# "step" mode down... C==1 goes HBM; so patch kernel_fits_hbm too
def scan_fwd_step(params, sbatch):
    def body(acc, b):
        o1, o2 = K.kernel_fits, K.kernel_fits_hbm
        K.kernel_fits = lambda *a: False
        K.kernel_fits_hbm = lambda *a: False
        try:
            hs, hf, _ = forward(params, b, cfg, use_pallas=True)
        finally:
            K.kernel_fits, K.kernel_fits_hbm = o1, o2
        return acc + hf.sum() + hs.sum(), ()

    return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]


t_fused = timed_scan(lambda p, s: scan_fwd(p, s, "fused"), (params, sbatch), SCAN_K, roundtrip)
t_xla = timed_scan(lambda p, s: scan_fwd(p, s, "xla"), (params, sbatch), SCAN_K, roundtrip)
try:
    t_step = timed_scan(scan_fwd_step, (params, sbatch), SCAN_K, roundtrip)
except Exception as e:  # HBM gate patching may still route oddly; report
    print("step-mode timing failed:", repr(e))
    t_step = float("nan")
print(f"fwd / 16 graphs: fused {t_fused*1e3:.3f} ms | step-scan {t_step*1e3:.3f} ms "
      f"| XLA {t_xla*1e3:.3f} ms")

# ---- 2. mp=1 sharded-pallas train step vs plain train step ------------------
devs = np.asarray(jax.devices())
mesh = Mesh(devs[:1].reshape(1, 1), ("dp", "mp"))
rng = np.random.default_rng(0)
shards = [[random_circuit(rng, "mig", num_inputs=16, num_gates=264,
                          num_tt_pairs=64) for _ in range(16)]]
b_np = collate_shards(shards, mp=1)
b_mp = jax.tree.map(jnp.asarray, shard_levels_by_dst(b_np, 1))
opt = make_optimizer(1e-4)
opt_state = opt.init(params)
weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])

step_sh = make_sharded_train_step(cfg, opt, mesh, b_mp, donate=False,
                                  use_pallas=True, interpret=False)
o = step_sh(params, state, opt_state, b_mp, jax.random.PRNGKey(1), weights)
loss = float(o[3]["loss"])
assert np.isfinite(loss), loss
print(f"mp=1 sharded-pallas train step loss {loss:.4f}", flush=True)

import time

ts = []
for _ in range(20):
    t0 = time.perf_counter()
    o = step_sh(params, state, opt_state, b_mp, jax.random.PRNGKey(1), weights)
    _ = float(o[3]["loss"])
    ts.append(time.perf_counter() - t0)
t_sh = min(ts) - roundtrip

b_plain = jax.tree.map(jnp.asarray, b_np)
b_plain = jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 else x, b_plain)
step_pl, _ = make_train_step(cfg, opt, None, donate=False)
o = step_pl(params, state, opt_state, b_plain, jax.random.PRNGKey(1), weights)
_ = float(o[3]["loss"])
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    o = step_pl(params, state, opt_state, b_plain, jax.random.PRNGKey(1), weights)
    _ = float(o[3]["loss"])
    ts.append(time.perf_counter() - t0)
t_pl = min(ts) - roundtrip
print(f"train step / 16 graphs: mp=1 sharded-pallas {t_sh*1e3:.3f} ms vs "
      f"plain {t_pl*1e3:.3f} ms ({t_pl/t_sh:.2f}x)")
