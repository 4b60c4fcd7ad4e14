"""Instrumented giant-circuit step: separate device transfer, AOT compile,
and run, so the scaling wall (1M hang) gets attributed. Usage:
  python tmp/exp_r3_giant_inst.py [depth] [--fwd-only]
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import layered_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
from mgvae_tpu.train.step import loss_and_metrics, make_optimizer, make_train_step

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 500
fwd_only = "--fwd-only" in sys.argv

t0 = time.perf_counter()
rng = np.random.default_rng(0)
g = layered_circuit(rng, "mig", width=512, depth=depth, num_tt_pairs=512)
print(f"gen {time.perf_counter()-t0:.1f}s: N={g.num_nodes} E={g.num_edges} "
      f"L={g.num_levels}", flush=True)

t0 = time.perf_counter()
batch_host = collate([g])
print(f"collate(host) {time.perf_counter()-t0:.1f}s", flush=True)

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)

t0 = time.perf_counter()
batch = jax.tree.map(jnp.asarray, batch_host)
# force all transfers to finish
for leaf in jax.tree_util.tree_leaves(batch):
    leaf.block_until_ready()
nbytes = sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(batch_host))
print(f"transfer {time.perf_counter()-t0:.1f}s ({nbytes/1e6:.0f} MB)", flush=True)

weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])

if fwd_only:
    fn = jax.jit(lambda p, b: forward(p, b, cfg, use_pallas=True)[1].sum())
    t0 = time.perf_counter()
    lowered = fn.lower(params, batch)
    print(f"trace/lower {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        v = float(compiled(params, batch))
        print(f"fwd run {i}: {v:.3f} [{(time.perf_counter()-t0)*1e3:.0f} ms]",
              flush=True)
else:
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    train_step, _ = make_train_step(cfg, optimizer, donate=False)
    t0 = time.perf_counter()
    lowered = train_step.lower(params, state, opt_state, batch,
                               jax.random.PRNGKey(0), weights)
    print(f"trace/lower {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        params, state, opt_state, m = compiled(params, state, opt_state, batch,
                                               jax.random.PRNGKey(i), weights)
        loss = float(m["loss"])
        print(f"step {i}: loss {loss:.4f} [{(time.perf_counter()-t0)*1e3:.0f} ms]",
              flush=True)
