"""Push the chip-scale single-circuit path to ~1M nodes (width 512 x depth
2000, ~2001 levels) through the HBM-streamed VJP. 3 train steps + timing."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import layered_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import make_optimizer, make_train_step

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
rng = np.random.default_rng(0)
t0 = time.perf_counter()
g = layered_circuit(rng, "mig", width=512, depth=depth, num_tt_pairs=512)
print(f"gen {time.perf_counter()-t0:.1f}s: nodes {g.num_nodes} edges {g.num_edges} "
      f"levels {g.num_levels}", flush=True)

cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
optimizer = make_optimizer(1e-4)
opt_state = optimizer.init(params)
train_step, _ = make_train_step(cfg, optimizer)

t0 = time.perf_counter()
batch = jax.tree.map(jnp.asarray, collate([g]))
n = batch["gate"].shape[0]
print(f"collate {time.perf_counter()-t0:.1f}s; padded N={n} "
      f"({n * cfg.dim_hidden * 4 / 1e6:.0f} MB hf)", flush=True)

weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
for step in range(3):
    t0 = time.perf_counter()
    params, state, opt_state, m = train_step(
        params, state, opt_state, batch, jax.random.PRNGKey(step), weights)
    loss = float(m["loss"])  # real sync
    dt = time.perf_counter() - t0
    tag = " (compile)" if step == 0 else ""
    print(f"step {step}: loss {loss:.4f} recon {float(m['recon_loss']):.4f} "
          f"[{dt*1e3:.0f} ms]{tag}", flush=True)
