"""Scratch: sharded forward with use_pallas (interpret) vs single-device."""
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from mgvae_tpu.data.batching import collate, shard_levels_by_dst
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
from mgvae_tpu.parallel.sharded import make_sharded_forward

rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=150) for _ in range(24)]
batch_np = collate(graphs, mp=4)
batch_np = shard_levels_by_dst(batch_np, 4)
batch = jax.tree.map(jnp.asarray, batch_np)

devs = np.asarray(jax.devices())
mesh = Mesh(devs[:4], ("mp",))
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, _ = init_params(jax.random.PRNGKey(0), cfg)

hs0, hf0, _ = forward(params, batch, cfg)
fn = make_sharded_forward(cfg, mesh, batch, use_pallas=True, interpret=True)
hs1, hf1 = fn(params, batch)
n = int(batch["n_nodes"])
print("hs diff:", float(jnp.abs(hs1[:n] - hs0[:n]).max()))
print("hf diff:", float(jnp.abs(hf1[:n] - hf0[:n]).max()))
