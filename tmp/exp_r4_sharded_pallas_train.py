"""Scratch: dp x mp TRAIN step with use_pallas (interpret) vs dp-only step."""
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from mgvae_tpu.data.batching import collate_shards, shard_levels_by_dst
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.parallel.sharded import make_sharded_train_step
from mgvae_tpu.train.step import make_train_step


def _graphs(seed, n_graphs=8, num_gates=120):
    rng = np.random.default_rng(seed)
    return [random_circuit(rng, "mig", num_inputs=16, num_gates=num_gates)
            for _ in range(n_graphs)]


devs = np.asarray(jax.devices())
cfg = DGConfig(modality="mig", dim_hidden=32, s_rounds=2, t_rounds=2, layernorm=True)
params, state = init_params(jax.random.PRNGKey(3), cfg)
optimizer = optax.sgd(0.1)
opt_state = optimizer.init(params)

shards = [_graphs(10 + d) for d in range(2)]
batch_np = collate_shards(shards, mp=2)
batch_mp = jax.tree.map(jnp.asarray, shard_levels_by_dst(batch_np, 2))
batch = jax.tree.map(jnp.asarray, batch_np)
rng = jax.random.PRNGKey(7)
weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])

mesh_dp = Mesh(devs[:2], ("dp",))
step_dp, _ = make_train_step(cfg, optimizer, mesh_dp, donate=False)
p_dp, s_dp, o_dp, m_dp = step_dp(params, state, opt_state, batch, rng, weights)

mesh2 = Mesh(devs[:4].reshape(2, 2), ("dp", "mp"))
step2 = make_sharded_train_step(cfg, optimizer, mesh2, batch_mp, donate=False,
                                use_pallas=True, interpret=True)
p2, s2, o2, m2 = step2(params, state, opt_state, batch_mp, rng, weights)

for k in m_dp:
    print(f"metric {k}: dp {float(np.asarray(m_dp[k]).mean()):.6f} "
          f"dpxmp {float(np.asarray(m2[k]).mean()):.6f}")
d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), p_dp, p2)
mx = max(jax.tree.leaves(d))
print("max param delta diff:", mx)
assert mx < 5e-6, d
print("OK")
