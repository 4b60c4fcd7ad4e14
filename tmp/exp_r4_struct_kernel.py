"""Scratch: fused struct-tower kernel vs the XLA stacked path, fwd + grads,
interpret mode on CPU."""
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params, struct_input
from mgvae_tpu.models.encoder import direct_multigcn_apply
from mgvae_tpu.ops.pallas.struct_kernel import struct_towers_pallas

rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=8, num_gates=120, num_tt_pairs=32)
          for _ in range(4)]
batch = {k: jnp.asarray(v) for k, v in collate(graphs).items()}

for ln in (True, False):
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=ln)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    enc = params["struct"]
    x_feat = struct_input(batch["gate"], cfg, jnp.float32)

    s0, t0 = direct_multigcn_apply(enc, x_feat, batch, 4, 4, ln)
    s1, t1 = struct_towers_pallas(enc, x_feat, batch, 4, ln, interpret=True)
    n = int(batch["n_nodes"])
    print(f"ln={ln} fwd s diff:", float(jnp.abs(s1[:n] - s0[:n]).max()),
          "t diff:", float(jnp.abs(t1[:n] - t0[:n]).max()))

    w = jnp.asarray(np.random.default_rng(1).normal(size=s0.shape), jnp.float32)
    w = w.at[n:].set(0.0)

    def loss(enc, fn):
        s, t = fn(enc, x_feat, batch, 4, ln) if fn is not direct_multigcn_apply \
            else fn(enc, x_feat, batch, 4, 4, ln)
        return jnp.sum(s * w) + jnp.sum(t * w * 0.5)

    g0 = jax.grad(lambda e: loss(e, direct_multigcn_apply))(enc)
    g1 = jax.grad(lambda e: loss(
        e, lambda e2, x, b, r, l: struct_towers_pallas(e2, x, b, r, l, interpret=True)
    ))(enc)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12)), g0, g1)
    bad = {k: v for k, v in jax.tree_util.tree_flatten_with_path(diffs)[0]}
    worst = max(jax.tree.leaves(diffs))
    print(f"ln={ln} grad rel diffs worst: {worst:.3e}")
    for path, v in jax.tree_util.tree_flatten_with_path(diffs)[0]:
        if v > 1e-5:
            print("  ", jax.tree_util.keystr(path), f"{v:.3e}")
