"""Test: is the bwd-kernel input_output_alias the NaN source at C>1?"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import mgvae_tpu.ops.pallas.level_kernel as LK

mode = sys.argv[1]
if mode == "noalias":
    import functools
    orig_call = LK.pl.pallas_call
    def patched(*a, **kw):
        if "input_output_aliases" in kw and kw.get("grid") is not None:
            kw = dict(kw); kw.pop("input_output_aliases")
        return orig_call(*a, **kw)
    LK.pl.pallas_call = patched

from mgvae_tpu.data.batching import collate_fit
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig, init_params
from mgvae_tpu.train.step import loss_and_metrics
import mgvae_tpu.train.step as S
S._auto_pallas = lambda batch, cfg, train=False: True  # force kernel bwd

rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(64)]
cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
params, state = init_params(jax.random.PRNGKey(0), cfg)
batch = jax.tree.map(jnp.asarray, collate_fit(graphs))
w = jnp.asarray([1.0, 4.0, 2.0, 0.0])

@jax.jit
def grads(p):
    return jax.grad(lambda p: loss_and_metrics(p, state, batch, jax.random.PRNGKey(0), w, cfg, True)[0])(p)

g = grads(params)
n_nan = sum(int(jnp.isnan(v).sum()) for v in jax.tree.leaves(g))
print(f"[{mode}] total nan grad elements: {n_nan}", file=sys.stderr, flush=True)
