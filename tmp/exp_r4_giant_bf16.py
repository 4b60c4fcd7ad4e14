"""Giant-circuit bf16 HBM streaming (VERDICT r3 item 5): N~102k single
circuit, fwd + train step through the HBM-streamed kernel, f32 vs bf16.
bf16 halves the hf DMA bytes (the dominant cost at this scale)."""
import dataclasses
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

from bench import measure_roundtrip
from mgvae_tpu.data.batching import collate
from mgvae_tpu.data.synthetic import layered_circuit
from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
from mgvae_tpu.train.step import make_optimizer, make_train_step

roundtrip = measure_roundtrip()
print(f"roundtrip {roundtrip*1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
# same scale as examples/giant_circuit_training.py's known-good ceiling
g = layered_circuit(rng, "mig", width=512, depth=200, num_inputs=512,
                    num_tt_pairs=512)
print(f"N={g.num_nodes} E={g.num_edges} L={int(g.forward_level.max())}", flush=True)
batch = jax.tree.map(jnp.asarray, collate([g]))

for dtype in ("float32", "bfloat16"):
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True,
                   compute_dtype=dtype)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    step, _ = make_train_step(cfg, opt, None, donate=False)

    t0 = time.time()
    out = step(params, state, opt_state, batch, jax.random.PRNGKey(1), weights)
    loss = float(out[3]["loss"])
    print(f"[{dtype}] first train step (compile) {time.time()-t0:.1f}s "
          f"loss={loss:.4f}", flush=True)
    assert np.isfinite(loss), loss
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = step(params, state, opt_state, batch, jax.random.PRNGKey(1), weights)
        _ = float(out[3]["loss"])
        ts.append(time.perf_counter() - t0)
    t = min(ts) - roundtrip
    print(f"[{dtype}] train step {t*1e3:.1f} ms")

    # forward-only (encode) timing
    fwd = jax.jit(lambda p, b: forward(p, b, cfg, use_pallas=True))
    hs, hf, _ = fwd(params, batch)
    _ = float(jnp.asarray(hf)[0, 0])
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        hs, hf, _ = fwd(params, batch)
        _ = float(jnp.asarray(hf)[0, 0])
        ts.append(time.perf_counter() - t0)
    print(f"[{dtype}] fwd {(min(ts)-roundtrip)*1e3:.1f} ms")
