"""Round 5: compile-bounded giant-graph training past N=131k (VERDICT #2).

The HBM level kernels' chunk loops are now DYNAMIC (fori_loop) past
HBM_COMPILE_SAFE_NODES, making the Mosaic program size O(1) in N — the
N=1M unrolled compile that wedged the remote compile service in round 3
cannot recur on this path. This script ramps a single layered circuit to
the target scale and times the full train step (3 losses + backward +
Adam), mirroring examples/giant_circuit_training.py.

RAMP DISCIPLINE (CLAUDE.md): fresh process per size, generous timeout,
nothing else on the host. Run sizes one at a time, smallest first:

  python tmp/exp_r5_giant.py 512 512    # N=262,656  L=513
  python tmp/exp_r5_giant.py 512 1001   # N=513,024  L=1002  (the target)

Reference match: the serial per-level python loop this replaces,
/root/reference/DG_VAE/deepgate/dg_ae_model_mig.py:85-129.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    width = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512
    depth = int(_sys.argv[2]) if len(_sys.argv) > 2 else 512
    use_bf16 = bool(int(_os.environ.get("GIANT_BF16", "0")))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_os.path.dirname(_os.path.dirname(
                          _os.path.abspath(__file__))), ".jax_cache"))

    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import layered_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.ops.pallas.level_kernel import HBM_COMPILE_SAFE_NODES
    from mgvae_tpu.train.step import make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    print(f"generating layered circuit: width {width} x depth {depth} ...",
          flush=True)
    g = layered_circuit(rng, "mig", width=width, depth=depth, num_tt_pairs=512)
    print(f"nodes {g.num_nodes}  edges {g.num_edges}  levels {g.num_levels}  "
          f"(static ceiling {HBM_COMPILE_SAFE_NODES}; dynamic loops "
          f"{'ENGAGED' if g.num_nodes > HBM_COMPILE_SAFE_NODES else 'off'})",
          flush=True)
    assert not _os.environ.get("MGVAE_UNSAFE_GIANT_COMPILE"), \
        "this experiment must NOT use the unsafe static-compile override"

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True,
                   compute_dtype="bfloat16" if use_bf16 else "float32")
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    train_step, _ = make_train_step(cfg, optimizer)

    t0 = time.perf_counter()
    batch = jax.tree.map(jnp.asarray, collate([g]))
    print(f"collate+transfer {time.perf_counter()-t0:.1f}s; padded nodes "
          f"{batch['gate'].shape[0]}", flush=True)

    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    t_last = None
    for step in range(4):
        t0 = time.perf_counter()
        params, state, opt_state, m = train_step(
            params, state, opt_state, batch, jax.random.PRNGKey(step), weights
        )
        loss = float(m["loss"])  # forces the sync (block_until_ready lies)
        assert np.isfinite(loss), f"non-finite loss at step {step}"
        t_last = time.perf_counter() - t0
        tag = " (compile)" if step == 0 else ""
        print(f"step {step}: loss {loss:.4f} recon "
              f"{float(m['recon_loss']):.4f} [{t_last*1e3:.0f} ms]{tag}",
              flush=True)
    print(f"RESULT N={g.num_nodes} L={g.num_levels} "
          f"{'bf16' if use_bf16 else 'f32'}: train step ~{t_last*1e3:.0f} ms "
          f"(incl. ~27 ms sync)", flush=True)


if __name__ == "__main__":
    main()
