"""Where does the 9.7e-4 pallas-vs-xla |hf| diff come from?

Compares, on one real-TPU batch:
  A. XLA scan, default matmul precision (bf16 MXU passes)
  B. XLA scan, HIGHEST precision (fp32 via bf16x6)
  C. fused Pallas kernel (preferred_element_type=f32)
  D. CPU float64 ground truth (numpy semantics via the same code on CPU? not
     available in-process — approximated by B)
"""
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params

    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(16)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, _ = init_params(jax.random.PRNGKey(0), cfg)
    batch = jax.tree.map(jnp.asarray, collate(graphs))
    n = int(batch["n_nodes"])

    def run(use_pallas, precision):
        with jax.default_matmul_precision(precision):
            _, hf, _ = jax.jit(lambda p, b: forward(p, b, cfg, use_pallas=use_pallas))(params, batch)
        return np.asarray(hf)[:n]

    A = run(False, "default")
    B = run(False, "highest")
    C = run(True, "default")
    Chi = run(True, "highest")

    def d(x, y):
        return float(np.abs(x - y).max())

    log(f"XLA(default)  vs XLA(highest): {d(A, B):.2e}")
    log(f"pallas        vs XLA(default): {d(C, A):.2e}")
    log(f"pallas        vs XLA(highest): {d(C, B):.2e}")
    log(f"pallas(hi ctx) vs XLA(highest): {d(Chi, B):.2e}")
    log(f"pallas(hi ctx) vs pallas:       {d(Chi, C):.2e}")


if __name__ == "__main__":
    main()
