import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np

def main():
    import jax
    jax.config.update("jax_log_compiles", True)
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n = 1024
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(n)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    tr = Trainer(None, cfg, batch_size=16, distributed=False,
                 save_dir="/tmp/e2e_exp", steps_per_call=8)
    for ep in range(8):
        t0 = time.perf_counter()
        tr.train(1, graphs, [])
        print(f"== epoch {ep}: {time.perf_counter() - t0:.2f}s", file=sys.stderr, flush=True)

if __name__ == "__main__":
    main()
