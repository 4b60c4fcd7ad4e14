"""A/B: Trainer epoch throughput with ArenaPacker vs per-array transfers,
plus a probe of what a single device_put / dispatch costs on the tunnel."""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe():
    import jax
    import jax.numpy as jnp

    # cost of device_put (small array), jit dispatch (no sync), full sync
    x = np.zeros((256, 64), np.float32)
    f = jax.jit(lambda a: a * 2)
    r = f(jnp.asarray(x))
    float(r[0, 0])
    for name, fn in [
        ("device_put 64KB", lambda: jax.device_put(x)),
        ("jit dispatch (async)", lambda: f(r)),
        ("full sync", lambda: float(f(r)[0, 0])),
    ]:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        log(f"{name:24s}: min {min(ts)*1e3:7.2f} ms")


def run_epochs(label):
    import jax

    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n = 512
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(n)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    tr = Trainer(None, cfg, batch_size=16, distributed=False, save_dir="/tmp/e2e_exp")
    tr.train(1, graphs, graphs[:16])  # compile
    best = 1e9
    for ep in range(3):
        t0 = time.perf_counter()
        tr.train(1, graphs, graphs[:16])
        best = min(best, time.perf_counter() - t0)
    log(f"{label}: best epoch {best:.2f}s -> {n / best:.0f} graphs/s")


def main():
    import jax
    import jax.numpy as jnp

    probe()
    mode = sys.argv[1] if len(sys.argv) > 1 else "new"
    if mode == "old":
        from mgvae_tpu.train import trainer as T

        T.Trainer._to_device = lambda self, b: jax.tree.map(jnp.asarray, b)
    run_epochs(mode)


if __name__ == "__main__":
    main()
