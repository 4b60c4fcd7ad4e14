"""e2e epoch with host-side phase timers: collate (prefetch wait), pack+put,
dispatch, rng, other."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np

def main():
    import jax
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train import trainer as T

    rng = np.random.default_rng(0)
    n = 2048
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(n)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    tr = T.Trainer(None, cfg, batch_size=16, distributed=False,
                   save_dir="/tmp/e2e_exp", steps_per_call=8)
    acc = {"qwait": 0.0, "pack": 0.0, "rng": 0.0, "dispatch": 0.0}

    orig_iter = tr._iter_batches
    def timed_iter(ds, shuffle):
        it = orig_iter(ds, shuffle)
        while True:
            t0 = time.perf_counter()
            try:
                b = next(it)
            except StopIteration:
                return
            acc["qwait"] += time.perf_counter() - t0
            yield b
    tr._iter_batches = timed_iter

    orig_pack = tr._packer.to_device_steps
    def timed_pack(batches):
        t0 = time.perf_counter()
        out = orig_pack(batches)
        acc["pack"] += time.perf_counter() - t0
        return out
    tr._packer.to_device_steps = timed_pack

    orig_multi = tr.multi_step
    def timed_multi(*a):
        t0 = time.perf_counter()
        out = orig_multi(*a)
        acc["dispatch"] += time.perf_counter() - t0
        return out
    tr.multi_step = timed_multi

    orig_rng = tr._next_rng
    def timed_rng():
        t0 = time.perf_counter()
        out = orig_rng()
        acc["rng"] += time.perf_counter() - t0
        return out
    tr._next_rng = timed_rng

    tr.train(1, graphs, [])  # compile
    for k in acc: acc[k] = 0.0
    t0 = time.perf_counter()
    tr.train(1, graphs, [])
    total = time.perf_counter() - t0
    steps = n // 16
    print(f"epoch {total:.2f}s -> {total/steps*1e3:.1f} ms/step", file=sys.stderr)
    for k, v in acc.items():
        print(f"  {k:9s}: {v/steps*1e3:6.2f} ms/step", file=sys.stderr)
    other = total - sum(acc.values())
    print(f"  other    : {other/steps*1e3:6.2f} ms/step (incl. epoch-end fetch)", file=sys.stderr)

if __name__ == "__main__":
    main()
