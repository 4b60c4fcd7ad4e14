"""Root-cause the once-per-run ~15 s hiccup at n=2048 (epoch 2) and produce
the long-run p50/p99 step-time evidence (VERDICT r2 item 8).

Uses Trainer.step_times: every dispatch's HOST time + the epoch-end metric
fetch (where queued device time pools). Whatever the hiccup is, this
pins it to (phase, step index, host-vs-device side).
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np


def pstats(xs):
    xs = np.asarray(xs) * 1e3
    return (f"p50 {np.percentile(xs, 50):.1f} p99 {np.percentile(xs, 99):.1f} "
            f"max {xs.max():.1f} ms")


def main():
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264,
                             num_tt_pairs=64) for _ in range(n)]
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    tr = Trainer(None, cfg, batch_size=16, distributed=False,
                 save_dir="/tmp/hiccup_exp")
    t0 = time.perf_counter()
    tr.train(1, graphs, graphs[:16])
    print(f"epoch 0 (compile): {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    for ep in range(1, 9):
        tr.step_times = times = []
        t0 = time.perf_counter()
        tr.train(1, graphs, graphs[:16])
        dt = time.perf_counter() - t0
        disp = [t for ph, _, t in times if not ph.startswith("fetch")]
        fetch = [(ph, s, t) for ph, s, t in times if ph.startswith("fetch")]
        print(f"epoch {ep}: {dt:.2f}s -> {n/dt:.0f} g/s | dispatch {pstats(disp)}",
              file=sys.stderr)
        for ph, s, t in fetch:
            print(f"  {ph} after {s} steps: {t*1e3:.0f} ms", file=sys.stderr)
        worst = sorted(times, key=lambda r: -r[2])[:4]
        for ph, s, t in worst:
            if t > 0.2:
                print(f"  SLOW {ph} step {s}: {t:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
