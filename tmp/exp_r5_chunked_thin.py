"""Round 5: thin wire for CHUNKED batches — on-chip e2e A/B (VERDICT #4).

data/rehydrate now derives the [C, L] chunk-local tables on device (vmapped
per-chunk derive + collate_chunked's global offsets, byte-identity tested in
tests/test_rehydrate.py). This measures what it buys end-to-end: bs64
CHUNKED training (split disabled, auto-chunk picks C) with thin_wire on vs
off, on the ~85 MB/s tunnel.

Protocol (CLAUDE.md e2e A/B rule): >=128 steps/epoch per arm, warm >= 3
epochs (dims running-max + compile), interleave the timed epochs
round-robin, report medians. Fresh process, nothing else on the host:

  python tmp/exp_r5_chunked_thin.py
"""
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tmp.exp_r4_ksweep import log, make_ds, setup_cache


def main():
    import jax  # noqa: F401  (device contact before timing)

    from mgvae_tpu.models.dg_ae import DGConfig
    from mgvae_tpu.train.trainer import Trainer

    bs, epochs = 64, 5
    ds = make_ds(n=128 * bs)
    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    args = types.SimpleNamespace(model="DG_AE", type="mig")
    steps = len(ds) // bs
    arms = {}
    for thin in (True, False):
        tr = Trainer(args, cfg, training_id=f"ct_{thin}",
                     save_dir="/tmp/exp_chunked_thin", lr=1e-4, batch_size=bs,
                     distributed=False, seed=3, split=0, thin_wire=thin)
        t0 = time.perf_counter()
        tr.train(3, ds, ds[:bs])  # warm: compile + dims convergence
        log(f"[thin={thin}] warm 3 epochs in {time.perf_counter()-t0:.1f}s")
        arms[thin] = (tr, [])
    for e in range(epochs):  # interleaved round-robin
        for thin in (True, False):
            tr, ts = arms[thin]
            t0 = time.perf_counter()
            m = tr.train(1, ds, ds[:bs])
            ts.append(time.perf_counter() - t0)
            assert np.isfinite(m["recon"]), f"thin={thin}: non-finite recon"
    for thin in (True, False):
        _, ts = arms[thin]
        med = float(np.median(ts))
        log(f"RESULT bs64-chunked thin={thin}: epochs "
            f"{['%.2f' % t for t in ts]} -> median {med:.2f}s = "
            f"{steps*bs/med:.0f} g/s e2e ({med/steps*1e3:.2f} ms/step; "
            f"incl. val+ckpt overhead)")


if __name__ == "__main__":
    setup_cache()
    main()
