"""Capture a device profile of the bs64 train step and aggregate op times
from the trace (no tensorboard needed: parse the trace events directly)."""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import measure_roundtrip, stacked_batches, log

TRACE_DIR = "/tmp/mgvae_trace"


def main():
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms")
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    k, bs, chunks = 4, 64, 3
    sbatch, _ = stacked_batches("mig", 7, k, bs, chunks=chunks)
    rngs = jax.random.split(jax.random.PRNGKey(5), k)
    multi = make_multi_step(cfg, opt, None, donate=False)

    def train_scan(params, state, opt_state, sbatch, rngs, weights):
        return multi(params, state, opt_state, sbatch, rngs, weights)[3]

    f = jax.jit(train_scan)
    ms = f(params, state, opt_state, sbatch, rngs, weights)
    float(np.asarray(ms).ravel()[0])

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(2):
            ms = f(params, state, opt_state, sbatch, rngs, weights)
            float(np.asarray(ms).ravel()[0])

    # aggregate device-side op durations from the trace
    files = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    log(f"trace files: {files}")
    if not files:
        log("no trace produced (tunneled chip may not support profiling)")
        return
    with gzip.open(files[0], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device lanes: pid names containing 'TPU' / 'XLA Ops'
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "XLA" not in pname and "Device" not in pname:
            continue
        name = e.get("name", "?")
        tot[name] = tot.get(name, 0.0) + e.get("dur", 0.0)
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    total = sum(tot.values())
    log(f"total device op time {total/1e3:.2f} ms across {len(tot)} op names")
    for name, dur in top:
        log(f"{dur/1e3:9.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
