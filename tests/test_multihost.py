"""Real multi-process execution: 2 CPU processes x 2 virtual devices each,
coordinated through jax.distributed — the rebuild's torchrun replacement
(run_mig.sh:8-16). Verifies the full Trainer path: identical cross-process
shuffles, per-process global-array assembly (_globalize), pmean'd gradients
(both processes must report the SAME losses), and chief-only checkpointing.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, types
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin pins platforms
from mgvae_tpu.parallel.mesh import maybe_initialize_distributed

pid, n = maybe_initialize_distributed()
assert n == 2, f"expected 2 processes, got {n}"
import numpy as np
from mgvae_tpu.data.synthetic import random_circuit
from mgvae_tpu.models.dg_ae import DGConfig
from mgvae_tpu.train.trainer import Trainer

rng = np.random.default_rng(0)
ds = [random_circuit(rng, "mig", num_inputs=4, num_gates=24) for _ in range(16)]
cfg = DGConfig(modality="mig", dim_hidden=16, s_rounds=1, t_rounds=1)
tr = Trainer(
    types.SimpleNamespace(model="DG_AE"), cfg, training_id="mh",
    save_dir=sys.argv[1], batch_size=2, distributed=True, seed=0,
)
assert tr.num_devices == 4, f"global mesh should see 4 devices, got {tr.num_devices}"
assert jax.process_count() == 2
m = tr.train(1, ds, ds)
print(f"RESULT {pid} {m['train']['recon']:.6f} {m['train']['prob']:.6f}", flush=True)
"""


def test_two_process_training(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            COORDINATOR_ADDRESS=addr,
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, recon, prob = line.split()
                results[int(pid)] = (float(recon), float(prob))
    assert set(results) == {0, 1}, f"missing results: {outs}"
    # pmean'd metrics: both processes must observe identical losses
    assert results[0] == results[1], f"processes disagree: {results}"
    # chief-only checkpointing: exactly the chief wrote model_last.pth
    assert os.path.exists(tmp_path / "mh" / "model_last.pth")
