"""End-to-end real-data run (VERDICT r1 item 8): for each of the four
modalities, generate a reference-schema npz dataset at realistic circuit
sizes, load it through NpzParser (the reference's front door, quirks and
all), and drive the FULL 3-stage train.py. Records per-stage loss curves to
benchmarks/E2E.md.

Usage (on the TPU host):  python benchmarks/e2e_real_data.py [out_dir]
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CIRCUITS = 120
STAGE_EPOCHS = "4,4,4"


def gen_dataset(modality: str, root: str, seed: int):
    sys.path.insert(0, REPO)
    from mgvae_tpu.data.npz import save_npz
    from mgvae_tpu.data.synthetic import random_circuit

    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(N_CIRCUITS):
        gates = int(rng.integers(80, 600))  # realistic small/medium circuits
        g = random_circuit(
            rng, modality, num_inputs=int(rng.integers(6, 24)),
            num_gates=gates, num_tt_pairs=min(128, 2 * gates), name=f"c{i}",
        )
        graphs.append(g)
    os.makedirs(root, exist_ok=True)
    save_npz(
        graphs,
        os.path.join(root, "graphs.npz"),
        os.path.join(root, "labels.npz"),
        modality,
    )


def run_modality(modality: str, work: str, seed: int):
    data_dir = os.path.join(work, f"data_{modality}")
    gen_dataset(modality, data_dir, seed)
    save_dir = os.path.join(work, f"exp_{modality}")
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--exp_id", "e2e", "--model", "DG_AE", "--type", modality,
        "--batch_size", "16", "--layernorm", "--distributed",
        "--data_dir", data_dir, "--save_dir", save_dir,
        "--stage_epochs", STAGE_EPOCHS, "--seed", str(seed),
    ]
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=3000)
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:])
        raise RuntimeError(f"{modality} train.py failed")
    logdir = os.path.join(save_dir, "e2e")
    logf = sorted(f for f in os.listdir(logdir) if f.startswith("log-"))[-1]
    lines = [l for l in open(os.path.join(logdir, logf)) if l.startswith("train|")]
    rows = []
    for l in lines:
        m = re.search(r"Recon: ([\d.]+) \|ACC: ([\d.]+) \|Prob: ([\d.]+) \|Func: ([\d.]+)", l)
        if m is None:  # e.g. a diverged run printing nan
            print(f"[WARN] unparsable log line: {l.strip()}")
            continue
        rows.append(tuple(float(x) for x in m.groups()))
    assert rows, "no parsable train| lines"
    return rows


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mgvae_e2e_")
    out = ["# End-to-end real-data runs (NpzParser -> 3-stage train.py)", "",
           f"{N_CIRCUITS} synthetic circuits per modality at realistic sizes "
           "(80-600 gates), written in the reference npz schema, loaded through "
           f"NpzParser, trained bs16 for stage_epochs={STAGE_EPOCHS}.", ""]
    for i, mod in enumerate(("aig", "mig", "xag", "xmg")):
        rows = run_modality(mod, work, seed=100 + i)
        out.append(f"## {mod}")
        out.append("")
        out.append("| epoch | recon | ACC% | prob | func |")
        out.append("|---|---|---|---|---|")
        for e, (rc, acc, pl, fl) in enumerate(rows):
            out.append(f"| {e} | {rc:.4f} | {acc:.1f} | {pl:.4f} | {fl:.4f} |")
        out.append("")
        first, last = rows[0], rows[-1]
        assert last[0] < first[0], f"{mod}: recon did not improve"
        print(f"[{mod}] recon {first[0]:.4f} -> {last[0]:.4f}, ACC {first[1]:.1f} -> {last[1]:.1f}", flush=True)
    md = os.path.join(REPO, "benchmarks", "E2E.md")
    with open(md, "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote", md)


if __name__ == "__main__":
    main()
