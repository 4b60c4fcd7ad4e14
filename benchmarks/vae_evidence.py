"""DG_VAE training evidence (VERDICT r4 item 6).

The reference's DG_VAE forward crashes as shipped (quirk 12) and its trainer
computes KL every step but never weights it into the loss
(reference trainer.py:145-151, digvae_model.py:105-175). Our rebuild fixes
the forward and exposes a real ``--kl_weight``; this harness provides the
missing TRAINING evidence: a short 3-stage DG_VAE run with kl_weight > 0,
asserting KL/recon stay finite, then scoring held-out func-acc / recon
ROC-AUC / AP with the same protocol as benchmarks/curriculum_parity.py and
appending the table (next to the DG_AE numbers) to benchmarks/E2E.md.

CPU (MGVAE_PLATFORM=cpu): tunnel-independent, exactly reproducible.

Usage: python benchmarks/vae_evidence.py [modality] [kl_weight]
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.curriculum_parity import (  # noqa: E402
    BATCH, N_TRAIN, N_VAL, gen_graphs, sample_negatives,
)

STAGE_EPOCHS = (8, 4, 4)


def train_vae(modality, kl_weight, work, seed=7):
    from mgvae_tpu.data.npz import save_npz

    data_dir = os.path.join(work, f"data_{modality}")
    os.makedirs(data_dir, exist_ok=True)
    save_npz(gen_graphs(modality, N_TRAIN, seed=300),
             os.path.join(data_dir, "graphs.npz"),
             os.path.join(data_dir, "labels.npz"), modality)
    save_dir = os.path.join(work, f"exp_{modality}")
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--exp_id", "vae", "--model", "DG_VAE", "--type", modality,
        "--batch_size", str(BATCH), "--layernorm", "--distributed",
        "--kl_weight", str(kl_weight),
        "--data_dir", data_dir, "--save_dir", save_dir,
        "--stage_epochs", ",".join(map(str, STAGE_EPOCHS)), "--seed", str(seed),
    ]
    env = {**os.environ, "MGVAE_PLATFORM": "cpu"}
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO, timeout=7200, env=env,
                       capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        raise RuntimeError(f"{modality} DG_VAE train.py failed")
    # every epoch line's losses must be finite (the KL term trains)
    kls, rcs = [], []
    # epoch lines go to the run's log file (Logger writes the file, not
    # stdout); the KL field appears when kl_weight>0 meters a nonzero KL:
    # "train| Epoch: 0/8 |Recon: 1.94 ... |KL: 0.93|Net: ..."
    log_dir = os.path.join(save_dir, "vae")
    logs = sorted(f for f in os.listdir(log_dir) if f.startswith("log-"))
    assert logs, f"no log file in {log_dir}"
    with open(os.path.join(log_dir, logs[-1])) as f:
        for line in f:
            m = re.search(
                r"train\| Epoch.*\|Recon: ([\d.naife+-]+).*\|KL: ([\d.naife+-]+)",
                line)
            if m:
                rcs.append(float(m.group(1)))
                kls.append(float(m.group(2)))
    assert rcs and all(np.isfinite(rcs)), f"non-finite recon curve: {rcs[-5:]}"
    assert kls and all(np.isfinite(kls)), f"non-finite KL curve: {kls[-5:]}"
    print(f"[vae {modality}] recon curve {rcs[0]:.4f} -> {rcs[-1]:.4f}, "
          f"kl curve {kls[0]:.4f} -> {kls[-1]:.4f} (all finite)")
    return (os.path.join(save_dir, "vae", "stage_3.pth"),
            (rcs[0], rcs[-1], kls[0], kls[-1]))


def score_vae(modality, ckpt, val_graphs, seed=0):
    """Same held-out protocol as curriculum_parity.score_ours, with the
    variational head (scores use the posterior MEAN path — forward without
    rng samples the mean, matching reference eval)."""
    import jax.numpy as jnp

    from mgvae_tpu.api import Model
    from mgvae_tpu.models.dg_ae import decode_edges, hs_decompose
    from mgvae_tpu.utils.circuit import get_function_acc
    from mgvae_tpu.utils.metrics import average_precision_score, roc_auc_score

    m = Model(modality=modality, layernorm=True, variational=True)
    m.load(ckpt)
    rng = np.random.default_rng(seed)
    accs, y_true, y_score = [], [], []
    for g in val_graphs:
        hs, hf = m.forward(g)
        acc = get_function_acc(g, np.asarray(hf), samples=50)
        if acc >= 0:
            accs.append(acc)
        e = g.num_edges
        if e == 0:
            continue
        s, t = hs_decompose(m.params, jnp.asarray(hs))
        pos = decode_edges(s, t, g.edge_index[0], g.edge_index[1])
        neg_i = sample_negatives(rng, g.num_nodes, e)
        neg = decode_edges(s, t, neg_i[0], neg_i[1])
        y_true.extend([1] * e + [0] * e)
        y_score.extend(np.asarray(pos).tolist() + np.asarray(neg).tolist())
    y_true, y_score = np.asarray(y_true), np.asarray(y_score)
    return (float(np.mean(accs)) if accs else -1.0,
            roc_auc_score(y_true, y_score), average_precision_score(y_true, y_score))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    modality = sys.argv[1] if len(sys.argv) > 1 else "mig"
    kl_weight = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01

    work = tempfile.mkdtemp(prefix="mgvae_vae_")
    ckpt, (rc0, rc1, kl0, kl1) = train_vae(modality, kl_weight, work)
    val_graphs = gen_graphs(modality, N_VAL, seed=997)
    fa, auc, ap = score_vae(modality, ckpt, val_graphs)
    print(f"[vae {modality}] held-out func-acc {fa:.4f} AUC {auc:.4f} AP {ap:.4f}")

    md = [
        "",
        f"## DG_VAE training evidence ({modality}, kl_weight {kl_weight}, "
        f"stage_epochs {','.join(map(str, STAGE_EPOCHS))}, {N_TRAIN} train / "
        f"{N_VAL} held-out circuits, CPU)",
        "",
        "The fixed variational path (quirk 12) TRAINED with a real KL term",
        "(the reference computes KL every step but never weights it in —",
        "trainer.py:145-151). Curves finite end to end; held-out scoring by",
        "the same protocol as the DG_AE curriculum tables",
        "(benchmarks/vae_evidence.py):",
        "",
        "| recon first→last | KL first→last | func-acc | recon AUC | AP |",
        "|---|---|---|---|---|",
        f"| {rc0:.4f} → {rc1:.4f} | {kl0:.4f} → {kl1:.4f} | {fa:.4f} "
        f"| {auc:.4f} | {ap:.4f} |",
    ]
    with open(os.path.join(REPO, "benchmarks", "E2E.md"), "a") as f:
        f.write("\n".join(md) + "\n")
    print("appended to benchmarks/E2E.md")


if __name__ == "__main__":
    main()
