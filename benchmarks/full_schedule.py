"""Full-schedule quality run (VERDICT r2 item 7): the reference's REAL
3-stage curriculum (stage_epochs 100,60,60; train.py:81-85 semantics /
reference DG_VAE/train.py) on a realistic-size synthetic dataset, scoring
the model the way the reference scores it:

  * get_function_acc (utils/utils.py:111-147 rebuild): pairwise-ranking
    accuracy of functional embeddings on held-out circuits
  * recon ROC-AUC / AP of the structural decoder (pos edges vs sampled
    negatives), sklearn-free metrics tested vs sklearn

Usage (TPU host): python benchmarks/full_schedule.py [modality] [out_dir]
Appends a per-stage table to benchmarks/E2E.md.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TRAIN = 800
N_VAL = 60
STAGE_EPOCHS = "100,60,60"


def gen_graphs(modality: str, n: int, seed: int):
    from mgvae_tpu.data.synthetic import random_circuit

    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        gates = int(rng.integers(80, 600))
        out.append(random_circuit(
            rng, modality, num_inputs=int(rng.integers(6, 24)),
            num_gates=gates, num_tt_pairs=min(128, 2 * gates), name=f"c{i}",
        ))
    return out


def score(model, graphs, seed=0):
    """func-acc + recon ROC-AUC/AP over a list of held-out circuits."""
    from mgvae_tpu.models.dg_ae import decode_edges, hs_decompose
    from mgvae_tpu.utils.circuit import get_function_acc
    from mgvae_tpu.utils.metrics import average_precision_score, roc_auc_score

    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    accs, y_true, y_score = [], [], []
    for g in graphs:
        hs, hf = model.forward(g)
        acc = get_function_acc(g, np.asarray(hf), samples=50)
        if acc >= 0:
            accs.append(acc)
        s, t = hs_decompose(model.params, jnp.asarray(hs))
        e = g.num_edges
        if e == 0:
            continue
        pos = decode_edges(s, t, g.edge_index[0], g.edge_index[1])
        neg_src = rng.integers(0, g.num_nodes, e)
        neg_dst = (neg_src + 1 + rng.integers(0, g.num_nodes - 1, e)) % g.num_nodes
        neg = decode_edges(s, t, neg_src, neg_dst)
        y_true.extend([1] * e + [0] * e)
        y_score.extend(np.asarray(pos).tolist() + np.asarray(neg).tolist())
    y_true, y_score = np.asarray(y_true), np.asarray(y_score)
    return (float(np.mean(accs)) if accs else -1.0,
            roc_auc_score(y_true, y_score), average_precision_score(y_true, y_score))


def main():
    modality = sys.argv[1] if len(sys.argv) > 1 else "mig"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="mgvae_fs_")
    from mgvae_tpu.data.npz import save_npz

    data_dir = os.path.join(work, "data")
    os.makedirs(data_dir, exist_ok=True)
    train_graphs = gen_graphs(modality, N_TRAIN, seed=11)
    val_graphs = gen_graphs(modality, N_VAL, seed=997)  # held out entirely
    save_npz(train_graphs,
             os.path.join(data_dir, "graphs.npz"),
             os.path.join(data_dir, "labels.npz"), modality)

    save_dir = os.path.join(work, "exp")
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--exp_id", "fs", "--model", "DG_AE", "--type", modality,
        "--batch_size", "16", "--layernorm", "--distributed",
        "--data_dir", data_dir, "--save_dir", save_dir,
        "--stage_epochs", STAGE_EPOCHS, "--seed", "7",
    ]
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO, timeout=14000)
    if r.returncode != 0:
        raise RuntimeError("train.py failed")

    from mgvae_tpu.api import Model

    rows = []
    for stage in (1, 2, 3):
        ckpt = os.path.join(save_dir, "fs", f"stage_{stage}.pth")
        m = Model(modality=modality, layernorm=True)
        m.load(ckpt)
        fa, auc, ap = score(m, val_graphs)
        rows.append((stage, fa, auc, ap))
        print(f"[stage {stage}] func-acc {fa:.4f}  recon ROC-AUC {auc:.4f}  AP {ap:.4f}",
              flush=True)

    # untrained baseline for context
    m0 = Model(modality=modality, layernorm=True)
    fa0, auc0, ap0 = score(m0, val_graphs)
    print(f"[untrained] func-acc {fa0:.4f}  ROC-AUC {auc0:.4f}  AP {ap0:.4f}", flush=True)

    md = [
        "",
        f"## Full-schedule quality run ({modality}, stage_epochs {STAGE_EPOCHS}, "
        f"{N_TRAIN} train / {N_VAL} held-out circuits)",
        "",
        "Functional-embedding ranking accuracy (`get_function_acc`, the",
        "reference's quality metric) and structural-decoder ROC-AUC/AP on",
        "held-out circuits, per curriculum stage:",
        "",
        "| model | func-acc | recon ROC-AUC | recon AP |",
        "|---|---|---|---|",
        f"| untrained | {fa0:.4f} | {auc0:.4f} | {ap0:.4f} |",
    ]
    for stage, fa, auc, ap in rows:
        md.append(f"| stage {stage} | {fa:.4f} | {auc:.4f} | {ap:.4f} |")
    with open(os.path.join(REPO, "benchmarks", "E2E.md"), "a") as f:
        f.write("\n".join(md) + "\n")
    print("appended to benchmarks/E2E.md")


if __name__ == "__main__":
    main()
