"""Curriculum-level quality parity vs the torch oracle (VERDICT r3 item 4).

Runs BOTH implementations through the reference's 3-stage curriculum
(reference DG_VAE/train.py:81-101 semantics: stage weights [1,0,0] ->
[1,5,0] -> [1,4,4], Adam lr 1e-4) on the SAME synthetic dataset at
benchmarks/E2E.md scale (120 circuits, stage_epochs 4,4,4, bs16), then
scores both on the SAME held-out circuits with the reference's own quality
metrics: functional-embedding ranking accuracy (utils/utils.py:111-147
rebuild -> mgvae_tpu.utils.circuit.get_function_acc) and structural-decoder
ROC-AUC/AP. Appends a two-column table to benchmarks/E2E.md.

The torch side trains the clean-room oracle (benchmarks/torch_reference.py,
reference trainer.py:131-174 loss math) on PyG-style disjoint-union batches.
One deliberate dev-speed substitution: the per-level edge filter uses a
vectorized ``isin`` instead of the reference's per-node python ``subgraph``
loop — identical math (aggregation is permutation-invariant), ~10x faster
training; the timing baseline in bench.py keeps the real subgraph loop.

Negative-edge protocol is the same for both sides: per step, |pos| fresh
uniform (src, dst != src) pairs over the batch union.

Everything runs on CPU (MGVAE_PLATFORM=cpu) so the run is tunnel-independent
and exactly reproducible.

Usage: python benchmarks/curriculum_parity.py [modality ...]
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TRAIN = 120
N_VAL = 24
STAGE_EPOCHS = (4, 4, 4)
STAGE_WEIGHTS = ((1.0, 0.0, 0.0), (1.0, 5.0, 0.0), (1.0, 4.0, 4.0))
BATCH = 16
LR = 1e-4


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


# --------------------------------------------------------------------------
# torch side
# --------------------------------------------------------------------------

def union_batch(graphs):
    """PyG-style disjoint union (reference utils/batch.py semantics)."""
    import torch

    gate, ei, lvl, prob, ttp, ttd = [], [], [], [], [], []
    off = 0
    for g in graphs:
        gate.append(torch.from_numpy(g.gate).long())
        ei.append(torch.from_numpy(g.edge_index).long() + off)
        lvl.append(torch.from_numpy(g.forward_level).long())
        prob.append(torch.from_numpy(g.prob).float())
        ttp.append(torch.from_numpy(g.tt_pair_index).long() + off)
        ttd.append(torch.from_numpy(g.tt_dis).float())
        off += g.num_nodes
    return (torch.cat(gate), torch.cat(ei, 1), torch.cat(lvl),
            torch.cat(prob).unsqueeze(1), torch.cat(ttp, 1), torch.cat(ttd))


def fast_forward(model, gate, edge_index, forward_level):
    """ReferenceModel.forward with the per-level ``subgraph`` python loop
    replaced by a vectorized edge filter — same math, training-speed."""
    import torch

    n = len(gate)
    num_layers_f = int(forward_level.max()) + 1
    ids = (gate == 1).long()
    one_hot = torch.nn.functional.one_hot(ids, num_classes=6).float()
    s, t = model.struct_encoder_module(one_hot, one_hot, edge_index)
    hf = torch.zeros(n, model.dim_hidden)
    hs = model.hs_linear(torch.cat([s, t], dim=-1))
    node_state = torch.cat([hs, hf], dim=-1)
    dst_gate = gate[edge_index[1]]
    dst_lvl = forward_level[edge_index[1]]
    index = torch.arange(n)
    for level in range(1, num_layers_f):
        layer_mask = forward_level == level
        new_hf = hf
        for gid, name in model.gate_modules.items():
            l_node = index[layer_mask & (gate == gid)]
            if l_node.numel() == 0:
                continue
            emask = (dst_lvl == level) & (dst_gate == gid)
            sub_edges = edge_index[:, emask]
            msg = getattr(model, f"aggr_{name}_func")(node_state, sub_edges)
            m = msg.index_select(0, l_node)
            h = hf.index_select(0, l_node)
            _, h2 = getattr(model, f"update_{name}_func")(m.unsqueeze(0), h.unsqueeze(0))
            new_hf = new_hf.index_copy(0, l_node, h2.squeeze(0))
        hf = new_hf
        node_state = torch.cat([hs, hf], dim=-1)
    return hs, hf


def sample_negatives(rng, n, k):
    src = rng.integers(0, n, k)
    dst = (src + 1 + rng.integers(0, n - 1, k)) % n
    return np.stack([src, dst]).astype(np.int64)


def train_torch(modality, train_graphs, seed=7):
    import torch

    from benchmarks.torch_reference import ReferenceModel, run_losses

    torch.manual_seed(seed)
    model = ReferenceModel(modality, dim_hidden=64, s_rounds=4, t_rounds=4,
                           layernorm=True)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    rng = np.random.default_rng(seed)
    order_rng = np.random.default_rng(seed + 1)
    stage_models = []
    for stage, (epochs, w) in enumerate(zip(STAGE_EPOCHS, STAGE_WEIGHTS), 1):
        for ep in range(epochs):
            order = order_rng.permutation(len(train_graphs))
            tot = np.zeros(3)
            nb = 0
            for i in range(0, len(order) - BATCH + 1, BATCH):
                graphs = [train_graphs[j] for j in order[i:i + BATCH]]
                gate, ei, lvl, prob, ttp, ttd = union_batch(graphs)
                model.train()
                hs, hf = fast_forward(model, gate, ei, lvl)
                neg = torch.from_numpy(sample_negatives(rng, len(gate), ei.shape[1]))
                rc, pl, fl, _, _ = run_losses(model, hs, hf, ei, neg, prob, ttp, ttd)
                loss = w[0] * rc + w[1] * pl + w[2] * fl
                opt.zero_grad()
                loss.backward()
                opt.step()
                tot += [float(rc), float(pl), float(fl)]
                nb += 1
            print(f"  [torch {modality} stage {stage} ep {ep}] "
                  f"recon {tot[0] / nb:.4f} prob {tot[1] / nb:.4f} "
                  f"func {tot[2] / nb:.4f}", flush=True)
        stage_models.append({k: v.clone() for k, v in model.state_dict().items()})
    return model, stage_models


def score_torch(model, state, val_graphs, seed=0):
    import torch

    from mgvae_tpu.utils.circuit import get_function_acc
    from mgvae_tpu.utils.metrics import average_precision_score, roc_auc_score

    model.load_state_dict(state)
    model.eval()
    rng = np.random.default_rng(seed)
    accs, y_true, y_score = [], [], []
    with torch.no_grad():
        for g in val_graphs:
            hs, hf = fast_forward(
                model, torch.from_numpy(g.gate).long(),
                torch.from_numpy(g.edge_index).long(),
                torch.from_numpy(g.forward_level).long(),
            )
            acc = get_function_acc(g, hf.numpy(), samples=50)
            if acc >= 0:
                accs.append(acc)
            e = g.num_edges
            if e == 0:
                continue
            s, t = model.hs_decompose(hs).chunk(2, dim=-1)
            pos = torch.sigmoid((s[g.edge_index[0]] * t[g.edge_index[1]]).sum(-1))
            neg_i = sample_negatives(rng, g.num_nodes, e)
            neg = torch.sigmoid((s[neg_i[0]] * t[neg_i[1]]).sum(-1))
            y_true.extend([1] * e + [0] * e)
            y_score.extend(pos.numpy().tolist() + neg.numpy().tolist())
    y_true, y_score = np.asarray(y_true), np.asarray(y_score)
    return (float(np.mean(accs)) if accs else -1.0,
            roc_auc_score(y_true, y_score), average_precision_score(y_true, y_score))


# --------------------------------------------------------------------------
# our side
# --------------------------------------------------------------------------

def train_ours(modality, work, seed=7):
    from mgvae_tpu.data.npz import save_npz

    data_dir = os.path.join(work, f"data_{modality}")
    os.makedirs(data_dir, exist_ok=True)
    # SAME circuits as the torch run (same gen seed as main())
    save_npz(gen_graphs(modality, N_TRAIN, seed=300),
             os.path.join(data_dir, "graphs.npz"),
             os.path.join(data_dir, "labels.npz"), modality)
    save_dir = os.path.join(work, f"exp_{modality}")
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--exp_id", "cp", "--model", "DG_AE", "--type", modality,
        "--batch_size", str(BATCH), "--layernorm", "--distributed",
        "--data_dir", data_dir, "--save_dir", save_dir,
        "--stage_epochs", ",".join(map(str, STAGE_EPOCHS)), "--seed", str(seed),
    ]
    env = {**os.environ, "MGVAE_PLATFORM": "cpu"}
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO, timeout=7200, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"{modality} train.py failed")
    return [os.path.join(save_dir, "cp", f"stage_{s}.pth") for s in (1, 2, 3)]


def score_ours(modality, ckpt, val_graphs, seed=0):
    import jax.numpy as jnp

    from mgvae_tpu.api import Model
    from mgvae_tpu.models.dg_ae import decode_edges, hs_decompose
    from mgvae_tpu.utils.circuit import get_function_acc
    from mgvae_tpu.utils.metrics import average_precision_score, roc_auc_score

    m = Model(modality=modality, layernorm=True)
    if ckpt is not None:
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

    modalities = sys.argv[1:] or ["aig", "mig"]
    work = tempfile.mkdtemp(prefix="mgvae_cp_")
    md = []
    for modality in modalities:
        train_graphs = gen_graphs(modality, N_TRAIN, seed=300)
        val_graphs = gen_graphs(modality, N_VAL, seed=997)

        print(f"[{modality}] training ours (train.py, CPU)...", flush=True)
        ckpts = train_ours(modality, work)
        print(f"[{modality}] training torch oracle...", flush=True)
        model, stage_states = train_torch(modality, train_graphs)

        rows = []
        for stage in (1, 2, 3):
            fa_o, auc_o, ap_o = score_ours(modality, ckpts[stage - 1], val_graphs)
            fa_t, auc_t, ap_t = score_torch(model, stage_states[stage - 1], val_graphs)
            rows.append((stage, fa_o, auc_o, ap_o, fa_t, auc_t, ap_t))
            print(f"[{modality} stage {stage}] ours func-acc {fa_o:.4f} AUC {auc_o:.4f} "
                  f"AP {ap_o:.4f} | torch func-acc {fa_t:.4f} AUC {auc_t:.4f} "
                  f"AP {ap_t:.4f}", flush=True)

        md += [
            "",
            f"## Curriculum parity vs torch oracle ({modality}, stage_epochs "
            f"{','.join(map(str, STAGE_EPOCHS))}, {N_TRAIN} train / {N_VAL} "
            "held-out circuits, CPU)",
            "",
            "Both implementations through the same 3-stage curriculum on the",
            "same circuits with the same negative-edge protocol, scored with",
            "the reference's quality metrics on the same held-out circuits",
            "(benchmarks/curriculum_parity.py):",
            "",
            "| stage | ours func-acc | ours AUC | ours AP | torch func-acc | torch AUC | torch AP |",
            "|---|---|---|---|---|---|---|",
        ]
        for stage, fa_o, auc_o, ap_o, fa_t, auc_t, ap_t in rows:
            md.append(f"| {stage} | {fa_o:.4f} | {auc_o:.4f} | {ap_o:.4f} "
                      f"| {fa_t:.4f} | {auc_t:.4f} | {ap_t:.4f} |")
    with open(os.path.join(REPO, "benchmarks", "E2E.md"), "a") as f:
        f.write("\n".join(md) + "\n")
    print("appended to benchmarks/E2E.md")


if __name__ == "__main__":
    main()
