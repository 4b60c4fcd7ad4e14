"""Clean-room PyTorch implementation of the reference semantics (CPU).

Serves two roles:
  1. Numerical-parity oracle for tests: identical math to
     959AI994/Multi-Gate-VAE's live path, written from a behavioral spec
     (SURVEY.md §3.3) using plain torch (index_add_ replaces torch_scatter,
     manual segment softmax replaces PyG softmax) since torch_geometric is
     not installed here.
  2. CPU PyTorch baseline for bench.py (BASELINE.md: ">=10x graphs/sec vs
     the CPU PyTorch reference"), including the reference's per-level
     python ``subgraph`` edge filtering cost model (dag_utils.py:91-105).

state_dict keys intentionally match the reference module names
(e.g. ``mig_struct_encoder.source_conv.aggr.msg.weight``) so the converter
in mgvae_tpu.utils.torch_compat doubles as a loader for real reference
checkpoints.
"""
from __future__ import annotations

import torch
from torch import nn

EPS = 1e-15

# gate-id -> module-name per modality (reference masks; SURVEY.md §8 quirk 4)
GATE_MODULES = {
    "aig": {1: "and", 2: "not"},
    "mig": {2: "not", 3: "and", 4: "or", 1: "maj"},
    "xag": {3: "and", 2: "not", 5: "xor"},
    "xmg": {3: "and", 2: "not", 5: "xor", 1: "maj", 4: "or"},
}
STRUCT_ATTR = {
    "aig": "struct_encoder",
    "mig": "mig_struct_encoder",
    "xag": "xag_struct_encoder",
    "xmg": "xmg_struct_encoder",
}


def segment_softmax(scores, index, num):
    m = torch.full((num,), -1e30, dtype=scores.dtype)
    m = m.scatter_reduce(0, index, scores, "amax", include_self=True)
    ex = (scores - m[index]).exp()
    den = torch.zeros(num, dtype=scores.dtype).index_add_(0, index, ex)
    return ex / (den[index] + 1e-16)


class TFMlpAggr(nn.Module):
    """arch/tfmlp.py:11-52 without PyG."""

    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.attn_lin = nn.Linear(out_channels * 2, 1)
        self.msg_q = nn.Linear(in_channels, out_channels)
        self.msg_k = nn.Linear(in_channels, out_channels)
        self.msg_v = nn.Linear(in_channels, out_channels)

    def forward(self, x, edge_index):
        n = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        q = self.msg_q(x[dst])
        k = self.msg_k(x[src])
        a = self.attn_lin(torch.cat([q, k], dim=-1)).squeeze(-1)
        a = segment_softmax(a, dst, n)
        v = self.msg_v(x[src]) * a.unsqueeze(-1)
        out = torch.zeros(n, v.shape[1], dtype=x.dtype)
        return out.index_add_(0, dst, v)


class AggConv(nn.Module):
    """arch/gcn_conv.py:15-45 (sum of Linear(x_src) per dst)."""

    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.msg = nn.Linear(in_channels, out_channels)

    def forward(self, x, edge_index):
        # x: [1, N, D] as in the reference's node_state
        src, dst = edge_index[0], edge_index[1]
        m = self.msg(x[0][src])
        out = torch.zeros(x.shape[1], m.shape[1], dtype=x.dtype)
        out.index_add_(0, dst, m)
        return out.unsqueeze(0)


class MultiGCNEncoder(nn.Module):
    """digae_layer.py:232-277 (shared LayerNorm after both halves)."""

    def __init__(self, num_rounds, dim_hidden, dim_feature, layernorm):
        super().__init__()
        self.num_rounds = num_rounds
        self.layernorm = layernorm
        self.dim_hidden = dim_hidden
        self.aggr = AggConv(dim_hidden, dim_hidden)
        self.update = nn.GRU(dim_hidden + dim_feature, dim_hidden)
        self.aggr_r = AggConv(dim_hidden, dim_hidden)
        self.update_r = nn.GRU(dim_hidden + dim_feature, dim_hidden)
        if layernorm:
            self.ln = nn.LayerNorm(dim_hidden)

    def forward(self, x, edge_index):
        n = len(x)
        state = torch.ones(1, n, self.dim_hidden)
        r_edge = torch.stack([edge_index[1], edge_index[0]], dim=0)
        for _ in range(self.num_rounds):
            msg = self.aggr(state, edge_index)
            _, state = self.update(torch.cat([msg, x.unsqueeze(0)], dim=-1), state)
            if self.layernorm:
                state = self.ln(state)
            msg = self.aggr_r(state, r_edge)
            _, state = self.update_r(torch.cat([msg, x.unsqueeze(0)], dim=-1), state)
            if self.layernorm:
                state = self.ln(state)
        return state.squeeze(0)


class DirectMultiGCNEncoder(nn.Module):
    def __init__(self, dim_feature=3, dim_hidden=128, s_rounds=1, t_rounds=1, layernorm=False):
        super().__init__()
        self.source_conv = MultiGCNEncoder(s_rounds, dim_hidden, dim_feature, layernorm)
        self.target_conv = MultiGCNEncoder(t_rounds, dim_hidden, dim_feature, layernorm)

    def forward(self, s, t, edge_index):
        return self.source_conv(s, edge_index), self.target_conv(t, edge_index)


def subgraph(target_idx, edge_index, dim=1):
    """dag_utils.py:91-105 verbatim semantics — the reference's O(|T|*E)
    python hot loop, kept for honest baseline timing."""
    le_idx = []
    for n in target_idx:
        ne_idx = edge_index[dim] == n
        le_idx += [ne_idx.nonzero().squeeze(-1)]
    le_idx = torch.cat(le_idx, dim=-1)
    return edge_index[:, le_idx]


class ReferenceModel(nn.Module):
    """The per-modality Model (dg_ae_model_*.py) with per-type branches."""

    def __init__(self, modality="mig", dim_hidden=64, dim_feature=6,
                 s_rounds=4, t_rounds=4, layernorm=False, num_rounds=1):
        super().__init__()
        self.modality = modality
        self.dim_hidden = dim_hidden
        self.num_rounds = num_rounds
        enc = DirectMultiGCNEncoder(dim_feature, dim_hidden, s_rounds, t_rounds, layernorm)
        setattr(self, STRUCT_ATTR[modality], enc)
        self.hs_linear = nn.Linear(dim_hidden * 2, dim_hidden)
        self.hs_decompose = nn.Linear(dim_hidden, dim_hidden * 2)
        self.gate_modules = GATE_MODULES[modality]
        for name in self.gate_modules.values():
            setattr(self, f"aggr_{name}_func", TFMlpAggr(dim_hidden * 2, dim_hidden))
            setattr(self, f"update_{name}_func", nn.GRU(dim_hidden, dim_hidden))
        self.readout_prob = self._make_readout(dim_hidden)

    @staticmethod
    def _make_readout(dim_hidden):
        # MLP(D, 32, 1, num_layer=3, p_drop=0.2, batchnorm, relu) (mlp.py:14-52)
        return nn.Sequential(
            nn.Linear(dim_hidden, 32), nn.BatchNorm1d(32), nn.ReLU(), nn.Dropout(0.2),
            nn.Linear(32, 32), nn.BatchNorm1d(32), nn.ReLU(), nn.Dropout(0.2),
            nn.Linear(32, 1),
        )

    @property
    def struct_encoder_module(self):
        return getattr(self, STRUCT_ATTR[self.modality])

    def forward(self, gate, edge_index, forward_level, input_quirk=True):
        n = len(gate)
        num_layers_f = int(forward_level.max()) + 1
        ids = (gate == 1).long() if input_quirk else gate.long()
        one_hot = torch.nn.functional.one_hot(ids, num_classes=6).float()
        s, t = self.struct_encoder_module(one_hot, one_hot, edge_index)
        hf = torch.zeros(n, self.dim_hidden)
        hs = self.hs_linear(torch.cat([s, t], dim=-1))
        node_state = torch.cat([hs, hf], dim=-1)
        masks = {gid: gate == gid for gid in self.gate_modules}
        index = torch.arange(n)
        for _ in range(self.num_rounds):
            for level in range(1, num_layers_f):
                layer_mask = forward_level == level
                for gid, name in self.gate_modules.items():
                    l_node = index[layer_mask & masks[gid]]
                    if l_node.numel() == 0:
                        continue
                    sub_edges = subgraph(l_node, edge_index, dim=1)
                    msg = getattr(self, f"aggr_{name}_func")(node_state, sub_edges)
                    m = msg.index_select(0, l_node)
                    h = hf.index_select(0, l_node)
                    _, h2 = getattr(self, f"update_{name}_func")(m.unsqueeze(0), h.unsqueeze(0))
                    hf[l_node, :] = h2.squeeze(0)
                node_state = torch.cat([hs, hf], dim=-1)
        return hs, hf

    def recon_loss(self, hs, pos_edge_index, neg_edge_index):
        s, t = self.hs_decompose(hs).chunk(2, dim=-1)
        pos_pred = torch.sigmoid((s[pos_edge_index[0]] * t[pos_edge_index[1]]).sum(-1))
        neg_pred = torch.sigmoid((s[neg_edge_index[0]] * t[neg_edge_index[1]]).sum(-1))
        pos_loss = -torch.log(pos_pred + EPS).mean()
        neg_loss = -torch.log(1 - neg_pred + EPS).mean()
        pred_bin = torch.cat([(pos_pred > 0.5).int(), (neg_pred > 0.5).int()])
        gt_bin = torch.cat([torch.ones_like(pos_pred), torch.zeros_like(neg_pred)]).int()
        return pos_loss + neg_loss, pred_bin, gt_bin

    def pred_prob(self, hf):
        return torch.clamp(self.readout_prob(hf), 0.0, 1.0)


def zero_normalization(x):
    return (x - x.mean()) / x.std()


def run_losses(model, hs, hf, batch_edges, neg_edges, prob, tt_pair, tt_dis):
    """trainer.py:131-174 loss math on explicit tensors."""
    recon, pred_bin, gt_bin = model.recon_loss(hs, batch_edges, neg_edges)
    p = model.pred_prob(hf)
    prob_loss = torch.nn.functional.l1_loss(p, prob)
    a, b = hf[tt_pair[0]], hf[tt_pair[1]]
    emb_dis = 1 - torch.cosine_similarity(a, b, eps=1e-8)
    func_loss = torch.nn.functional.l1_loss(
        zero_normalization(emb_dis), zero_normalization(tt_dis)
    )
    return recon, prob_loss, func_loss, pred_bin, gt_bin
