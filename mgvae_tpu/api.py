"""Object-style public API mirroring the reference's ``deepgate`` surface.

Reference users write (examples/feature_extract_bench.py:13-26):

    model = deepgate.Model()
    model.load_pretrained()
    graph = deepgate.BenchParser().read_bench(path)
    hs, hf = model(graph)

This module provides the same ergonomics on top of the functional core:
``Model`` holds (cfg, params, state) and jit-caches per input shape.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .data.batching import collate, collate_fit
from .data.graph import CircuitGraph
from .models import dg_ae
from .models.dg_ae import DGConfig, init_params
from .train import losses as losses_mod
from .utils.checkpoint import load_checkpoint, load_torch_checkpoint, save_checkpoint


class Model:
    """Per-modality DG_AE/DG_VAE model with an object API.

    NOTE the reference's ``deepgate.Model`` is the XAG model due to import
    shadowing (deepgate/__init__.py:1-4, SURVEY.md §8 quirk 2) — we keep
    that default for drop-in compatibility.
    """

    def __init__(
        self,
        modality: str = "xag",
        dim_hidden: int = 64,
        dim_feature: int = 6,
        s_rounds: int = 4,
        t_rounds: int = 4,
        layernorm: bool = False,
        variational: bool = False,
        input_quirk: bool = True,
        num_rounds: int = 1,
        seed: int = 0,
        params=None,
        state=None,
    ):
        self.cfg = DGConfig(
            modality=modality, dim_hidden=dim_hidden, dim_feature=dim_feature,
            s_rounds=s_rounds, t_rounds=t_rounds, layernorm=layernorm,
            variational=variational, input_quirk=input_quirk, num_rounds=num_rounds,
        )
        if params is None:
            params, state = init_params(jax.random.PRNGKey(seed), self.cfg)
        self.params, self.state = params, state
        cfg = self.cfg

        def _fwd_fn(p, b, r):
            use_pallas = False
            if jax.default_backend() == "tpu" and cfg.num_rounds == 1:
                # VMEM-resident kernel (one (chunk, level) grid for chunked
                # batches); the HBM-streaming variant for giant single
                # graphs — both beat the XLA scan for inference.
                from .ops.pallas.level_kernel import kernel_fits, kernel_fits_hbm

                lv = b["lv_nodes"]
                C = lv.shape[0] if lv.ndim == 3 else 1
                n_sub = b["gate"].shape[0] // C
                ep, np_ = b["lv_edge_src"].shape[-1], lv.shape[-1]
                use_pallas = kernel_fits(n_sub, ep, np_, cfg.dim_hidden) or (
                    C == 1 and kernel_fits_hbm(n_sub, ep, np_, cfg.dim_hidden)
                )
            return dg_ae.forward(p, b, cfg, rng=r, use_pallas=use_pallas)

        self._fwd = jax.jit(_fwd_fn)
        self._rng = jax.random.PRNGKey(seed + 17)

    # ------------------------------------------------------------------
    def __call__(self, graph):
        return self.forward(graph)

    def forward(self, graph):
        """graph: CircuitGraph | list[CircuitGraph] | prepared batch dict.
        Returns (hs, hf) cropped to real nodes for single graphs."""
        crop = None
        if isinstance(graph, CircuitGraph):
            crop = graph.num_nodes
            batch = collate([graph])
        elif isinstance(graph, (list, tuple)):
            # large lists auto-chunk so the fused kernel applies at any size
            batch = collate_fit(list(graph))
            crop = int(batch["n_nodes"])
        else:
            batch = graph
        batch = jax.device_put(batch)  # ONE batched h2d transfer (tunnel: ~1 round trip, not 33)
        rng = None
        if self.cfg.variational:
            self._rng, rng = jax.random.split(self._rng)
        hs, hf, aux = self._fwd(self.params, batch, rng)
        self._last_aux = aux
        # undo the batcher's level-major renumbering: row i = input node i
        if "node_inv" in batch:
            hs, hf = hs[batch["node_inv"]], hf[batch["node_inv"]]
        if crop is not None:
            hs, hf = hs[:crop], hf[:crop]
        return hs, hf

    def encode_many(self, graphs, batch_size: int = 16):
        """Batch-extract embeddings for many circuits: buckets by collated
        shape to minimize recompiles, returns per-graph (hs, hf) numpy pairs
        in input order — the production serving path."""
        import numpy as np

        out = [None] * len(graphs)
        for start in range(0, len(graphs), batch_size):
            chunk = graphs[start : start + batch_size]
            batch = jax.device_put(collate(chunk))  # one batched h2d transfer
            rng = None
            if self.cfg.variational:
                self._rng, rng = jax.random.split(self._rng)
            hs, hf, _ = self._fwd(self.params, batch, rng)
            inv = np.asarray(batch["node_inv"])
            hs = np.asarray(hs)[inv]
            hf = np.asarray(hf)[inv]
            off = 0
            for i, g in enumerate(chunk):
                n = g.num_nodes
                out[start + i] = (hs[off : off + n], hf[off : off + n])
                off += n
        return out

    def pred_prob(self, hf):
        """Probability readout (eval mode, running BN stats)."""
        from .ops.mlp import mlp_apply

        out, _ = mlp_apply(
            self.params["readout_prob"], self.state["readout_prob"], hf,
            train=False, p_drop=0.2, act="relu",
        )
        return jnp.clip(out[:, 0:1], 0.0, 1.0)

    def recon_loss(self, hs, pos_edge_index, rng=None):
        """Standalone recon loss on an explicit positive edge set."""
        pos_edge_index = jnp.asarray(pos_edge_index)
        e = pos_edge_index.shape[1]
        n = hs.shape[0]
        batch = {
            "edge_src": pos_edge_index[0].astype(jnp.int32),
            "edge_dst": pos_edge_index[1].astype(jnp.int32),
            "edge_valid": jnp.ones(e, dtype=bool),
            "n_edges": jnp.int32(e),
            "n_nodes": jnp.int32(n),
        }
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        loss, metrics = losses_mod.recon_loss(self.params, hs, batch, rng)
        return loss, metrics

    # ------------------------------------------------------------------
    def save(self, path: str):
        save_checkpoint(path, 0, self.params, self.state, (), 0.0)

    def load(self, model_path: str):
        """Load either an mgvae_tpu msgpack checkpoint or a torch .pth."""
        with open(model_path, "rb") as f:
            magic = f.read(2)
        if magic == b"PK" or model_path.endswith(".pt") or _is_torch_pickle(model_path):
            _, self.params, self.state = load_torch_checkpoint(model_path, self.cfg)
        else:
            _, _, self.params, self.state, _ = load_checkpoint(
                model_path, self.params, self.state, ()
            )
        return self

    def load_pretrained(self, pretrained_model_path: str = ""):
        if pretrained_model_path == "":
            pretrained_model_path = os.path.join(
                os.path.dirname(__file__), "pretrained", "model.pth"
            )
        return self.load(pretrained_model_path)


def _is_torch_pickle(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(8)
    return head[:2] in (b"PK", b"\x80\x02", b"\x80\x03", b"\x80\x04", b"\x80\x05")
