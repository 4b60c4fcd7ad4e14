"""Training runtime: the reference Trainer (trainer.py:20-278), TPU-native.

Differences from the reference, all deliberate and documented:
  * gradients ARE synchronized across data-parallel devices (pmean inside
    the jitted step) — the reference inits NCCL but never wraps DDP, so its
    ranks diverge (SURVEY.md §8 quirk 1);
  * no optimizer step in the val phase (reference runs a no-op
    optimizer.step() there, quirk 8);
  * the O(N^2) edge-split mask is gone (quirk 7);
  * binary recon metrics are computed in-graph and fetched once per
    iteration as 5 scalars instead of materializing full prediction vectors
    host-side (trainer.py:236-244).

Public surface mirrors the reference: Trainer(args, model_cfg, ...),
set_training_args, train(num_epoch, train_ds, val_ds), save/load/resume.
"""
from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import (
    collate,
    collate_chunked,
    collate_fit,
    collate_shards,
    collate_split,
    collate_split_step,
)
from ..data.rehydrate import wire_drop
from ..models.dg_ae import DGConfig, init_params
from ..parallel.mesh import make_dp_mesh
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logger import AverageMeter, Logger
from .step import (
    METRIC_KEYS as _METRIC_KEYS,
    SPLIT_WIRE_DERIVABLE,
    make_multi_eval,
    make_multi_step,
    make_optimizer,
    make_train_step,
    set_lr,
)


@jax.jit
def _pack_metrics(m):
    return jnp.stack([m[k] for k in _METRIC_KEYS])


# Counter-based per-step keys: fold_in(epoch_key, global_step) makes the rng
# stream independent of HOW steps are dispatched (per-step vs K-grouped), so
# the multi-step path is bitwise-identical to the per-step path, and a whole
# group's keys cost ONE dispatch (jax.random.split per step measured
# 1.3 ms/step of pure dispatch overhead on the tunneled chip).
_fold1 = jax.jit(jax.random.fold_in)


@functools.partial(jax.jit, static_argnums=2)
def _fold_keys(key, start, k):
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(start + jnp.arange(k))


def _map_leaves(batch: dict, fn):
    """Apply ``fn`` to every array leaf of a batch dict, descending into a
    split batch's ``groups`` tuple (jax.tree.map would also touch python
    scalars; batches are plain dicts of arrays plus that one tuple)."""
    out = {}
    for k, v in batch.items():
        if k == "groups":
            out[k] = tuple({kk: fn(vv) for kk, vv in gb.items()} for gb in v)
        else:
            out[k] = fn(v)
    return out


class Trainer:
    def __init__(
        self,
        args,
        model_cfg: DGConfig,
        params=None,
        state=None,
        training_id: str = "default",
        save_dir: str = "./exp",
        lr: float = 1e-4,
        rc_prob_func_weight=(1.0, 4.0, 2.0),
        kl_weight: float = 0.0,
        batch_size: int = 32,
        distributed: bool = True,
        seed: int = 0,
        num_devices: int | None = None,
        log_every: int = 0,
        trace_dir: str | None = None,
        fixed_dims: bool = True,
        steps_per_call: int = 8,
        split: int | str = "auto",
        thin_wire: bool = True,
    ):
        self.args = args
        self.model_cfg = model_cfg
        # Thin wire: drop collate's derived index tables (fa/ra, lv_*,
        # masks, degrees — ~65% of the narrowed batch bytes) before the
        # host->device transfer; the jitted step rebuilds them bit-exactly
        # on device (data/rehydrate.derive_tables). Applies to unchunked,
        # split-group, chunked, and multihost batches (round 5); only giant
        # single graphs (int32 sort-key overflow) keep the full wire.
        self.thin_wire = thin_wire
        self.lr = lr
        self.lr_step = -1
        self.rc_prob_func_weight = list(rc_prob_func_weight)
        self.kl_weight = kl_weight
        self.batch_size = batch_size
        self.log_every = log_every
        # Fixed-dims mode: keep a RUNNING MAX of the padded batch dims so
        # shapes converge to one compiled step instead of a recompilation
        # storm on real datasets with varied circuit sizes (each distinct
        # bucket combination is a fresh 20s-5min remote TPU compile). The
        # running max only grows, so recompiles are O(log) per dim.
        self.fixed_dims = fixed_dims
        self._dims_max: dict = {}
        # graphs-per-collation-chunk: resolved on first use (None). With
        # fixed dims, batches whose padded dims exceed the fused kernel's
        # VMEM gate are collated as C sub-batches (collate_chunked) so
        # training still rides the kernel's (chunk, level) grid.
        self._chunks: int | None = None
        # shape-aware SPLIT batches (data/batching.collate_split): each
        # shard is partitioned into G shape-sorted groups collated at their
        # OWN dims (losses stay global). Measured +14% over chunked C=3 at
        # bs64 on-chip (benchmarks/README.md round 4), so "auto" engages it
        # whenever each shard yields >= 2 groups of the bs16 class the
        # kernel was tuned at and every group passes the kernel VMEM gate.
        # ``split``: "auto" | 0 (off) | G (forced group count, any backend).
        self.split_arg = split
        self._split: int | None = None      # resolved G (1 = off)
        self._split_dims_max: list = []     # running per-group dims max
        # Split-mode batch layout: None until split engages, then
        # "stratified" (each batch draws its group-g members from dataset-
        # wide shape stratum g — group dims become shuffle-independent, so
        # batch shapes stop growing epoch over epoch) or "uniform" (no
        # shape-key source; running max absorbs the drift).
        self._split_layout: str | None = None
        # per-dataset stats cache for the fixed-dims epoch pre-scan
        # (data/batching.GroupStatsCache), keyed on dataset identity
        self._stats_caches: list = []  # [(dataset, GroupStatsCache)] strong refs
        # Tracing/profiling subsystem (the reference has only wall-clock
        # meters, SURVEY.md §5.1): when set, epoch 0 of every train() call is
        # captured with jax.profiler into trace_dir (view with tensorboard
        # or xprof).
        self.trace_dir = trace_dir
        # Optional step-time capture (long-run p50/p99 evidence): set to a
        # list and every dispatch appends (phase, step, host_seconds); the
        # epoch-end metric fetch appends ("fetch:<phase>", steps, seconds).
        # Dispatches are async, so a slow entry here is HOST-side work
        # (collate/transfer/queue backpressure), while device time pools in
        # the fetch row.
        self.step_times = None

        self.log_dir = os.path.join(save_dir, training_id)
        os.makedirs(self.log_dir, exist_ok=True)

        self.distributed = distributed
        self.mesh = None
        self.num_devices = 1
        if distributed:
            self.mesh = make_dp_mesh(num_devices)
            self.num_devices = self.mesh.devices.size
        self.process_index = jax.process_index()
        self.is_chief = self.process_index == 0

        if params is None:
            params, state = init_params(jax.random.PRNGKey(seed), model_cfg)
        self.params, self.state = params, state
        self.optimizer = make_optimizer(lr)
        self.opt_state = self.optimizer.init(self.params)
        self.train_step, self.eval_step = make_train_step(model_cfg, self.optimizer, self.mesh)
        # K optimizer steps per dispatched program (lax.scan): amortizes the
        # per-dispatch host<->device round trip (~26 ms on a tunneled chip;
        # measured 28 -> 9.3 ms/step at K=8). Tails/odd-shape groups fall
        # back to the per-step path; multi-host keeps per-step (its batches
        # are already global device arrays).
        self.steps_per_call = max(int(steps_per_call), 1)
        self.multi_step = (
            make_multi_step(model_cfg, self.optimizer, self.mesh)
            if self.steps_per_call > 1 else None
        )
        self.multi_eval = (
            make_multi_eval(model_cfg, self.mesh) if self.steps_per_call > 1 else None
        )
        from ..utils.transfer import ArenaPacker

        self._packer = ArenaPacker(self.mesh)
        self.model_epoch = 0
        self._rng = jax.random.PRNGKey(seed + 1)
        self._np_rng = np.random.default_rng(seed + 2)

        if self.is_chief:
            time_str = time.strftime("%Y-%m-%d-%H-%M")
            self.logger = Logger(os.path.join(self.log_dir, f"log-{time_str}.txt"))
            mode = f"data-parallel over {self.num_devices} device(s)" if distributed else "single device"
            print(f"[INFO] Training {mode}; backend={jax.default_backend()}")

    # ------------------------------------------------------------------
    def set_training_args(self, rc_prob_func_weight=(), lr: float = -1, lr_step: int = -1, kl_weight: float = None):
        if len(rc_prob_func_weight) == 3 and list(rc_prob_func_weight) != self.rc_prob_func_weight:
            print(f"[INFO] Update rc_prob_func_weight from {self.rc_prob_func_weight} to {list(rc_prob_func_weight)}")
            self.rc_prob_func_weight = list(rc_prob_func_weight)
        if lr > 0 and lr != self.lr:
            print(f"[INFO] Update learning rate from {self.lr} to {lr}")
            self.lr = lr
            self.opt_state = set_lr(self.opt_state, lr)
        if lr_step > 0 and lr_step != self.lr_step:
            print(f"[INFO] Update learning rate step from {self.lr_step} to {lr_step}")
            self.lr_step = lr_step
        if kl_weight is not None:
            self.kl_weight = kl_weight

    @property
    def weights(self):
        return jnp.asarray(self.rc_prob_func_weight + [self.kl_weight], dtype=jnp.float32)

    # ------------------------------------------------------------------
    def save(self, path: str):
        if self.is_chief:
            save_checkpoint(path, self.model_epoch, self.params, self.state, self.opt_state, self.lr)

    def load(self, path: str):
        epoch, lr, self.params, self.state, self.opt_state = load_checkpoint(
            path, self.params, self.state, self.opt_state
        )
        self.model_epoch = epoch
        self.lr = lr
        self.opt_state = set_lr(self.opt_state, lr)
        print(f"[INFO] Continue training from epoch {self.model_epoch}")
        return path

    def resume(self) -> bool:
        path = os.path.join(self.log_dir, "model_last.pth")
        if os.path.exists(path):
            self.load(path)
            return True
        return False

    # ------------------------------------------------------------------
    def _epoch_plan(self, dataset, shuffle: bool):
        """Shared per-epoch loader setup: shuffled index list, step count,
        fixed dims + chunking choice."""
        idx = np.arange(len(dataset))
        if shuffle:
            self._np_rng.shuffle(idx)
        step_graphs = self.batch_size * self.num_devices
        n_steps = len(idx) // step_graphs
        if n_steps == 0 and self.is_chief and len(dataset):
            print(
                f"[WARN] dataset of {len(dataset)} graphs yields 0 steps at "
                f"batch_size {self.batch_size} x {self.num_devices} device(s) "
                "(drop_last) — epoch will be empty"
            )
        dims = None
        if self.fixed_dims:
            if (self._split is not None and self._split > 1
                    and self._split_layout == "stratified"):
                sidx = self._stratified_perm(dataset, n_steps, step_graphs)
                if sidx is not None:
                    idx = sidx
            dims = self._update_dims_max(dataset, idx, n_steps, step_graphs)
            if isinstance(dims, list) and self._split_layout is None:
                # split just engaged (probed on the uniform layout): switch
                # to the stratified layout, drop the uniform-layout dims
                # from the running max (they are the fat statistics the
                # split exists to avoid), and rescan
                sidx = self._stratified_perm(dataset, n_steps, step_graphs)
                if sidx is None:
                    self._split_layout = "uniform"
                else:
                    self._split_layout = "stratified"
                    self._split_dims_max = []
                    idx = sidx
                    dims = self._update_dims_max(dataset, idx, n_steps, step_graphs)
        return idx, n_steps, step_graphs, dims, (self._chunks or 1)

    def _shape_sort_ids(self, dataset) -> np.ndarray:
        """Dataset ids sorted by the split shape key (max level, edges,
        nodes) — the dataset-wide order whose contiguous quantiles form the
        stratified layout's strata. Uses the native stats cache when
        available, else a python pass."""
        cache = self._get_stats_cache(dataset)
        if cache is not None:
            return np.lexsort((cache.n, cache.e, cache.lmax))
        lmax = np.array([int(dataset[i].forward_level.max(initial=0))
                         for i in range(len(dataset))])
        e = np.array([dataset[i].num_edges for i in range(len(dataset))])
        n = np.array([dataset[i].num_nodes for i in range(len(dataset))])
        return np.lexsort((n, e, lmax))

    def _stratified_perm(self, dataset, n_steps, step_graphs, rng=None):
        """Split-mode epoch layout (bucketed batching): partition the
        dataset into G contiguous shape strata, shuffle WITHIN each
        stratum, and compose every shard from its per-stratum quota — so
        each shard's shape-sorted group g is (ties aside) a random
        m_g-subset of stratum g. Group padded dims then vary only within a
        stratum instead of with the whole shuffle, and batch shapes
        stabilize after one epoch instead of growing (each growth is a
        remote recompile, 20s-5min tunneled). Every graph still appears
        exactly once per epoch; batch composition is stratified by shape —
        the standard sequence-length-bucketing trade, documented in
        CLAUDE.md. Returns None when a stratum cannot fill its quota."""
        G = self._split
        rng = rng if rng is not None else self._np_rng
        order = self._shape_sort_ids(dataset)
        strata = [s[rng.permutation(len(s))] for s in np.array_split(order, G)]
        per = self.batch_size if self.mesh is not None else step_graphs
        sizes = [len(a) for a in np.array_split(np.arange(per), G)]
        n_shards = n_steps * (step_graphs // per)
        if any(n_shards * m > len(s) for m, s in zip(sizes, strata)):
            return None
        shards = [
            np.concatenate([strata[g][j * sizes[g]:(j + 1) * sizes[g]]
                            for g in range(G)])
            for j in range(n_shards)
        ]
        used = np.concatenate(shards) if shards else np.zeros(0, np.int64)
        rest = np.setdiff1d(order, used, assume_unique=True)
        return np.concatenate([used, rest]).astype(np.int64)

    def _split_worstcase_dims(self, dataset, per) -> list | None:
        """Closed-form sup of the stratified layout's per-position dims:
        with group g always an m_g-subset of stratum g, the sum-type dims
        (N, E, P) are maximized by the stratum's top-m_g members by that
        stat, L by any subset holding the max-level member (synthetic worst
        groups, one native call), and the per-level dims NP/EP exactly by
        cache.level_sup (per-level counts are additive across members, so
        the sup is the per-level top-m column sum). Pinning the running max
        at its sup up front matters because every later growth is a remote
        recompile (20s-5min tunneled) — exactly what turned the first split
        e2e measurement from ~2.4s into 21.2s (one EP bucket 256->320).
        Only EBF/EBR (per-128-dst-block edge counts, not additive across
        members) have no closed form; the caller adds a one-bucket margin
        and the running max absorbs any residue."""
        if self._split_layout != "stratified":
            return None
        cache = self._get_stats_cache(dataset)
        if cache is None:
            return None
        from ..data.batching import bucket

        G = self._split
        order = self._shape_sort_ids(dataset)
        strata = np.array_split(order, G)
        sizes = [len(a) for a in np.array_split(np.arange(per), G)]
        groups = []
        for g, st in enumerate(strata):
            m = min(sizes[g], len(st))
            if m == 0:
                return None
            for stat in (cache.n, cache.e, cache.p, cache.lmax):
                groups.append(st[np.argsort(stat[st], kind="stable")[-m:]])
        dl = cache.group_dims(groups)
        if dl is None:
            return None
        out = [{k: max(d[k] for d in dl[g * 4:(g + 1) * 4]) for k in dl[0]}
               for g in range(G)]
        for g, st in enumerate(strata):
            np_sup, ep_sup = cache.level_sup(st, sizes[g])
            out[g]["NP"] = max(out[g]["NP"], bucket(max(np_sup, 1)))
            out[g]["EP"] = max(out[g]["EP"], bucket(max(ep_sup, 1)))
        return out

    def _iter_batches(self, dataset, shuffle: bool, plan=None):
        """Host-side loader: shuffle, drop_last, shard across devices.

        Multi-host (jax.process_count() > 1): the np rng is seeded
        identically on every process, so all processes see the SAME shuffled
        index list and the same global batch layout — the DistributedSampler
        equivalent (trainer.py:179-192). Every process collates the full
        step's shards (deterministic, a few ms, overlapped by the prefetch
        thread — this is how the padded dims are guaranteed to agree across
        processes without communication), then assembles a global jax.Array
        from its local devices' slices."""
        idx, n_steps, step_graphs, dims, C = plan or self._epoch_plan(dataset, shuffle)
        multihost = jax.process_count() > 1 and self.mesh is not None

        def make(s):
            return self._collate_step(dataset, idx, s, step_graphs, dims, C, multihost)

        # background-thread prefetch: host-side collation (python/numpy)
        # overlaps device steps instead of serializing with them
        import queue
        import threading

        # depth >= one multi-step group so a K-group dispatch never waits on
        # collation (host collate overlaps the previous group's device time)
        q: queue.Queue = queue.Queue(maxsize=max(2, self.steps_per_call))

        def producer():
            try:
                for s in range(n_steps):
                    q.put(make(s))
                q.put(None)
            except BaseException as e:  # propagate instead of hanging the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is None:
                break
            if isinstance(b, BaseException):
                raise b
            yield b

    def _collate_step(self, dataset, idx, s, step_graphs, dims, C, multihost):
        chunk = [dataset[i] for i in idx[s * step_graphs : (s + 1) * step_graphs]]
        if isinstance(dims, list):  # split mode: per-group dims
            return self._collate_split_shards(
                [chunk[d * self.batch_size : (d + 1) * self.batch_size]
                 for d in range(self.num_devices)] if self.mesh is not None
                else [chunk],
                dims, stacked=self.mesh is not None)
        if self.mesh is not None:
            shards = [chunk[d * self.batch_size : (d + 1) * self.batch_size] for d in range(self.num_devices)]
            batch = collate_shards(shards, dims=dims, num_chunks=C)
            if self.thin_wire:
                # multihost included (round 5): each process ships its thin
                # slice; the shard_map step derives per member
                batch = wire_drop(batch)
            if multihost:
                return self._globalize(batch)
            return batch
        if dims is None and jax.default_backend() == "tpu":
            # auto-chunk big batches so training rides the fused kernel's
            # (chunk, level) grid instead of falling back to the XLA scan
            batch = collate_fit(chunk)
        elif C > 1:
            batch = collate_chunked(chunk, C, dims=dims)
        else:
            batch = collate(chunk, dims=dims)
        # chunked batches thin too (round 5); wire_drop only refuses giant
        # graphs (int32 sort-key overflow) and stale caches missing counts
        return wire_drop(batch) if self.thin_wire else batch

    def _collate_split_shards(self, shards, dims: list, stacked: bool):
        """collate_split each shard at the epoch's agreed per-group dims.
        node_inv (host-side, sized by the ORIGINAL node count) varies per
        shard and is never read on device — dropped before stacking.
        Stacked groups ride the zero-copy step collate (one C++
        mg_collate_step call per group position); the non-stacked path
        stays python collate_split."""
        if stacked:
            big = collate_split_step(shards, dims)
            # globals the device rebuilds from the groups (step.rehydrate_
            # split) stay off the ~85 MB/s wire
            for k in SPLIT_WIRE_DERIVABLE:
                big.pop(k, None)
            return wire_drop(big) if self.thin_wire else big
        b = collate_split(shards[0], len(dims), dims=dims)
        b.pop("node_inv", None)
        return wire_drop(b) if self.thin_wire else b

    def _update_dims_max(self, dataset, idx, n_steps, step_graphs):
        """Grow the running dims max over this epoch's actual shards (cheap
        native stats pass per shard; falls back to dynamic shapes when the
        native lib is unavailable). On the first call, also picks the
        chunking degree: the smallest C whose per-chunk dims fit the fused
        kernel's VMEM gate. Returns the dims to collate with, or None to
        keep per-batch natural dims."""
        from ..data.batching import (
            _partition_by_size,
            chunked_shard_dims,
            split_dims,
            split_groups_by_shape,
        )

        per = self.batch_size if self.mesh is not None else step_graphs

        def scan_dims(C, steps):
            # batched pre-scan: every (step, shard, chunk) group's dims in
            # ONE threaded native call against the per-dataset stats cache
            cache = self._get_stats_cache(dataset)
            if cache is not None:
                groups = []
                for s in steps:
                    chunk_idx = idx[s * step_graphs : (s + 1) * step_graphs]
                    for d in range(0, len(chunk_idx), per):
                        shard_ids = chunk_idx[d : d + per]
                        if C == 1:
                            groups.append(shard_ids)
                        else:
                            bins = _partition_by_size(cache.n[shard_ids], C)
                            groups.extend(shard_ids[b] for b in bins)
                if groups:
                    dl = cache.group_dims(groups)
                    if dl is not None:
                        return {k: max(d[k] for d in dl) for k in dl[0]}
            # per-shard fallback (no stats cache)
            dmax = {}
            for s in steps:
                chunk_idx = idx[s * step_graphs : (s + 1) * step_graphs]
                for d in range(0, len(chunk_idx), per):
                    shard = [dataset[i] for i in chunk_idx[d : d + per]]
                    sd = chunked_shard_dims(shard, C)
                    if sd is None:
                        return None  # no native lib: stay dynamic
                    for k, v in sd.items():
                        if v > dmax.get(k, 0):
                            dmax[k] = v
            return dmax

        def pick_chunks():
            """Smallest C whose per-chunk dims fit the fused kernel's gate —
            probed on the FIRST step only (the running max self-heals if a
            later dataset/shard outgrows the choice)."""
            if jax.default_backend() != "tpu" or self.model_cfg.num_rounds != 1:
                return 1
            from ..ops.pallas.level_kernel import kernel_fits

            for C in (1, 2, 3, 4, 6, 8):
                if C > max(per // 2, 1):
                    break
                dmax = scan_dims(C, range(min(n_steps, 1)))
                if dmax is None:
                    return None
                if kernel_fits(dmax["N"], dmax["EP"], dmax["NP"],
                               self.model_cfg.dim_hidden):
                    if self.is_chief and C > 1:
                        print(f"[INFO] fixed-dims: collating each shard as {C} kernel-sized chunks")
                    return C
            return 1

        def scan_split_dims(G, steps, use_idx=None):
            """Per-group-position dims maxed over every (step, shard): the
            split-mode analogue of scan_dims. Uses the cached native stats
            pass when available; otherwise materializes the shards through
            split_dims (collate-based — fine for small/test datasets)."""
            cache = self._get_stats_cache(dataset)
            scan_idx = idx if use_idx is None else use_idx
            groups, shards = [], []
            for s in steps:
                chunk_idx = scan_idx[s * step_graphs : (s + 1) * step_graphs]
                for d in range(0, len(chunk_idx), per):
                    shard_ids = chunk_idx[d : d + per]
                    if cache is not None:
                        parts = split_groups_by_shape(
                            cache.lmax[shard_ids], cache.e[shard_ids],
                            cache.n[shard_ids], G)
                        groups.extend(shard_ids[p] for p in parts)
                    else:
                        shards.append([dataset[i] for i in shard_ids])
            if cache is None:
                return split_dims(shards, G) if shards else None
            if not groups:
                return None
            dl = cache.group_dims(groups)
            if dl is None:  # native lib unavailable after all
                return None
            # groups were appended shard-major (G per shard): position g of
            # shard j sits at j*G + g
            return [{k: max(d[k] for d in dl[g::G]) for k in dl[g]}
                    for g in range(G)]

        def pick_split():
            """Resolve the split group count once (mirrors pick_chunks):
            forced by the ``split`` ctor arg, else auto on TPU when each
            shard yields >= 2 bs16-class groups whose dims all pass the
            kernel VMEM gate. Split replaces chunking (collate_split groups
            ARE the kernel-sized units). Multi-host keeps the zero-copy
            collate_shards path (_globalize handles flat dicts only)."""
            if isinstance(self.split_arg, int):
                return max(self.split_arg, 1)
            if (jax.default_backend() != "tpu"
                    or self.model_cfg.num_rounds != 1
                    or jax.process_count() > 1):
                return 1
            G = per // 16
            if G < 2:
                return 1
            dl = scan_split_dims(G, range(min(n_steps, 1)))
            if dl is None:
                return 1
            from ..ops.pallas.level_kernel import kernel_fits

            if all(kernel_fits(d["N"], d["EP"], d["NP"],
                               self.model_cfg.dim_hidden) for d in dl):
                if self.is_chief:
                    print(f"[INFO] fixed-dims: splitting each shard into "
                          f"{G} shape-sorted groups (collate_split)")
                return G
            return 1

        if self._split is None and n_steps:  # defer on empty epochs
            self._split = pick_split()
        if self._split is not None and self._split > 1:
            if n_steps == 0:  # empty epoch (tiny val split): keep split mode
                return [dict(d) for d in self._split_dims_max] or None

            def merge_split(dl):
                # running max per group position: same recompile-avoidance
                # rationale as _dims_max below
                if not self._split_dims_max:
                    self._split_dims_max = [dict(d) for d in dl]
                    return
                for cur, new in zip(self._split_dims_max, dl):
                    for k, v in new.items():
                        if v > cur.get(k, 0):
                            cur[k] = v

            dl = scan_split_dims(self._split, range(n_steps))
            if dl is not None:
                first = not self._split_dims_max
                merge_split(dl)
                if first:
                    # Split dims hug their groups tightly, so a FRESH shuffle
                    # can outgrow epoch-1's max (each growth = a remote
                    # recompile, 20s-5min on the tunneled chip). Pre-grow the
                    # running max over a few extra deterministic layouts so
                    # it starts near its sup instead of climbing epoch by
                    # epoch; the bucketed dims absorb the residue.
                    r = np.random.default_rng(0)
                    for _ in range(8):
                        alt_idx = None
                        if self._split_layout == "stratified":
                            alt_idx = self._stratified_perm(
                                dataset, n_steps, step_graphs, rng=r)
                        if alt_idx is None:
                            alt_idx = r.permutation(len(dataset))
                        alt = scan_split_dims(self._split, range(n_steps),
                                              use_idx=alt_idx)
                        if alt is not None:
                            merge_split(alt)
                    wl = self._split_worstcase_dims(dataset, per)
                    if wl is not None:
                        merge_split(wl)
                        # EBF/EBR have no closed-form subset sup (block
                        # counts aren't additive across members): one
                        # bucket of margin (<= 25% on the fa/ra index
                        # tables only) beats a 20s-5min remote recompile
                        from ..data.batching import bucket

                        for cur in self._split_dims_max:
                            for k in ("EBF", "EBR"):
                                cur[k] = bucket(cur[k] + 1)
                return [dict(d) for d in self._split_dims_max]
            self._split = 1  # no dims source: fall back to the chunk path

        if self._chunks is None:
            self._chunks = pick_chunks()
            if self._chunks is None:
                self._chunks = 1
                return None  # no native lib: stay dynamic

        dmax = scan_dims(self._chunks, range(n_steps))
        if dmax is None:
            return None
        grew = any(v > self._dims_max.get(k, 0) for k, v in dmax.items())
        for k, v in dmax.items():
            if v > self._dims_max.get(k, 0):
                self._dims_max[k] = v
        # self-heal: if the running max outgrew the kernel gate (e.g. a later,
        # larger dataset on the same Trainer), re-pick the chunking
        if grew and jax.default_backend() == "tpu" and self.model_cfg.num_rounds == 1:
            from ..ops.pallas.level_kernel import kernel_fits

            if not kernel_fits(self._dims_max["N"], self._dims_max["EP"],
                               self._dims_max["NP"], self.model_cfg.dim_hidden):
                new_c = pick_chunks()
                if new_c is not None and new_c != self._chunks:
                    self._chunks = new_c
                    self._dims_max = scan_dims(new_c, range(n_steps)) or {}
        return dict(self._dims_max)

    def _get_stats_cache(self, dataset):
        """Build (once per dataset) the concatenated-arrays cache behind the
        batched native stats pass; None when the native lib is unavailable
        or the dataset cannot be snapshotted."""
        from ..data.batching import GroupStatsCache
        from ..native import get_lib

        if get_lib() is None:
            return None
        # small map of caches holding a STRONG reference to each dataset and
        # compared with `is` + len: the train/val alternation keeps both
        # caches live (no rebuild twice per epoch), id() reuse after GC can
        # never serve stale stats, and in-place dataset growth invalidates
        # the entry. Cap 2 (train/val) — each cache materializes every graph
        # and this host has little memory headroom (ADVICE r3).
        for ds_ref, ds_len, cache in self._stats_caches:
            if ds_ref is dataset and ds_len == len(dataset):
                return cache
        cache = GroupStatsCache([dataset[i] for i in range(len(dataset))])
        self._stats_caches.append((dataset, len(dataset), cache))
        if len(self._stats_caches) > 2:
            self._stats_caches.pop(0)
        return cache

    def _globalize(self, batch: dict) -> dict:
        """Assemble global dp-sharded jax.Arrays from this process's slice of
        the stacked shards (multi-host). Local devices own contiguous dp
        rows [p*ld, (p+1)*ld)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        ld = jax.local_device_count()
        lo = self.process_index * ld
        sharding = NamedSharding(self.mesh, P("dp"))

        def to_global(x):
            return jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(x[lo : lo + ld]), x.shape
            )

        return {k: to_global(v) for k, v in batch.items()}

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _iter_grouped(self, dataset, use_multi: bool):
        """Yields ("group", (device_sbatch, k)) / ("single", host_batch).

        When multi-step is active, a prefetch thread collates a whole
        K-step group in ONE zero-copy collate_shards call (the K steps are
        "shards": C++ mg_collate_step fills the stacked [K, (dp,) ...]
        buffers directly), packs it with a single vectorized arena pass,
        and starts the (async) device transfer AHEAD of the consumer — the
        batch bytes over the ~85 MB/s tunnel are the e2e bottleneck, and
        prefetching hides them under the previous group's device time.
        Tails and dynamic-dims epochs fall back to per-step batches."""
        if not use_multi:
            for batch in self._iter_batches(dataset, shuffle=True):
                yield "single", batch
            return

        plan = self._epoch_plan(dataset, shuffle=True)
        idx, n_steps, step_graphs, dims, C = plan
        K = self.steps_per_call
        if dims is None or n_steps < K:
            # dynamic shapes (no native stats) can differ between steps:
            # stacked groups would recompile per group — stay per-step
            for batch in self._iter_batches(dataset, shuffle=True, plan=plan):
                yield "single", batch
            return

        bs = self.batch_size

        def make_group(s0):
            lo = s0 * step_graphs
            chunkg = [dataset[i] for i in idx[lo : lo + K * step_graphs]]
            n_shards = K * self.num_devices
            shards = [chunkg[j * bs : (j + 1) * bs] for j in range(n_shards)]
            if isinstance(dims, list):  # split mode: [K(*dp), ...] stacked
                big = self._collate_split_shards(shards, dims, stacked=True)
            else:
                big = collate_shards(shards, dims=dims, num_chunks=C)
            if self.mesh is not None:  # [K*dp, ...] -> [K, dp, ...]
                reshape = lambda v: v.reshape((K, self.num_devices) + v.shape[1:])
                big = _map_leaves(big, reshape)
            return self._packer.to_device(big, extra_lead=1)

        import queue
        import threading

        n_groups = n_steps // K
        gq: queue.Queue = queue.Queue(maxsize=2)

        def producer():
            try:
                for g in range(n_groups):
                    gq.put(("group", (make_group(g * K), K)))
                for s in range(n_groups * K, n_steps):  # tail: per-step
                    gq.put(("single", self._collate_step(
                        dataset, idx, s, step_graphs, dims, C, False)))
                gq.put(None)
            except BaseException as e:  # propagate instead of hanging
                gq.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = gq.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def _to_device(self, batch: dict) -> dict:
        """ONE host->device transfer for the whole step (utils/transfer):
        cuts ~33 per-array puts (each with host-side sharding/bookkeeping
        cost) to one packed put; on a dp mesh each device receives exactly
        its shard's bytes in a single sharded transfer."""
        leaf = next(iter(batch.values()))
        if isinstance(leaf, jax.Array):  # multi-host: already global arrays
            return batch
        return self._packer.to_device(batch)

    def train(self, num_epoch: int, train_dataset, val_dataset):
        weights = self.weights
        print(f"[INFO] Start training, lr = {self.lr:.6f}")
        tracing = False
        if self.trace_dir and self.is_chief:
            jax.profiler.start_trace(self.trace_dir)
            tracing = True
        phase_meters = {}
        for epoch in range(num_epoch):
            for phase in ("train", "val"):
                ds = train_dataset if phase == "train" else val_dataset
                meters = {k: AverageMeter() for k in ("recon", "prob", "func", "kl", "acc", "tp", "fp", "tn", "fn", "time")}
                # Metrics stay on-device per iteration and are fetched as ONE
                # stacked [steps, 9] array per epoch: a host sync costs ~26 ms
                # on a tunneled chip, so both the reference's per-iteration
                # prediction sync (trainer.py:236-244) AND a per-scalar
                # epoch-end fetch (~10 scalars x steps x 26 ms) would dwarf
                # the ~2 ms device step.
                mkeys = _METRIC_KEYS
                pending = []  # per-step [9] and/or per-group [K, 9] rows
                steps_done = 0
                last_logged = 0
                t0 = time.time()

                def log_progress(last_rows):
                    # grouped runs advance steps_done in strides of K, so a
                    # modulo test can skip every boundary; log on distance
                    nonlocal last_logged
                    if (self.is_chief and self.log_every
                            and steps_done - last_logged >= self.log_every):
                        last_logged = steps_done
                        mm = dict(zip(mkeys, np.asarray(last_rows).reshape(-1, len(mkeys))[-1]))
                        print(
                            f"[{phase} {self.model_epoch}] {epoch}/{num_epoch} it {steps_done} "
                            f"|Recon: {mm['recon_loss']:.4f} |Prob: {mm['prob_loss']:.4f} "
                            f"|Func: {mm['func_loss']:.4f}"
                        )

                # per-step keys are fold_in(epoch_key, step): identical
                # stream whether steps run singly or K-grouped
                self._rng, epoch_key = jax.random.split(self._rng)

                def run_single(batch):
                    nonlocal steps_done
                    batch = self._to_device(batch)
                    rng = _fold1(epoch_key, steps_done)
                    if phase == "train":
                        self.params, self.state, self.opt_state, m = self.train_step(
                            self.params, self.state, self.opt_state, batch, rng, weights
                        )
                    else:
                        m = self.eval_step(self.params, self.state, batch, rng, weights)
                    pending.append(_pack_metrics(m))  # one dispatch per step
                    steps_done += 1
                    log_progress(pending[-1])

                def run_group(sbatch, k):
                    nonlocal steps_done
                    rngs = _fold_keys(epoch_key, steps_done, k)
                    if phase == "train":
                        self.params, self.state, self.opt_state, ms = self.multi_step(
                            self.params, self.state, self.opt_state, sbatch, rngs, weights
                        )
                    else:
                        ms = self.multi_eval(self.params, self.state, sbatch, rngs, weights)
                    pending.append(ms)
                    steps_done += k
                    log_progress(ms)

                use_multi = self.multi_step is not None and jax.process_count() == 1
                for kind, item in self._iter_grouped(ds, use_multi):
                    ts = time.perf_counter() if self.step_times is not None else 0.0
                    if kind == "group":
                        run_group(*item)
                    else:
                        run_single(item)
                    if self.step_times is not None:
                        self.step_times.append((phase, steps_done, time.perf_counter() - ts))
                tf = time.perf_counter() if self.step_times is not None else 0.0
                rows = (
                    np.asarray(jnp.concatenate([p.reshape(-1, len(mkeys)) for p in pending]))
                    if pending else np.zeros((0, len(mkeys)))
                )
                if self.step_times is not None:
                    self.step_times.append(
                        (f"fetch:{phase}", steps_done, time.perf_counter() - tf))
                for row in rows:
                    m = dict(zip(mkeys, (float(x) for x in row)))
                    n_pred = max(m["n_pred"], 1.0)
                    meters["recon"].update(m["recon_loss"])
                    meters["prob"].update(m["prob_loss"])
                    meters["func"].update(m["func_loss"])
                    meters["kl"].update(m["kl_loss"])
                    meters["acc"].update((m["tp"] + m["tn"]) / n_pred)
                    meters["tp"].update(m["tp"] / n_pred)
                    meters["fp"].update(m["fp"] / n_pred)
                    meters["tn"].update(m["tn"] / n_pred)
                    meters["fn"].update(m["fn"] / n_pred)
                meters["time"].update((time.time() - t0) / max(steps_done, 1), n=max(steps_done, 1))
                if phase == "train" and self.model_epoch % 10 == 0:
                    self.save(os.path.join(self.log_dir, f"model_{self.model_epoch}.pth"))
                    self.save(os.path.join(self.log_dir, "model_last.pth"))
                phase_meters[phase] = meters if pending else phase_meters.get(phase, meters)
                if self.is_chief:
                    # reference epoch-line format (trainer.py:208-212); the
                    # KL field is appended ONLY when a nonzero KL was metered
                    # (DG_VAE with kl_weight>0) so AE logs stay byte-parity
                    kl_part = (" |KL: {:.4f}".format(meters["kl"].avg)
                               if meters["kl"].avg else "")
                    self.logger.write(
                        "{}| Epoch: {:}/{:} |Recon: {:.4f} |ACC: {:.2f} |Prob: {:.4f} |Func: {:.4f}{}|Net: {:.2f}s\n".format(
                            phase, epoch, num_epoch, meters["recon"].avg, meters["acc"].avg * 100,
                            meters["prob"].avg, meters["func"].avg, kl_part, meters["time"].avg,
                        )
                    )
            if tracing:  # capture only the first epoch of this stage
                jax.profiler.stop_trace()
                tracing = False
            self.model_epoch += 1
            if self.lr_step > 0 and self.model_epoch % self.lr_step == 0:
                self.lr *= 0.1
                if self.is_chief:
                    print(f"[INFO] Learning rate decay to {self.lr}")
                self.opt_state = set_lr(self.opt_state, self.lr)
        if tracing:
            jax.profiler.stop_trace()
        if not num_epoch:
            return {}
        # last epoch's meters: val phase when it had batches, else train
        # (the val split can be smaller than batch_size under drop_last)
        val_empty = not phase_meters.get("val", meters)["recon"].count
        if val_empty and self.is_chief and not getattr(self, "_warned_empty_val", False):
            self._warned_empty_val = True
            print(
                "[WARN] validation split smaller than batch_size: the val "
                "epoch is empty under drop_last (reference parity) — "
                "returned metrics fall back to TRAIN meters. Early stopping "
                "on these stops on training loss, not validation loss."
            )
        best = phase_meters.get("train", meters) if val_empty else phase_meters.get("val")
        out = {k: v.avg for k, v in best.items()}
        out["train"] = {k: v.avg for k, v in phase_meters.get("train", meters).items()}
        out["val"] = {k: v.avg for k, v in phase_meters.get("val", meters).items()}
        return out
