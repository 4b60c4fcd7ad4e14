"""Single-buffer host->device batch transfer.

A collated batch is ~33 arrays. Measured on the tunneled TPU: device_put is
async (~0.7 ms dispatch each, latency hidden), so per-array feeding is not
the single-device bottleneck — but each put still costs host-side Python +
transfer bookkeeping, and under a dp mesh a per-array NamedSharding put
slices every array per device in Python. ArenaPacker packs the whole batch
into ONE contiguous uint8 arena host-side (one memcpy pass over the batch
bytes), ships it in a single (sharded) transfer, and splits it back into
typed arrays on device with one jitted unpack call (static offsets ->
slice + bitcast; XLA fuses the copies). Single-device wall clock is neutral
(e2e A/B: 559 vs 568 g/s); the win is host CPU per step and the dp path.

``to_device_steps`` packs a GROUP of K same-shape step batches into one
[K, (dp,) bytes] arena for the multi-step scanned train step
(train/step.make_multi_step) — K steps ride one transfer + one dispatch.

A fresh arena is allocated per call: the CPU backend may zero-copy alias
numpy buffers into jax Arrays, so reuse would corrupt in-flight batches
(allocation is cheap under the heap tuning in utils/hostmem).
"""
from __future__ import annotations

import functools

import jax
import numpy as np

_ALIGN = 8


def _layout(batch: dict, n_lead: int):
    """((key, dtype_str, per-item shape, offset), ...), total per-item bytes.
    ``n_lead`` leading axes (step/dp) are excluded from the per-item shape."""
    items = []
    off = 0
    for k in sorted(batch):
        a = np.asarray(batch[k])
        shape = a.shape[n_lead:]
        nbytes = int(np.prod(shape, dtype=np.int64)) * a.dtype.itemsize
        off = (off + _ALIGN - 1) // _ALIGN * _ALIGN
        items.append((k, a.dtype.str, tuple(int(s) for s in shape), off))
        off += nbytes
    return tuple(items), off


@functools.lru_cache(maxsize=64)
def _make_unpack(items, total, n_lead):
    def unpack(arena):  # arena: [*lead, B] u8
        out = {}
        lead = arena.shape[:n_lead]
        for k, dt, shape, off in items:
            dtype = np.dtype(dt)
            n = int(np.prod(shape, dtype=np.int64))
            nbytes = n * dtype.itemsize
            start = (0,) * n_lead + (off,)
            limit = tuple(lead) + (off + nbytes,)
            raw = jax.lax.slice(arena, start, limit)
            raw = raw.reshape(tuple(lead) + (n, dtype.itemsize))
            if dtype == np.bool_:
                v = raw[..., 0] != 0
            else:
                v = jax.lax.bitcast_convert_type(raw, dtype)
            out[k] = v.reshape(tuple(lead) + shape)
        return out

    return jax.jit(unpack)


class ArenaPacker:
    """to_device(batch of numpy arrays) -> dict of device arrays, one
    transfer. ``mesh``: optional dp mesh — every key must then carry a
    leading [dp] axis (the collate_shards layout)."""

    def __init__(self, mesh=None):
        self.mesh = mesh

    def _put(self, arena, n_lead):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # dp is always the LAST lead axis (arena [.., dp, B])
            spec = P(*((None,) * (n_lead - 1) + ("dp",)))
            return jax.device_put(arena, NamedSharding(self.mesh, spec))
        return jax.device_put(arena)

    def to_device(self, batch: dict) -> dict:
        n_lead = 1 if self.mesh is not None else 0
        items, total = _layout(batch, n_lead)
        lead = ()
        if n_lead:
            lead = (int(np.asarray(next(iter(batch.values()))).shape[0]),)
        arena = np.zeros(lead + (total,), np.uint8)
        for k, dt, shape, off in items:
            a = np.asarray(batch[k])
            nbytes = int(np.prod(shape, dtype=np.int64)) * np.dtype(dt).itemsize
            if not nbytes:
                continue
            src = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
            arena[..., off : off + nbytes] = src.reshape(lead + (nbytes,))
        return _make_unpack(items, total, n_lead)(self._put(arena, n_lead))

    def to_device_steps(self, batches: list) -> dict:
        """Pack K same-shape step batches -> leaves with a leading [K] axis
        (with a mesh: [K, dp, ...]), in one transfer + one unpack."""
        k_steps = len(batches)
        per_lead = 1 if self.mesh is not None else 0
        n_lead = per_lead + 1
        items, total = _layout(batches[0], per_lead)
        lead = (k_steps,)
        if per_lead:
            lead = lead + (int(np.asarray(next(iter(batches[0].values()))).shape[0]),)
        arena = np.zeros(lead + (total,), np.uint8)
        for step, batch in enumerate(batches):
            row = arena[step]
            for k, dt, shape, off in items:
                a = np.asarray(batch[k])
                nbytes = int(np.prod(shape, dtype=np.int64)) * np.dtype(dt).itemsize
                if not nbytes:
                    continue
                src = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
                row[..., off : off + nbytes] = src.reshape(lead[1:] + (nbytes,))
        return _make_unpack(items, total, n_lead)(self._put(arena, n_lead))
