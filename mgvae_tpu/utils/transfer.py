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

dp-sharded mode (mesh given): the arena is [dp, B] with shard d's bytes
contiguous in row d and is device_put with NamedSharding(P('dp')) — one
sharded transfer, each device receiving exactly its shard. The unpack
slices along the unsharded byte axis, so sharding propagates and no
collective is inserted.

A fresh arena is allocated per call: the CPU backend may zero-copy alias
numpy buffers into jax Arrays, so reuse would corrupt in-flight batches
(allocation is cheap under the heap tuning in utils/hostmem).
"""
from __future__ import annotations

import functools

import jax
import numpy as np

_ALIGN = 8


def _layout(batch: dict, lead: int | None):
    """((key, dtype_str, per-item shape, offset), ...), total per-item bytes."""
    items = []
    off = 0
    for k in sorted(batch):
        a = np.asarray(batch[k])
        shape = a.shape[1:] if lead is not None else a.shape
        nbytes = int(np.prod(shape, dtype=np.int64)) * a.dtype.itemsize
        off = (off + _ALIGN - 1) // _ALIGN * _ALIGN
        items.append((k, a.dtype.str, tuple(int(s) for s in shape), off))
        off += nbytes
    return tuple(items), off


@functools.lru_cache(maxsize=64)
def _make_unpack(items, total):
    def unpack(arena):  # arena: [B] u8, or [dp, B] u8 (dp-sharded)
        out = {}
        dp = arena.shape[0] if arena.ndim == 2 else None
        for k, dt, shape, off in items:
            dtype = np.dtype(dt)
            n = int(np.prod(shape, dtype=np.int64))
            nbytes = n * dtype.itemsize
            if dp is not None:
                raw = jax.lax.slice(arena, (0, off), (dp, off + nbytes))
                raw = raw.reshape((dp, n, dtype.itemsize))
            else:
                raw = jax.lax.slice(arena, (off,), (off + nbytes,))
                raw = raw.reshape((n, dtype.itemsize))
            if dtype == np.bool_:
                v = raw[..., 0] != 0
            else:
                v = jax.lax.bitcast_convert_type(raw, dtype)
            out[k] = v.reshape(((dp,) if dp is not None else ()) + shape)
        return out

    return jax.jit(unpack)


class ArenaPacker:
    """to_device(batch of numpy arrays) -> dict of device arrays, one
    transfer. ``mesh``: optional dp mesh — every key must then carry a
    leading [dp] axis (the collate_shards layout)."""

    def __init__(self, mesh=None):
        self.mesh = mesh

    def to_device(self, batch: dict) -> dict:
        lead = None
        if self.mesh is not None:
            lead = int(np.asarray(next(iter(batch.values()))).shape[0])
        items, total = _layout(batch, lead)
        arena = np.zeros((lead, total) if lead is not None else (total,), np.uint8)
        for k, dt, shape, off in items:
            a = np.asarray(batch[k])
            nbytes = int(np.prod(shape, dtype=np.int64)) * np.dtype(dt).itemsize
            if not nbytes:
                continue
            src = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
            if lead is not None:
                arena[:, off : off + nbytes] = src.reshape(lead, nbytes)
            else:
                arena[off : off + nbytes] = src
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dev = jax.device_put(arena, NamedSharding(self.mesh, P("dp")))
        else:
            dev = jax.device_put(arena)
        return _make_unpack(items, total)(dev)
