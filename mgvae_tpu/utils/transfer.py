"""Single-buffer host->device batch transfer.

A collated batch is ~33 arrays. Measured on the tunneled TPU: device_put is
async (~0.7 ms dispatch each, latency hidden), so per-array feeding is not
the single-device bottleneck — but each put still costs host-side Python +
transfer bookkeeping, and under a dp mesh a per-array NamedSharding put
slices every array per device in Python. ArenaPacker packs the whole batch
into ONE contiguous uint8 arena host-side (one memcpy pass over the batch
bytes), ships it in a single (sharded) transfer, and splits it back into
typed arrays on device with one jitted unpack call (static offsets ->
slice + bitcast; XLA fuses the copies).

``to_device_steps`` packs a GROUP of K same-shape step batches into one
[K, (dp,) bytes] arena for the multi-step scanned train step
(train/step.make_multi_step) — K steps ride one transfer + one dispatch.

Wire narrowing: the tunnel moves ~85 MB/s, so batch BYTES are the e2e
bottleneck (measured 9.7 ms/step of a 5.9 MB bs16 group). Integer arrays
are shipped in the smallest dtype their values fit (index tables are node
ids < N, slots < 128, gate types < 8 -> int16/int8) and widened back to
their logical dtype on device; exact, decided per call from the actual
min/max, so it is content-safe by construction. Floats ship unchanged.

A fresh arena is allocated per call: the CPU backend may zero-copy alias
numpy buffers into jax Arrays, so reuse would corrupt in-flight batches
(allocation is cheap under the heap tuning in utils/hostmem).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ALIGN = 8


def _wire_dtype(a: np.ndarray, lo: int, hi: int) -> str:
    """Smallest exact wire dtype for an integer array with values [lo, hi]."""
    for cand in (np.int8, np.int16, np.int32):
        info = np.iinfo(cand)
        if info.min <= lo and hi <= info.max:
            return np.dtype(cand).str
    return np.dtype(np.int64).str


_BITS = "bits"  # wire marker: bool array packed 8 elements/byte


def _int_valued(batches, k):
    """True when every float value is an exact small integer (e.g. degree
    counts) — then int16 wire is lossless."""
    for b in batches:
        a = np.asarray(b[k])
        if not a.size:
            continue
        if not (np.all(np.isfinite(a)) and np.all(a == np.floor(a))
                and a.min() >= -32768 and a.max() <= 32767):
            return False
    return True


def _wire_bytes(wire, n):
    if wire == _BITS:
        return (n + 7) // 8
    return n * np.dtype(wire).itemsize


def _plan(batches: list, n_lead: int):
    """((key, logical_dt, wire_dt, per-item shape, offset), ...), total bytes.
    ``n_lead`` leading axes (step/dp) are excluded from the per-item shape.
    Wire dtypes are chosen from the actual values across ``batches``: ints
    narrow to the smallest exact dtype, bools bitpack 8/byte, and
    integer-valued floats (degree counts) ship as int16 — all lossless."""
    items = []
    off = 0
    for k in sorted(batches[0]):
        a0 = np.asarray(batches[0][k])
        shape = a0.shape[n_lead:]
        wire = a0.dtype.str
        if a0.dtype == np.bool_:
            wire = _BITS
        elif a0.dtype.kind == "i" and a0.size:
            lo = min(int(np.asarray(b[k]).min()) for b in batches)
            hi = max(int(np.asarray(b[k]).max()) for b in batches)
            wire = _wire_dtype(a0, lo, hi)
        elif a0.dtype.kind == "i":
            wire = np.dtype(np.int8).str
        elif a0.dtype.kind == "f" and a0.size and _int_valued(batches, k):
            wire = np.dtype(np.int16).str
        n = int(np.prod(shape, dtype=np.int64))
        off = (off + _ALIGN - 1) // _ALIGN * _ALIGN
        items.append((k, a0.dtype.str, wire, tuple(int(s) for s in shape), off))
        off += _wire_bytes(wire, n)
    return tuple(items), off


@functools.lru_cache(maxsize=64)
def _make_unpack(items, total, n_lead):
    def unpack(arena):  # arena: [*lead, B] u8
        out = {}
        lead = arena.shape[:n_lead]
        for k, logical_dt, wire_dt, shape, off in items:
            logical = np.dtype(logical_dt)
            n = int(np.prod(shape, dtype=np.int64))
            nbytes = _wire_bytes(wire_dt, n)
            start = (0,) * n_lead + (off,)
            limit = tuple(lead) + (off + nbytes,)
            raw = jax.lax.slice(arena, start, limit)
            if wire_dt == _BITS:
                # little-endian bit unpack: element j of byte = bit j
                shifts = jnp.arange(8, dtype=jnp.uint8)
                bits = (raw[..., None] >> shifts) & jnp.uint8(1)
                v = bits.reshape(tuple(lead) + (nbytes * 8,))[..., :n] != 0
            else:
                wire = np.dtype(wire_dt)
                raw = raw.reshape(tuple(lead) + (n, wire.itemsize))
                v = jax.lax.bitcast_convert_type(raw, wire)
                if wire != logical:
                    v = v.astype(logical)
            out[k] = v.reshape(tuple(lead) + shape)
        return out

    return jax.jit(unpack)


def _fill(arena_row, batch, items, lead_shape):
    lead_n = int(np.prod(lead_shape, dtype=np.int64)) if lead_shape else 1
    for k, logical_dt, wire_dt, shape, off in items:
        a = np.asarray(batch[k])
        n = int(np.prod(shape, dtype=np.int64))
        nbytes = _wire_bytes(wire_dt, n)
        if not nbytes:
            continue
        if wire_dt == _BITS:
            src = np.packbits(
                np.ascontiguousarray(a).reshape(lead_n, n), axis=-1, bitorder="little"
            ).reshape(-1)
        else:
            wire = np.dtype(wire_dt)
            if a.dtype.str != wire_dt and a.dtype != np.bool_:
                a = a.astype(wire)
            src = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
        arena_row[..., off : off + nbytes] = src.reshape(lead_shape + (nbytes,))


_WIDEN = {np.dtype(np.int8).str: 0, np.dtype(np.int16).str: 1,
          np.dtype(np.int32).str: 2, np.dtype(np.int64).str: 3}


def _flatten_groups(batch: dict) -> tuple[dict, int | None]:
    """Split batches (data/batching.collate_split) carry a ``groups`` tuple
    of per-group dicts; the arena plan works on flat key->array maps, so
    nest the group keys as "groups:<g>:<key>" for the wire and restore the
    tuple after unpack. Returns (flat_batch, num_groups|None)."""
    if "groups" not in batch:
        return batch, None
    flat = {k: v for k, v in batch.items() if k != "groups"}
    for gi, gb in enumerate(batch["groups"]):
        for kk, vv in gb.items():
            flat[f"groups:{gi}:{kk}"] = vv
    return flat, len(batch["groups"])


def _unflatten_groups(flat: dict, num_groups: int | None) -> dict:
    if num_groups is None:
        return flat
    out = {}
    groups = [dict() for _ in range(num_groups)]
    for k, v in flat.items():
        if k.startswith("groups:"):
            _, gi, kk = k.split(":", 2)
            groups[int(gi)][kk] = v
        else:
            out[k] = v
    out["groups"] = tuple(groups)
    return out


class ArenaPacker:
    """to_device(batch of numpy arrays) -> dict of device arrays, one
    transfer. ``mesh``: optional dp mesh — every key must then carry a
    leading [dp] axis (the collate_shards layout)."""

    def __init__(self, mesh=None):
        self.mesh = mesh
        self._plans: dict = {}

    def _sticky_plan(self, batches, n_lead):
        """Value-dependent wire choices can flicker between calls (a group
        whose ids happen to fit int8 vs one that needs int16), and every
        distinct plan is a fresh remote unpack compile (~15 s on the
        tunneled chip — measured as a recurring outlier epoch). Merge each
        call's required plan into a cached one, only ever WIDENING wire
        dtypes, so the plan monotonically stabilizes."""
        items, total = _plan(batches, n_lead)
        sig = tuple((k, l, s) for k, l, _, s, _ in items) + (n_lead,)
        cached = self._plans.get(sig)
        if cached is None or cached[0] == items:
            self._plans[sig] = (items, total)
            return self._plans[sig]
        merged = []
        off = 0
        for (k, l, w_new, shape, _), (_, _, w_old, _, _) in zip(items, cached[0]):
            w = w_new
            if w_old != w_new:
                if w_old in _WIDEN and w_new in _WIDEN:
                    w = w_old if _WIDEN[w_old] >= _WIDEN[w_new] else w_new
                elif w_old == np.dtype(l).str or w_new == np.dtype(l).str:
                    w = np.dtype(l).str  # mixed kinds (e.g. f32 vs int16): logical
            n = int(np.prod(shape, dtype=np.int64))
            off = (off + _ALIGN - 1) // _ALIGN * _ALIGN
            merged.append((k, l, w, shape, off))
            off += _wire_bytes(w, n)
        self._plans[sig] = (tuple(merged), off)
        return self._plans[sig]

    def _put(self, arena, n_lead):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # dp is always the LAST lead axis (arena [.., dp, B])
            spec = P(*((None,) * (n_lead - 1) + ("dp",)))
            return jax.device_put(arena, NamedSharding(self.mesh, spec))
        return jax.device_put(arena)

    def to_device(self, batch: dict, extra_lead: int = 0) -> dict:
        """``extra_lead``: leading axes (before the dp axis, if any) that are
        part of the layout rather than the per-item shape — e.g. an
        ALREADY-STACKED K-step group ([K, (dp,) ...] leaves) packs with
        extra_lead=1 in ONE vectorized fill pass per key."""
        n_lead = extra_lead + (1 if self.mesh is not None else 0)
        batch, n_groups = _flatten_groups(batch)
        items, total = self._sticky_plan([batch], n_lead)
        lead = ()
        if n_lead:
            lead = tuple(
                int(s) for s in np.asarray(next(iter(batch.values()))).shape[:n_lead]
            )
        arena = np.zeros(lead + (total,), np.uint8)
        _fill(arena, batch, items, lead)
        out = _make_unpack(items, total, n_lead)(self._put(arena, n_lead))
        return _unflatten_groups(out, n_groups)

    def to_device_steps(self, batches: list) -> dict:
        """Pack K same-shape step batches -> leaves with a leading [K] axis
        (with a mesh: [K, dp, ...]), in one transfer + one unpack."""
        k_steps = len(batches)
        per_lead = 1 if self.mesh is not None else 0
        n_lead = per_lead + 1
        flat = [_flatten_groups(b) for b in batches]
        n_groups = flat[0][1]
        batches = [f[0] for f in flat]
        items, total = self._sticky_plan(batches, per_lead)
        lead = (k_steps,)
        if per_lead:
            lead = lead + (int(np.asarray(next(iter(batches[0].values()))).shape[0]),)
        arena = np.zeros(lead + (total,), np.uint8)
        for step, batch in enumerate(batches):
            _fill(arena[step], batch, items, lead[1:])
        out = _make_unpack(items, total, n_lead)(self._put(arena, n_lead))
        return _unflatten_groups(out, n_groups)
