"""ctypes loader for the native data-path library (auto-built on first use).

Pure-Python fallbacks exist for every entry point (data/levelize.py,
data/aiger.py); this module only accelerates them. Set MGVAE_NO_NATIVE=1 to
disable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmgvae_native.so")
_lib = None


def _build() -> bool:
    src = os.path.join(_DIR, "mgvae_native.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


# must match mg_abi_version() in mgvae_native.cpp
_ABI_VERSION = 3


def _stale() -> bool:
    src = os.path.join(_DIR, "mgvae_native.cpp")
    try:
        return os.path.getmtime(_SO) < os.path.getmtime(src)
    except OSError:
        return True


def get_lib():
    global _lib
    if _lib is not None:
        return _lib or None
    if os.environ.get("MGVAE_NO_NATIVE"):
        _lib = False
        return None
    # rebuild when missing OR older than the source (a stale .so from an
    # earlier checkout would be missing newer symbols)
    if (not os.path.exists(_SO) or _stale()) and not _build():
        if not os.path.exists(_SO):
            _lib = False
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return None
    try:
        _bind(lib)
    except AttributeError:
        # .so predates newer entry points and could not be rebuilt
        _lib = False
        return None
    # Same-name-same-arity changes don't raise AttributeError: an in-place
    # ABI change of mg_collate_fill/_step (appended output pointers) would
    # be silently ignored by an old .so and corrupt gradients with no
    # error. The exported version must match exactly.
    if lib.mg_abi_version() != _ABI_VERSION:
        _lib = False
        return None
    _lib = lib
    return lib


def _bind(lib):
    lib.mg_abi_version.restype = ctypes.c_int32
    lib.mg_abi_version.argtypes = []
    lib.mg_levelize.restype = ctypes.c_int64
    lib.mg_levelize.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mg_aig_decode.restype = ctypes.c_int32
    lib.mg_aig_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mg_collate_stats.restype = ctypes.c_int64
    lib.mg_collate_stats.argtypes = [
        ctypes.c_int64, i32p, ctypes.c_int64, i64p, i64p, ctypes.c_int64, i64p,
    ]
    lib.mg_collate_fill.restype = ctypes.c_int32
    lib.mg_collate_fill.argtypes = [
        ctypes.c_int64, i32p, ctypes.c_int64, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i32p, i32p,
        i32p, u8p,
        i32p, i32p, u8p, i32p,
        i32p,
        i32p, i32p, u8p,
        i32p, i32p, u8p,
        f32p, f32p,
        i32p, i32p, i32p,
    ]
    lib.mg_group_stats.restype = ctypes.c_int32
    lib.mg_group_stats.argtypes = [
        ctypes.c_int64, i64p, i64p, i64p, i64p, i64p, i64p,
        i32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p,
    ]
    lib.mg_collate_step.restype = ctypes.c_int32
    lib.mg_collate_step.argtypes = (
        [ctypes.c_int64, i64p, i64p, i64p, i64p,
         i32p, i32p, f32p, i64p, i64p, i64p, i64p, f32p]
        + [ctypes.c_int64] * 10
        + [i32p, i32p, i32p, u8p, i32p, i32p, f32p,
           i32p, i32p, u8p,
           i32p, i32p, u8p, f32p,
           i32p, u8p, i32p, i32p, u8p, i32p, i32p,
           i32p, i32p, u8p, i32p, i32p, u8p,
           f32p, f32p, i32p, i32p, i32p,
           i32p, i32p, i32p]
    )


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def collate_stats_native(fwd: np.ndarray, esrc: np.ndarray, edst: np.ndarray, block: int):
    """(lv_real, np_real, ep_real, ebf_real, ebr_real) or None."""
    lib = get_lib()
    if lib is None:
        return None
    fwd = np.ascontiguousarray(fwd, dtype=np.int32)
    esrc = np.ascontiguousarray(esrc, dtype=np.int64)
    edst = np.ascontiguousarray(edst, dtype=np.int64)
    stats = np.zeros(5, dtype=np.int64)
    lib.mg_collate_stats(fwd.shape[0], _i32p(fwd), esrc.shape[0],
                         _i64p(esrc), _i64p(edst), block, _i64p(stats))
    return tuple(int(x) for x in stats)


def collate_fill_native(fwd, esrc, edst, dims: dict, block: int, dump: int,
                        out: dict | None = None):
    """Build all level/blocked tables in C++. Returns a dict of arrays or
    None if the native lib is unavailable. ``dims``: padded N/E/L/NP/EP/
    EBF/EBR. Arrays match the numpy path exactly (tests/test_native.py).

    ``out``: optional dict of PREALLOCATED C-contiguous arrays (same keys,
    valid masks as bool) to fill in place — the zero-copy path used by
    data/batching.collate_shards to write every shard straight into views
    of one stacked [dp, ...] buffer instead of stacking copies after the
    fact. Buffers are reinitialized here (the C++ side only writes live
    entries)."""
    lib = get_lib()
    if lib is None:
        return None
    n = fwd.shape[0]
    e = esrc.shape[0]
    fwd = np.ascontiguousarray(fwd, dtype=np.int32)
    esrc = np.ascontiguousarray(esrc, dtype=np.int64)
    edst = np.ascontiguousarray(edst, dtype=np.int64)
    N, E, L, NP, EP, EBF, EBR = (dims[k] for k in ("N", "E", "L", "NP", "EP", "EBF", "EBR"))
    nb = N // block
    if out is None:
        o = {
            "perm": np.arange(N, dtype=np.int32),
            "inv": np.arange(N, dtype=np.int32),
            "edge_src": np.zeros(E, dtype=np.int32),
            "edge_dst": np.zeros(E, dtype=np.int32),
            "lv_nodes": np.full((L, NP), dump, dtype=np.int32),
            "lv_node_valid": np.zeros((L, NP), dtype=bool),
            "lv_edge_src": np.full((L, EP), dump, dtype=np.int32),
            "lv_edge_dst_slot": np.zeros((L, EP), dtype=np.int32),
            "lv_edge_valid": np.zeros((L, EP), dtype=bool),
            "lv_edge_id": np.full((L, EP), E - 1, dtype=np.int32),
            "edge_lv_row": np.zeros(E, dtype=np.int32),
            "lv_start": np.full(L, n, dtype=np.int32),
            "fa_src": np.full((nb, EBF), dump, dtype=np.int32),
            "fa_slot": np.zeros((nb, EBF), dtype=np.int32),
            "fa_valid": np.zeros((nb, EBF), dtype=bool),
            "ra_src": np.full((nb, EBR), dump, dtype=np.int32),
            "ra_slot": np.zeros((nb, EBR), dtype=np.int32),
            "ra_valid": np.zeros((nb, EBR), dtype=bool),
            "fa_eid": np.full((nb, EBF), E - 1, dtype=np.int32),
            "ra_eid": np.full((nb, EBR), E - 1, dtype=np.int32),
            "deg_in": np.zeros(N, dtype=np.float32),
            "deg_out": np.zeros(N, dtype=np.float32),
        }
    else:
        o = out
        # C++ writes only live entries; restore the padding defaults
        o["perm"][:] = np.arange(N, dtype=np.int32)
        o["inv"][:] = o["perm"]
        for k in ("edge_src", "edge_dst", "lv_node_valid", "lv_edge_dst_slot",
                  "lv_edge_valid", "fa_slot", "fa_valid", "ra_slot",
                  "ra_valid", "deg_in", "deg_out", "edge_lv_row"):
            o[k].fill(0)
        for k in ("lv_nodes", "lv_edge_src", "fa_src", "ra_src"):
            o[k].fill(dump)
        for k in ("lv_edge_id", "fa_eid", "ra_eid"):
            o[k].fill(E - 1)
        o["lv_start"].fill(n)
    # bool arrays are byte-sized: pass them to C++ as uint8 views
    u8 = lambda k: _u8p(o[k].view(np.uint8))
    r = lib.mg_collate_fill(
        n, _i32p(fwd), e, _i64p(esrc), _i64p(edst),
        E, L, NP, EP, EBF, EBR, block,
        _i32p(o["perm"]), _i32p(o["inv"]),
        _i32p(o["edge_src"]), _i32p(o["edge_dst"]),
        _i32p(o["lv_nodes"]), u8("lv_node_valid"),
        _i32p(o["lv_edge_src"]), _i32p(o["lv_edge_dst_slot"]),
        u8("lv_edge_valid"), _i32p(o["lv_edge_id"]),
        _i32p(o["lv_start"]),
        _i32p(o["fa_src"]), _i32p(o["fa_slot"]), u8("fa_valid"),
        _i32p(o["ra_src"]), _i32p(o["ra_slot"]), u8("ra_valid"),
        _f32p(o["deg_in"]), _f32p(o["deg_out"]),
        _i32p(o["fa_eid"]), _i32p(o["ra_eid"]), _i32p(o["edge_lv_row"]),
    )
    if r != 0:
        raise AssertionError(f"mg_collate_fill failed: {r} (dims too small?)")
    return o


def group_stats_native(group_ptr, graph_ids, graph_nodes, graph_edges,
                       node_off, edge_off, fwd_all, esrc_all, edst_all,
                       block: int, num_threads: int = 1):
    """Real table extents for many graph groups in one threaded C++ call
    (the trainer's epoch pre-scan). Returns int64 [n_groups, 5] =
    {lv, np, ep, ebf, ebr} rows, or None when the native lib is missing."""
    lib = get_lib()
    if lib is None:
        return None
    n_groups = group_ptr.shape[0] - 1
    out = np.zeros(n_groups * 5, dtype=np.int64)
    r = lib.mg_group_stats(
        n_groups, _i64p(group_ptr), _i64p(graph_ids),
        _i64p(graph_nodes), _i64p(graph_edges),
        _i64p(node_off), _i64p(edge_off),
        _i32p(fwd_all), _i64p(esrc_all), _i64p(edst_all),
        block, num_threads, _i64p(out),
    )
    if r != 0:
        raise AssertionError(f"mg_group_stats failed: {r}")
    return out.reshape(n_groups, 5)


def collate_step_native(shard_graphs, graph_nodes, graph_edges, graph_tt,
                        gate_all, fwd_all, prob_all, esrc_all, edst_all,
                        tta_all, ttb_all, ttdis_all,
                        dims: dict, block: int, big: dict,
                        num_threads: int = 1):
    """Collate a WHOLE data-parallel step (all dp shards) into the stacked
    [dp, ...] buffers ``big`` with one C++ call (optionally multi-threaded
    over shards — ctypes releases the GIL for the duration). Inputs are the
    step's graphs concatenated in shard order with raw per-graph ids; see
    data/batching._collate_shards_zero_copy for the (only) caller.
    Returns ``big`` or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dp = shard_graphs.shape[0]
    N, E, P, L, NP, EP, EBF, EBR = (dims[k] for k in ("N", "E", "P", "L", "NP", "EP", "EBF", "EBR"))
    u8 = lambda k: _u8p(big[k].view(np.uint8))
    r = lib.mg_collate_step(
        dp, _i64p(shard_graphs), _i64p(graph_nodes), _i64p(graph_edges),
        _i64p(graph_tt),
        _i32p(gate_all), _i32p(fwd_all), _f32p(prob_all),
        _i64p(esrc_all), _i64p(edst_all),
        _i64p(tta_all), _i64p(ttb_all), _f32p(ttdis_all),
        N, E, P, L, NP, EP, EBF, EBR, block, num_threads,
        _i32p(big["node_perm"]), _i32p(big["node_inv"]),
        _i32p(big["gate"]), u8("node_valid"),
        _i32p(big["forward_level"]), _i32p(big["graph_id"]),
        _f32p(big["prob"]),
        _i32p(big["edge_src"]), _i32p(big["edge_dst"]), u8("edge_valid"),
        _i32p(big["tt_pair_a"]), _i32p(big["tt_pair_b"]), u8("tt_valid"),
        _f32p(big["tt_dis"]),
        _i32p(big["lv_nodes"]), u8("lv_node_valid"),
        _i32p(big["lv_edge_src"]), _i32p(big["lv_edge_dst_slot"]),
        u8("lv_edge_valid"), _i32p(big["lv_edge_id"]), _i32p(big["lv_start"]),
        _i32p(big["fa_src"]), _i32p(big["fa_slot"]), u8("fa_valid"),
        _i32p(big["ra_src"]), _i32p(big["ra_slot"]), u8("ra_valid"),
        _f32p(big["deg_in"]), _f32p(big["deg_out"]),
        _i32p(big["n_nodes"]), _i32p(big["n_edges"]), _i32p(big["n_tt"]),
        _i32p(big["fa_eid"]), _i32p(big["ra_eid"]), _i32p(big["edge_lv_row"]),
    )
    if r != 0:
        raise AssertionError(f"mg_collate_step failed: {r} (dims too small?)")
    return big


def levelize_native(edge_index: np.ndarray, num_nodes: int):
    """Returns int32 levels or None if the native lib is unavailable.
    Raises ValueError on cycles (matching the python fallback)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    out = np.zeros(num_nodes, dtype=np.int32)
    r = lib.mg_levelize(
        num_nodes, src.shape[0],
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if r < 0:
        raise ValueError("levelize: graph contains a cycle")
    return out


def aig_decode_native(data: bytes):
    """Decode binary AIGER; returns (gates int32[N], edge_index int64[2,E])
    or None if unavailable/unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    # conservative capacity bounds (see mgvae_native.cpp comment)
    header = data.split(b"\n", 1)[0].split()
    i, l, o, a = (int(x) for x in header[2:6])
    gates_cap = i + a + 2 * a + o + 4
    edges_cap = 2 * a + 2 * a + o + 4
    gates = np.zeros(gates_cap, dtype=np.int32)
    esrc = np.zeros(edges_cap, dtype=np.int64)
    edst = np.zeros(edges_cap, dtype=np.int64)
    nn = ctypes.c_int64()
    ne = ctypes.c_int64()
    r = lib.mg_aig_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.shape[0],
        gates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), gates_cap,
        esrc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        edst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), edges_cap,
        ctypes.byref(nn), ctypes.byref(ne),
    )
    if r != 0:
        return None
    n, e = nn.value, ne.value
    return gates[:n].copy(), np.stack([esrc[:e], edst[:e]]).copy()
