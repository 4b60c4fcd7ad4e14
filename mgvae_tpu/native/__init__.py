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
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib or None
    if os.environ.get("MGVAE_NO_NATIVE"):
        _lib = False
        return None
    if not os.path.exists(_SO) and not _build():
        _lib = False
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return None
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
    _lib = lib
    return lib


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
