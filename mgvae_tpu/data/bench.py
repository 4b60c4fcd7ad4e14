"""BenchParser: .bench netlist front-end.

Functional rebuild of the reference's BenchParser.read_bench + the
circuit_utils .bench pipeline (parser.py:132-167, circuit_utils.py:260,960)
— which is stale in the reference (arity/attr mismatches would crash it,
SURVEY.md §8 quirk 13). This version works.

.bench grammar handled:
    INPUT(name)
    OUTPUT(name)
    dest = GATE(src1, src2, ...)     # GATE in gate_to_index (case-insensitive)
    dest = DFF(src)                  # rejected (combinational circuits only)
"""
from __future__ import annotations

import os
import re

import numpy as np

from .graph import CircuitGraph, build_graph

DEFAULT_GATE_TO_INDEX = {"INPUT": 0, "MAJ": 1, "NOT": 2, "AND": 3, "OR": 4, "XOR": 5}

_ASSIGN_RE = re.compile(r"^\s*([^\s=]+)\s*=\s*([A-Za-z0-9_]+)\s*\((.*)\)\s*$")
_IO_RE = re.compile(r"^\s*(INPUT|OUTPUT)\s*\(\s*([^)]+?)\s*\)\s*$", re.IGNORECASE)


class BenchParser:
    def __init__(self, gate_to_index=None):
        self.gate_to_index = dict(gate_to_index or DEFAULT_GATE_TO_INDEX)

    def read_bench(self, bench_path: str) -> CircuitGraph:
        circuit_name = os.path.basename(bench_path).split(".")[0]
        with open(bench_path) as f:
            lines = f.readlines()
        node_idx: dict[str, int] = {}
        gates: list[int] = []
        edges: list[tuple[int, int]] = []
        outputs: list[str] = []

        def get_node(name: str, gid: int | None = None) -> int:
            if name not in node_idx:
                node_idx[name] = len(gates)
                gates.append(0 if gid is None else gid)
            elif gid is not None:
                gates[node_idx[name]] = gid
            return node_idx[name]

        for raw in lines:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            m = _IO_RE.match(line)
            if m:
                kind, name = m.group(1).upper(), m.group(2)
                if kind == "INPUT":
                    get_node(name, self.gate_to_index["INPUT"])
                else:
                    outputs.append(name)
                continue
            m = _ASSIGN_RE.match(line)
            if not m:
                raise ValueError(f"unparseable .bench line: {raw!r}")
            dest, gname, srcs = m.group(1), m.group(2).upper(), m.group(3)
            if gname in ("DFF", "DFFSR", "LATCH"):
                raise ValueError(f"sequential element {gname} unsupported ({bench_path})")
            if gname == "BUF" or gname == "BUFF":
                gname = "AND" if "AND" in self.gate_to_index else gname
            if gname not in self.gate_to_index:
                raise ValueError(f"unknown gate {gname} in {bench_path}")
            d = get_node(dest, self.gate_to_index[gname])
            for s in (s.strip() for s in srcs.split(",") if s.strip()):
                edges.append((get_node(s), d))

        edge_index = (
            np.asarray(edges, dtype=np.int64).T if edges else np.zeros((2, 0), dtype=np.int64)
        )
        g = build_graph(circuit_name, np.asarray(gates, dtype=np.int32), edge_index)
        return g


def read_file(file_name):
    """API-parity helper (circuit_utils.py:11-14)."""
    with open(file_name) as f:
        return f.readlines()


def parse_bench(file, gate_to_index=None):
    """API-parity wrapper over BenchParser (circuit_utils.py:1047)."""
    parser = BenchParser(gate_to_index)
    return parser.read_bench(file)
