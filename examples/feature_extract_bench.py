"""Embedding extraction from a .bench netlist with timing.

Parity with the reference example (DG_VAE/examples/feature_extract_bench.py)
— which crashes as shipped because BenchParser.read_bench is stale
(SURVEY.md §8 quirk 13). This one works.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import deepgate

if __name__ == "__main__":
    print("[INFO] Create DeepGate model (xag default, quirk 2)")
    model = deepgate.Model()
    # model.load_pretrained()  # (reference weights were stripped from the mount)

    bench_path = sys.argv[1] if len(sys.argv) > 1 else "./tmp/test.bench"
    print("[INFO] Parse Bench:", bench_path)
    parser = deepgate.BenchParser()
    graph = parser.read_bench(bench_path)

    print("[INFO] Get embeddings ...")
    start_time = time.time()
    hs, hf = model(graph)
    end_time = time.time()

    # hs: structural embeddings, hf: functional embeddings — [N, D]
    print(hs.shape, hf.shape)
    print("Time: ", end_time - start_time)
