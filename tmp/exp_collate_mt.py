"""Measure host collate_shards throughput at dp=8 (the round-3 feeding
question): single-thread time per step vs a thread-pool version."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from mgvae_tpu.data.batching import collate, collate_shards, shard_dims
from mgvae_tpu.data.synthetic import random_circuit

rng = np.random.default_rng(0)
graphs = [random_circuit(rng, "mig", num_inputs=16, num_gates=264, num_tt_pairs=64) for _ in range(256)]

BS = 16
DP = 8
step_graphs = BS * DP
shards = [graphs[d * BS : (d + 1) * BS] for d in range(DP)]

# dims pre-agreed (fixed-dims mode)
pre = [shard_dims(s) for s in shards]
dims = {k: max(d[k] for d in pre) for k in pre[0]}

# warmup
b = collate_shards(shards, dims=dims)
t0 = time.perf_counter()
R = 20
for _ in range(R):
    collate_shards(shards, dims=dims)
t1 = time.perf_counter()
print(f"collate_shards dp={DP} bs={BS}: {(t1-t0)/R*1e3:.2f} ms/step")

# per-shard collate cost
t0 = time.perf_counter()
for _ in range(R):
    collate(shards[0], dims=dims)
t1 = time.perf_counter()
print(f"single collate bs={BS}: {(t1-t0)/R*1e3:.2f} ms")

# threaded: one thread per shard
from concurrent.futures import ThreadPoolExecutor

for workers in (2, 4, 8):
    ex = ThreadPoolExecutor(workers)
    t0 = time.perf_counter()
    for _ in range(R):
        res = list(ex.map(lambda s: collate(s, dims=dims), shards))
    t1 = time.perf_counter()
    print(f"threaded per-shard collate x{DP}, {workers} workers: {(t1-t0)/R*1e3:.2f} ms/step")
    ex.shutdown()

# stats pass cost (chunked_shard_dims across an epoch is also host work)
t0 = time.perf_counter()
for _ in range(R):
    for s in shards:
        shard_dims(s)
t1 = time.perf_counter()
print(f"stats pass x{DP} shards: {(t1-t0)/R*1e3:.2f} ms/step")
