"""Headline benchmark: AIG+MIG encoding throughput (graphs/sec/chip) vs the
CPU PyTorch reference, plus loss parity (BASELINE.md targets).

Measurement protocol (v2, hoist-proof): K DISTINCT collated batches (common
padded dims) are stacked and swept with ONE jitted ``lax.scan`` whose body
runs the real computation on batch k and accumulates a data-dependent
scalar; wall clock covers one synchronized call and the single measured
host<->device round trip (~26 ms on the tunneled chip) is subtracted.

Why v2: round 1 chained K iterations over the SAME batch with only one
parameter tensor perturbed per iteration. XLA hoists every loop-invariant
subcomputation (struct-encoder aggregations, attention precomputes, ...)
out of such a loop, so those numbers measured only the perturbation-
dependent slice of the model — inflating fwd throughput ~4-8x and grad
throughput ~3x. Distinct batches make every iteration's work genuinely
batch-dependent, which is also what serving/training actually does. The
train metric now times the REAL train step (losses + backward + Adam +
metrics via train/step.make_multi_step), not a toy MSE grad.

Baseline: the clean-room torch implementation of the reference semantics
(benchmarks/torch_reference.py) running the reference's own per-level python
``subgraph`` loop on CPU — the same work per graph.

Prints ONE json line:
  {"metric": "graphs_per_sec_encode_aig_mig", "value": ..., "unit":
   "graphs/s", "vs_baseline": ...}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_CIRCUITS = 64
BATCH = 16  # pallas-kernel class; the fused level kernel beats XLA-at-64
NUM_INPUTS = 16
NUM_GATES = 264
SCAN_K = 16      # distinct batches per timed dispatch (bs16 benches)
SCAN_K_BIG = 8   # distinct batches per timed dispatch (bs64 bench)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_dataset(modality, seed, n=N_CIRCUITS):
    from mgvae_tpu.data.synthetic import random_circuit

    rng = np.random.default_rng(seed)
    return [
        random_circuit(rng, modality, num_inputs=NUM_INPUTS, num_gates=NUM_GATES, num_tt_pairs=64)
        for _ in range(n)
    ]


def measure_roundtrip():
    """One-sync no-op latency (host<->device round trip)."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(8)
    f = jax.jit(lambda x: x.sum())
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def stacked_batches(modality, seed, k, batch_size, chunks=1):
    """k DISTINCT collated batches at COMMON padded dims, stacked [k, ...]."""
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import chunked_shard_dims, collate, collate_chunked

    shards = [make_dataset(modality, seed * 1000 + i, n=batch_size) for i in range(k)]
    dmaxs = [chunked_shard_dims(s, chunks) for s in shards]
    if dmaxs[0] is None:  # no native lib: fall back to natural dims of shard 0
        dims = None
        shards = [shards[0]] * k
    else:
        dims = {key: max(d[key] for d in dmaxs) for key in dmaxs[0]}
    if chunks > 1:
        batches = [collate_chunked(s, chunks, dims=dims) for s in shards]
    else:
        batches = [collate(s, dims=dims) for s in shards]
    sb = {key: np.stack([np.asarray(b[key]) for b in batches]) for key in batches[0]}
    return jax.tree.map(jnp.asarray, sb), batches[0]


def timed_scan(outer, args, k, roundtrip, reps=5):
    """jit(outer)(*args) -> scalar-ish; returns seconds per scan iteration
    with the single sync round trip subtracted."""
    import jax

    f = jax.jit(outer)
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # compile + run
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - roundtrip, 1e-9) / k


def bench_modality(modality, seed, roundtrip):
    import jax
    import jax.numpy as jnp
    import torch

    from benchmarks.torch_reference import ReferenceModel
    from mgvae_tpu.data.batching import collate
    from mgvae_tpu.models.dg_ae import DGConfig, forward
    from mgvae_tpu.utils.torch_compat import params_from_torch_state

    torch.manual_seed(seed)
    graphs = make_dataset(modality, seed)
    ref = ReferenceModel(modality, dim_hidden=64, s_rounds=4, t_rounds=4, layernorm=True)
    ref.eval()
    cfg = DGConfig(modality=modality, dim_hidden=64, layernorm=True)
    params, state = params_from_torch_state(ref.state_dict(), cfg)

    # ---- torch CPU baseline (reference semantics incl. subgraph loop) ----
    tg = [
        (
            torch.from_numpy(g.gate).long(),
            torch.from_numpy(g.edge_index),
            torch.from_numpy(g.forward_level).long(),
        )
        for g in graphs
    ]
    with torch.no_grad():
        ref(*tg[0])  # warmup
        t0 = time.perf_counter()
        for gate, ei, lvl in tg:
            ref(gate, ei, lvl)
        torch_time = time.perf_counter() - t0
    torch_gps = len(graphs) / torch_time

    # ---- ours: scan over SCAN_K distinct batches in one jitted call ------
    sbatch, batch0 = stacked_batches(modality, seed, SCAN_K, BATCH)
    batch = jax.tree.map(jnp.asarray, batch0)
    use_pallas = False
    if jax.default_backend() == "tpu":
        from mgvae_tpu.ops.pallas.level_kernel import kernel_fits

        use_pallas = kernel_fits(
            batch["gate"].shape[0], batch["lv_edge_src"].shape[1],
            batch["lv_nodes"].shape[1], cfg.dim_hidden,
        )
        if use_pallas:  # cross-check fused kernel vs XLA scan on-device
            # at HIGHEST matmul precision the two paths agree to ~1e-7; the
            # residual ~1e-3 at default precision is purely the MXU's single
            # bf16-pass fp32 multiplies (same on both paths) — root cause
            # pinned by tmp/exp_numerics.py, see benchmarks/README.md
            import dataclasses as _dc

            cfg_hi = _dc.replace(cfg, matmul_precision="highest")
            _, hf_x, _ = jax.jit(lambda p, b: forward(p, b, cfg_hi))(params, batch)
            _, hf_p, _ = jax.jit(lambda p, b: forward(p, b, cfg_hi, use_pallas=True))(params, batch)
            n = int(batch["n_nodes"])
            dmax = float(jnp.abs(hf_x[:n] - hf_p[:n]).max())
            log(f"[{modality}] pallas-vs-xla max |hf| diff (highest precision): {dmax:.2e}")
            # 5e-5: the kernel path now spans BOTH the fused struct towers
            # (round 4) and the level kernel — two reassociation boundaries
            assert dmax < 5e-5

    def scan_fwd(params, sbatch):
        def body(acc, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=use_pallas)
            return acc + hf.sum() + hs.sum(), ()

        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

    per_fwd = timed_scan(scan_fwd, (params, sbatch), SCAN_K, roundtrip)
    ours_gps = BATCH / per_fwd

    # ---- loss parity on one graph ----------------------------------------
    from mgvae_tpu.train import losses

    g = graphs[0]
    batch1 = jax.tree.map(jnp.asarray, collate([g]))
    hs_j, hf_j, _ = forward(params, batch1, cfg)
    n, e = g.num_nodes, g.num_edges
    rng = np.random.default_rng(0)
    neg = rng.integers(0, n, size=(2, e))
    neg[1] = (neg[0] + 1 + neg[1] % (n - 1)) % n
    with torch.no_grad():
        hs_t, hf_t = ref(*tg[0])
        from benchmarks.torch_reference import run_losses

        rc_t, pl_t, fl_t, _, _ = run_losses(
            ref, hs_t, hf_t, torch.from_numpy(g.edge_index), torch.from_numpy(neg),
            torch.from_numpy(g.prob).unsqueeze(1), torch.from_numpy(g.tt_pair_index),
            torch.from_numpy(g.tt_dis),
        )
    E_pad = batch1["edge_src"].shape[0]
    inv = np.asarray(batch1["node_inv"])  # map to level-major renumbering
    neg_src = jnp.asarray(np.pad(inv[neg[0]], (0, E_pad - e)).astype(np.int32))
    neg_dst = jnp.asarray(np.pad(inv[neg[1]], (0, E_pad - e), constant_values=1).astype(np.int32))
    rc_j, _ = losses.recon_loss(params, hs_j, batch1, None, neg_edges=(neg_src, neg_dst))
    pl_j, _ = losses.prob_loss(params, state, hf_j, batch1, train=False, rng=None)
    fl_j = losses.func_loss(hf_j, batch1)
    parity = {
        "recon": abs(float(rc_j) - float(rc_t)) / max(abs(float(rc_t)), 1e-9),
        "prob": abs(float(pl_j) - float(pl_t)) / max(abs(float(pl_t)), 1e-9),
        "func": abs(float(fl_j) - float(fl_t)) / max(abs(float(fl_t)), 1e-9),
    }
    log(
        f"[{modality}] ours {ours_gps:.1f} g/s ({per_fwd * 1e3:.2f} ms / {BATCH} graphs) | "
        f"torch-cpu {torch_gps:.1f} g/s | speedup {ours_gps / torch_gps:.1f}x | loss rel-err "
        f"recon {parity['recon']:.2e} prob {parity['prob']:.2e} func {parity['func']:.2e}"
    )
    assert max(parity.values()) < 0.01, f"loss parity violated: {parity}"

    # ---- secondary: REAL train-step throughput (losses+bwd+Adam+metrics) --
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    opt = make_optimizer(1e-4)
    multi = make_multi_step(cfg, opt, None, donate=False)
    rngs = jax.random.split(jax.random.PRNGKey(3), SCAN_K)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    opt_state = opt.init(params)

    def train_scan(params, state, opt_state, sbatch, rngs, weights):
        _, _, _, ms = multi(params, state, opt_state, sbatch, rngs, weights)
        return ms

    # value-check the timed path: all-NaN chunked-kernel grads once hid
    # behind a timing-only benchmark (round 2) — never again
    ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
    assert np.isfinite(np.asarray(ms)).all(), f"non-finite train metrics: {np.asarray(ms)[:2]}"

    per_step = timed_scan(
        train_scan, (params, state, opt_state, sbatch, rngs, weights), SCAN_K, roundtrip
    )
    train_gps = BATCH / per_step
    log(f"[{modality}] train step (full): {per_step * 1e3:.2f} ms / {BATCH} graphs -> {train_gps:.0f} g/s")
    return ours_gps, torch_gps, train_gps


def bench_large_train(roundtrip, batch_graphs=64):
    """bs64 full-train-step throughput through the chunked fused-kernel VJP
    (collate_chunked -> (chunk, level) Pallas grid) vs the XLA fallback."""
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.data.batching import pick_chunks_for
    from mgvae_tpu.models.dg_ae import DGConfig, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    cfg = DGConfig(modality="mig", dim_hidden=64, layernorm=True)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])
    rngs = jax.random.split(jax.random.PRNGKey(5), SCAN_K_BIG)

    def timed(chunks):
        sbatch, _ = stacked_batches("mig", 7, SCAN_K_BIG, batch_graphs, chunks=chunks)
        multi = make_multi_step(cfg, opt, None, donate=False)

        def train_scan(params, state, opt_state, sbatch, rngs, weights):
            _, _, _, ms = multi(params, state, opt_state, sbatch, rngs, weights)
            return ms

        ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
        assert np.isfinite(np.asarray(ms)).all(), \
            f"non-finite bs{batch_graphs} C={chunks} train metrics"
        return timed_scan(
            train_scan, (params, state, opt_state, sbatch, rngs, weights),
            SCAN_K_BIG, roundtrip,
        )

    # ---- price of "highest" matmul precision (VERDICT r2 item 9): the
    # parity mode (1.3e-7 kernel-vs-XLA) vs the default single-bf16-pass
    # MXU mode (1e-3) — measured on the bs16 train step so the tradeoff is
    # finally a number
    import dataclasses as _dc

    cfg_hi = _dc.replace(cfg, matmul_precision="highest")
    sb16, _ = stacked_batches("mig", 7, SCAN_K, 16)
    rng16 = jax.random.split(jax.random.PRNGKey(5), SCAN_K)

    def _step_time(c):
        m = make_multi_step(c, opt, None, donate=False)

        def scan(params, state, opt_state, sbatch, rngs, weights):
            return m(params, state, opt_state, sbatch, rngs, weights)[3]

        ms = scan(params, state, opt_state, sb16, rng16, weights)
        assert np.isfinite(np.asarray(ms)).all()
        return timed_scan(scan, (params, state, opt_state, sb16, rng16, weights),
                          SCAN_K, roundtrip)

    t_def, t_hi = _step_time(cfg), _step_time(cfg_hi)
    log(f"[precision] bs16 train step default {t_def*1e3:.2f} ms vs highest "
        f"{t_hi*1e3:.2f} ms -> highest costs {t_hi/t_def - 1.0:+.1%}")

    # C chosen as the trainer would (smallest C whose chunk dims fit VMEM)
    C = pick_chunks_for(make_dataset("mig", 7, n=batch_graphs), cfg.dim_hidden)
    t_krn = timed(C)
    # C=1 exceeds kernel_fits -> _auto_pallas falls to the HBM-streamed
    # kernel when its gate admits the dims, else the XLA scan
    t_one = timed(1)

    # ---- shape-aware SPLIT batch (VERDICT r3 item 7): groups collated at
    # their own dims, per-group forward, global losses -------------------
    from mgvae_tpu.data.batching import collate_split, split_dims

    G = batch_graphs // 16
    shards = [make_dataset("mig", 7000 + i, n=batch_graphs) for i in range(SCAN_K_BIG)]
    sdims = split_dims(shards, G)
    # node_inv is host-side metadata sized by the ORIGINAL node count (it
    # varies across shards and is never read on device) — drop before stacking
    sbatches = [
        {k: v for k, v in collate_split(s, G, dims=sdims).items() if k != "node_inv"}
        for s in shards
    ]
    sbatch_split = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                                *sbatches)
    multi = make_multi_step(cfg, opt, None, donate=False)

    def split_scan(params, state, opt_state, sbatch, rngs, weights):
        _, _, _, ms = multi(params, state, opt_state, sbatch, rngs, weights)
        return ms

    ms = split_scan(params, state, opt_state, sbatch_split, rngs, weights)
    assert np.isfinite(np.asarray(ms)).all(), "non-finite split-train metrics"
    t_split = timed_scan(
        split_scan, (params, state, opt_state, sbatch_split, rngs, weights),
        SCAN_K_BIG, roundtrip,
    )
    log(
        f"[bs{batch_graphs} train] chunked-kernel(C={C}) {t_krn * 1e3:.2f} ms "
        f"({batch_graphs / t_krn:.0f} g/s) vs unchunked-auto {t_one * 1e3:.2f} ms "
        f"({batch_graphs / t_one:.0f} g/s) -> {t_one / t_krn:.2f}x | "
        f"split(G={G}) {t_split * 1e3:.2f} ms ({batch_graphs / t_split:.0f} g/s)"
    )
    return batch_graphs / t_krn, batch_graphs / t_one, t_hi / t_def, batch_graphs / t_split


def bench_dscale(roundtrip, D=128, compute_dtype="float32"):
    """MXU-scaling evidence (VERDICT r2 item 4 / r4 item 5): kernel-vs-XLA
    fwd and full train step at dim_hidden=D, with an MFU estimate. At D=64
    the kernel is per-grid-step overhead-bound; D=128 quadruples the matmul
    work per level and is where the MXU design claims start to cash out;
    D=256 bf16 is the best-MFU point with the round-4 residual-saving
    backward + bf16 kernels (full sweep: tmp/exp_r3_d128.py +
    tmp/exp_r5_d256.py, results in benchmarks/README.md)."""
    import jax
    import jax.numpy as jnp

    from mgvae_tpu.models.dg_ae import DGConfig, forward, init_params
    from mgvae_tpu.train.step import make_multi_step, make_optimizer

    cfg = DGConfig(modality="mig", dim_hidden=D, layernorm=True,
                   compute_dtype=compute_dtype)
    params, state = init_params(jax.random.PRNGKey(0), cfg)
    sbatch, batch0 = stacked_batches("mig", 7, SCAN_K, 16)

    def scan_fwd(params, sbatch, use_pallas):
        def body(acc, b):
            hs, hf, _ = forward(params, b, cfg, use_pallas=use_pallas)
            return acc + hf.astype(jnp.float32).sum(), ()

        return jax.lax.scan(body, jnp.zeros(()), sbatch)[0]

    t_k = timed_scan(lambda p, s: scan_fwd(p, s, True), (params, sbatch), SCAN_K, roundtrip)
    t_x = timed_scan(lambda p, s: scan_fwd(p, s, False), (params, sbatch), SCAN_K, roundtrip)

    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    multi = make_multi_step(cfg, opt, None, donate=False)
    rngs = jax.random.split(jax.random.PRNGKey(3), SCAN_K)
    weights = jnp.asarray([1.0, 4.0, 2.0, 0.0])

    def train_scan(params, state, opt_state, sbatch, rngs, weights):
        return multi(params, state, opt_state, sbatch, rngs, weights)[3]

    ms = train_scan(params, state, opt_state, sbatch, rngs, weights)
    assert np.isfinite(np.asarray(ms)).all(), f"non-finite D={D} train metrics"
    t_step = timed_scan(train_scan, (params, state, opt_state, sbatch, rngs, weights),
                        SCAN_K, roundtrip)
    # FLOP model (see tmp/exp_r3_d128.py): struct towers + level scan, x2
    # mul+add, x3 fwd+bwd
    b0 = batch0
    N = int(np.asarray(b0["gate"]).shape[0])
    E = int(np.asarray(b0["edge_src"]).shape[0])
    T, F = cfg.num_experts, cfg.dim_feature
    struct = 2 * cfg.s_rounds * 2 * (N * D * D + N * 3 * (D + F + D) * D)
    level = E * 4 * T * D * D + N * 3 * T * D * D
    flops = 3 * 2 * (struct + level)
    peak, kind = peak_flops_per_chip()
    mfu = flops / t_step / peak
    log(f"[D={D} {compute_dtype}] fwd kernel {t_k*1e3:.2f} ms vs XLA "
        f"{t_x*1e3:.2f} ms ({t_x/t_k:.2f}x); train {t_step*1e3:.2f} ms -> "
        f"{16/t_step:.0f} g/s "
        f"(MFU ~{mfu*100:.1f}% of {peak/1e12:.0f} TF/s peak on {kind})")
    return t_x / t_k, 16.0 / t_step, mfu * 100, peak, kind


def peak_flops_per_chip():
    """(peak_flops, device_kind) for fp32-accumulate matmuls on the MXU.

    Table from public TPU specs (bf16-input/f32-accumulate peak; default
    jax precision runs one bf16 MXU pass so this is the right roofline).
    Unknown kinds fall back to the v5e-class 98 TF/s fp32 figure used in
    rounds 1-3 — the JSON labels whichever constant was applied so the
    MFU number is never silently wrong on another chip (ADVICE r3)."""
    import jax

    kind = jax.devices()[0].device_kind
    table = {
        "TPU v4": 275e12, "TPU v5": 459e12, "TPU v5p": 459e12,
        "TPU v5 lite": 197e12, "TPU v5e": 197e12,
        "TPU v6 lite": 918e12, "TPU v6e": 918e12, "TPU7x": 2307e12,
    }
    for k, v in table.items():
        if kind.lower().startswith(k.lower()):
            return v, kind
    return 98e12, f"{kind} (unknown kind; v5e-class fp32 fallback)"


def wait_for_device(attempts=4, probe_timeout=420, backoff=180):
    """Wedge-proof device-contact gate (VERDICT r3 item 1).

    Probes device contact in a fresh SUBPROCESS (a wedged backend hangs the
    client in C++ — an in-process retry can never recover), retrying with
    backoff across a ~30 min window instead of one 600 s alarm-exit. Only
    when a probe subprocess completes a real matmul round trip does the
    main process touch jax. Returns True on contact, False when the whole
    window passes without one."""
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "print('CONTACT', jax.default_backend(), float((x @ x)[0, 0]))"
    )
    for i in range(attempts):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=probe_timeout,
                capture_output=True, text=True,
            )
            if r.returncode == 0 and "CONTACT" in r.stdout:
                log(f"device contact probe ok ({time.time() - t0:.0f}s, try {i + 1})")
                return True
            log(f"probe try {i + 1}/{attempts} failed rc={r.returncode}: "
                f"{(r.stderr or '').strip()[-200:]}")
        except subprocess.TimeoutExpired:
            log(f"probe try {i + 1}/{attempts}: no device contact in {probe_timeout}s")
        if i + 1 < attempts:
            log(f"backing off {backoff}s before retry...")
            time.sleep(backoff)
    return False


def main():
    import os

    # persistent compile cache: remote TPU compiles are 20s-5min cold
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)

    if not wait_for_device():
        log("FATAL: no device contact within the retry window — tunnel/backend wedged")
        sys.exit(3)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # belt-and-braces: the subprocess proved contact, but still alarm-guard
    # the main process's own first contact so a wedge arriving BETWEEN the
    # probe and now cannot hang the bench forever
    import signal

    def _dead(signum, frame):
        log("FATAL: device contact lost after a successful probe")
        sys.exit(3)

    signal.signal(signal.SIGALRM, _dead)
    signal.alarm(600)
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    roundtrip = measure_roundtrip()
    signal.alarm(0)
    log(f"host<->device sync latency: {roundtrip * 1e3:.1f} ms (subtracted)")
    log("protocol v2: hoist-proof (scan over distinct batches); round-1 "
        "chained-same-batch numbers were inflated ~4-8x fwd / ~3x grad by "
        "XLA loop-invariant hoisting — see bench.py docstring")
    # all four modalities (xmg = 5-expert dispatch, the worst case)
    res = {}
    for i, mod in enumerate(("aig", "mig", "xag", "xmg")):
        res[mod] = bench_modality(mod, seed=i, roundtrip=roundtrip)
    big_kernel, big_xla, hi_cost, big_split = bench_large_train(roundtrip)
    d128_ratio, d128_gps, d128_mfu, peak, kind = bench_dscale(roundtrip)
    # D=256 bf16 (VERDICT r4 item 5): best-throughput dim/dtype point with
    # the round-4 bf16 HBM streaming. Guarded: a failure in this extras arm
    # must not cost the headline JSON line.
    try:
        d256_ratio, d256_gps, d256_mfu, _, _ = bench_dscale(roundtrip, 256, "bfloat16")
        d256 = {
            "d256_bf16_fwd_kernel_vs_xla_x": round(d256_ratio, 2),
            "d256_bf16_train_gps": round(d256_gps, 1),
            "d256_bf16_train_mfu_pct": round(d256_mfu, 2),
        }
    except Exception as e:
        log(f"[D=256 bfloat16] extras arm failed ({e!r}); omitting its rows")
        d256 = {}
    # headline metric unchanged from round 1 (aig+mig harmonic mean) so
    # rounds stay comparable in NAME; values are NOT comparable to r01
    # (protocol v2 above measures strictly more honestly)
    ours = 2.0 / (1.0 / res["aig"][0] + 1.0 / res["mig"][0])
    base = 2.0 / (1.0 / res["aig"][1] + 1.0 / res["mig"][1])
    print(
        json.dumps(
            {
                "metric": "graphs_per_sec_encode_aig_mig",
                "value": round(ours, 2),
                "unit": "graphs/s",
                "vs_baseline": round(ours / base, 2),
                "extra": {
                    "protocol": "v2 hoist-proof scan-distinct-batches; not comparable to r01 values",
                    **{
                        f"{m}_encode_gps": round(r[0], 1)
                        for m, r in res.items()
                    },
                    **{
                        f"{m}_train_gps": round(r[2], 1)
                        for m, r in res.items()
                    },
                    "bs64_train_gps_chunked_kernel": round(big_kernel, 1),
                    "bs64_train_gps_unchunked_auto": round(big_xla, 1),
                    "bs64_train_gps_split": round(big_split, 1),
                    "highest_precision_train_cost_x": round(hi_cost, 3),
                    "d128_fwd_kernel_vs_xla_x": round(d128_ratio, 2),
                    "d128_train_gps": round(d128_gps, 1),
                    "d128_train_mfu_pct": round(d128_mfu, 2),
                    **d256,
                    "mfu_peak_flops": peak,
                    "mfu_device_kind": kind,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
