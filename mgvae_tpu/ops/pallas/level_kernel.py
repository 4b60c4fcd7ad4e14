"""Fused level-recurrence Pallas kernel (SURVEY.md §7.2 step 7).

The DAG-depth recurrence is the model's serial axis: per level, gather the
functional states of fan-in nodes, run per-gate-type attention + GRU, and
scatter updated states. The XLA path (models/dg_ae._level_scan_fast) spends
~30 us/level on ~12 serialized HLOs; this kernel collapses each level into
ONE grid step with the functional state hf resident in VMEM across the whole
loop — no HBM round trips between levels.

Design choices (TPU-specific):
  * grid=(L,): TPU grids execute sequentially, so ``hf`` (an output block
    whose index_map is constant) acts as a VMEM accumulator across levels —
    the standard revisited-output pattern.
  * gathers/scatters as chunked one-hot matmuls: Mosaic has no vectorized
    dynamic row gather, but (src == iota) one-hot blocks ride the MXU. The
    N axis is processed in 2048-wide chunks to bound VMEM.
  * every tensor stays 2D: index tables are fed as [L, W, 1] columns and all
    reductions keep dims (Mosaic cannot reshape 1D vectors); transposed
    matmuls go through dot_general dimension numbers instead of .T.
  * expert (gate-type) selection as an unrolled where-mask loop over the
    <=5 experts of a modality (take_along_axis does not lower on TPU).
  * masked segment softmax exactly like the XLA path (PyG semantics + the
    1e-16 normalizer), scores masked before exp so padding can't overflow.

FORWARD ONLY: training takes the XLA path (jax.grad through pallas_call
needs a hand-written VJP — planned); inference/encoding (the headline
benchmark) uses this kernel on TPU when the batch fits VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_CHUNK_BYTES = 2 * 1024 * 1024  # VMEM budget for one one-hot gather block


def _pick_chunk(ep: int, n: int) -> int:
    """N-axis chunk for the one-hot gather/scatter matmuls: bound the
    [Ep, chunk] f32 block to ~2MB of VMEM, floor 512, lane-aligned."""
    c = max(512, min(2048, _CHUNK_BYTES // max(ep * 4, 1)))
    c = (c // LANE) * LANE
    return min(c, _round_up(n, LANE))

# contract dim 0 of lhs with dim 0 of rhs: A^T @ B without a transpose op
_DN_T = (((0,), (0,)), ((), ()))


def kernel_fits(num_nodes: int, ep: int, np_: int, dim: int) -> bool:
    """Conservative VMEM gate: hf + one-hot blocks + incidence must fit.
    Empirically bs16-class batches (N<=8k, Ep<=512) compile and win ~2x;
    larger batches exceed VMEM and take the XLA scan path."""
    return num_nodes <= 8192 and ep <= 512 and np_ <= 512 and dim <= 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def fused_level_scan(
    pack_lv,    # [L, Ep, PW] f32: [vhs(D) | score | expert | pad...] per edge
    lv_src,     # [L, Ep] i32 source node of each in-edge
    lv_dslot,   # [L, Ep] i32 destination slot within the level
    lv_evalid,  # [L, Ep] i32 edge valid
    lv_nodes,   # [L, Np] i32 node ids at this level
    lv_upd,     # [L, Np] i32 update mask
    lv_e_n,     # [L, Np] i32 expert id per level node
    wkv_hf,     # [D, 2TD] hf-side key/value weights
    w_ih,       # [D, 3TD] GRU input weights (expert-stacked)
    b_ih,       # [T, 3D]
    b_hh,       # [T, 3D]
    wa_k,       # [T, D] attention key vector per expert
    *,
    num_nodes: int,
    dim: int,
    num_experts: int,
    interpret: bool = False,
):
    """Returns hf [num_nodes, dim] f32."""
    L, Ep, PW = pack_lv.shape
    Np = lv_nodes.shape[1]
    D, T = dim, num_experts
    N = num_nodes

    # feed index tables as [L, W, 1] so in-kernel values are 2D columns
    lv_src, lv_dslot, lv_evalid = (a[:, :, None] for a in (lv_src, lv_dslot, lv_evalid))
    lv_nodes, lv_upd, lv_e_n = (a[:, :, None] for a in (lv_nodes, lv_upd, lv_e_n))

    n_chunk = _pick_chunk(Ep, N)
    kernel = functools.partial(_level_kernel, N=N, D=D, T=T, Ep=Ep, Np=Np, n_chunk=n_chunk)
    row_spec = lambda blk: pl.BlockSpec(blk, lambda i: (i,) + (0,) * (len(blk) - 1), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            row_spec((1, Ep, PW)),
            row_spec((1, Ep, 1)),
            row_spec((1, Ep, 1)),
            row_spec((1, Ep, 1)),
            row_spec((1, Np, 1)),
            row_spec((1, Np, 1)),
            row_spec((1, Np, 1)),
            full, full, full, full, full,
        ],
        out_specs=pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), pack_lv.dtype),
        interpret=interpret,
    )(pack_lv, lv_src, lv_dslot, lv_evalid, lv_nodes, lv_upd, lv_e_n,
      wkv_hf, w_ih, b_ih, b_hh, wa_k)


def _select(stacked, expert_onehots, T, width):
    """stacked [M, T*width] -> [M, width] selecting each row's expert slice.
    expert_onehots: list of [M, 1] f32 indicator columns."""
    out = expert_onehots[0] * stacked[:, :width]
    for t in range(1, T):
        out = out + expert_onehots[t] * stacked[:, t * width : (t + 1) * width]
    return out


def _level_kernel(
    pack_ref, src_ref, dslot_ref, evalid_ref, nodes_ref, upd_ref, e_n_ref,
    wkv_hf_ref, w_ih_ref, b_ih_ref, b_hh_ref, wa_k_ref,
    hf_ref,
    *, N, D, T, Ep, Np, n_chunk,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hf_ref[:] = jnp.zeros_like(hf_ref)

    f32 = pack_ref.dtype
    pack = pack_ref[0]                        # [Ep, PW]
    vhs = pack[:, :D]
    score_static = pack[:, D : D + 1]         # [Ep, 1]
    e_edge = pack[:, D + 1 : D + 2].astype(jnp.int32)  # [Ep, 1]
    src = src_ref[0]                          # [Ep, 1] i32
    dslot = dslot_ref[0]                      # [Ep, 1]
    evalid = evalid_ref[0] > 0                # [Ep, 1] bool
    evf = evalid.astype(f32)

    # ---- gather hf[src] via chunked one-hot matmuls ----------------------
    hf_src = jnp.zeros((Ep, D), f32)
    for c in range(0, N, n_chunk):
        ch = min(n_chunk, N - c)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Ep, ch), 1) + c
        onehot = (src == cols).astype(f32)    # [Ep, ch]
        hf_src = hf_src + jnp.dot(
            onehot, hf_ref[pl.ds(c, ch), :], preferred_element_type=f32
        )

    # ---- hf-side key/value + expert select --------------------------------
    kv = jnp.dot(hf_src, wkv_hf_ref[:], preferred_element_type=f32)  # [Ep, 2TD]
    eo_edge = [(e_edge == t).astype(f32) for t in range(T)]          # [Ep, 1] each
    khf = _select(kv[:, : T * D], eo_edge, T, D)
    vhf = _select(kv[:, T * D :], eo_edge, T, D)
    wa = jnp.zeros((Ep, D), f32)
    for t in range(T):
        wa = wa + eo_edge[t] * wa_k_ref[t : t + 1, :]
    score = score_static + jnp.sum(khf * wa, axis=-1, keepdims=True)  # [Ep, 1]
    v = vhs + vhf

    # ---- masked segment softmax over destination slots --------------------
    slots = jax.lax.broadcasted_iota(jnp.int32, (Ep, Np), 1)
    inc = (dslot == slots) & evalid           # [Ep, Np]
    inc_f = inc.astype(f32)
    score_m = jnp.where(evalid, score, -1e30)                         # [Ep, 1]
    smax = jnp.maximum(
        jnp.max(jnp.where(inc, score, -1e30), axis=0, keepdims=True), -1e30
    )                                                                  # [1, Np]
    shifted = jnp.clip(
        score_m - jnp.sum(inc_f * smax, axis=1, keepdims=True), -80.0, 0.0
    )
    ex_s = jnp.exp(shifted) * evf                                      # [Ep, 1]
    denom = jnp.sum(ex_s * inc_f, axis=0, keepdims=True) + 1e-16       # [1, Np]
    den_edge = jnp.sum(inc_f * denom, axis=1, keepdims=True)           # [Ep, 1]
    attn = ex_s / jnp.where(den_edge > 0, den_edge, 1.0)
    msg = jax.lax.dot_general(
        inc_f, v * attn, dimension_numbers=_DN_T, preferred_element_type=f32
    )                                                                  # [Np, D]

    # ---- GRU with h == 0 ---------------------------------------------------
    e_n = e_n_ref[0]                          # [Np, 1]
    eo_n = [(e_n == t).astype(f32) for t in range(T)]
    gi = _select(jnp.dot(msg, w_ih_ref[:], preferred_element_type=f32), eo_n, T, 3 * D)
    bi = jnp.zeros((Np, 3 * D), f32)
    bh = jnp.zeros((Np, 3 * D), f32)
    for t in range(T):
        bi = bi + eo_n[t] * b_ih_ref[t : t + 1, :]
        bh = bh + eo_n[t] * b_hh_ref[t : t + 1, :]
    gi = gi + bi
    r = jax.nn.sigmoid(gi[:, :D] + bh[:, :D])
    z = jax.nn.sigmoid(gi[:, D : 2 * D] + bh[:, D : 2 * D])
    nw = jnp.tanh(gi[:, 2 * D :] + r * bh[:, 2 * D :])
    upd = (upd_ref[0] > 0).astype(f32)        # [Np, 1]
    h_new = (1.0 - z) * nw * upd

    # ---- scatter-add back into hf (rows are fresh: previously zero) -------
    nodes = nodes_ref[0]                      # [Np, 1]
    for c in range(0, N, n_chunk):
        ch = min(n_chunk, N - c)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Np, ch), 1) + c
        onehot = (nodes == cols).astype(f32) * upd                     # [Np, ch]
        hf_ref[pl.ds(c, ch), :] += jax.lax.dot_general(
            onehot, h_new, dimension_numbers=_DN_T, preferred_element_type=f32
        )
