"""Segment (per-destination-group) reductions for message passing.

TPU-native replacements for the reference's native aggregation deps:
  - torch_scatter scatter_add under PyG ``MessagePassing(aggr='add')``
    (reference: DG_VAE/deepgate/arch/gcn_conv.py:15-45)
  - PyG's segment ``softmax`` used by the attention aggregator
    (reference: DG_VAE/deepgate/arch/tfmlp.py:43)

All functions take static ``num_segments`` so they are jit/scan friendly and
lower to single XLA scatter/gather ops on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# PyG's softmax adds 1e-16 to the normalizer; we match it so attention
# weights agree bit-for-bit in fp32 (reference: torch_geometric softmax).
_SOFTMAX_EPS = 1e-16
_NEG_INF = -1e30


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum ``data`` rows into ``num_segments`` buckets keyed by ``segment_ids``."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(
    scores: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Numerically-safe softmax of ``scores`` within each segment.

    Matches PyG ``softmax(src, index)`` semantics (per-group max subtraction,
    normalizer + 1e-16) with an extra ``valid`` mask so padded edges
    contribute exactly zero weight.

    Args:
      scores: [E] float scores.
      segment_ids: [E] int32 group ids (destination slots).
      num_segments: static group count.
      valid: optional [E] bool; invalid entries get weight 0 and do not
        perturb the normalizer.
    Returns:
      [E] attention weights, zeros on invalid entries.
    """
    if valid is not None:
        scores = jnp.where(valid, scores, _NEG_INF)
    seg_max = segment_max(scores, segment_ids, num_segments)
    # Empty segments produce -inf max; clamp so exp() stays finite.
    seg_max = jnp.maximum(seg_max, _NEG_INF)
    shifted = scores - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    if valid is not None:
        ex = jnp.where(valid, ex, 0.0)
    denom = segment_sum(ex, segment_ids, num_segments) + _SOFTMAX_EPS
    return ex / denom[segment_ids]
