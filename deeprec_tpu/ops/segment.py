"""Segment combiners for embedding pooling.

TPU-native equivalents of the reference's optimized CPU segment reductions
(tensorflow/core/kernels/segment_reduction_ali_ops.cc:142-243 — the
``SparseSegment{Sum,Mean,SqrtN}`` combiner hot path of
``embedding_lookup_sparse``). On TPU these lower to one-hot matmuls or
scatter-adds that XLA fuses; no custom threading needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_combine(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    combiner: str = "mean",
    weights: jax.Array | None = None,
) -> jax.Array:
    """Pool rows into per-segment vectors.

    combiner: 'sum' | 'mean' | 'sqrtn' (matching embedding_lookup_sparse,
    reference embedding_ops.py:480). ``weights`` multiplies rows before
    pooling and replaces counts in the mean/sqrtn denominators (the
    safe_embedding_lookup_sparse weighted semantics).
    """
    if weights is not None:
        data = data * weights[..., None]
        denom_src = weights
    else:
        denom_src = jnp.ones(data.shape[:1], data.dtype)
    pooled = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    if combiner == "sum":
        return pooled
    denom = jax.ops.segment_sum(denom_src, segment_ids, num_segments=num_segments)
    if combiner == "mean":
        return pooled / jnp.maximum(denom, 1e-12)[..., None]
    if combiner == "sqrtn":
        if weights is not None:
            denom = jnp.sqrt(
                jax.ops.segment_sum(weights * weights, segment_ids, num_segments=num_segments)
            )
        else:
            denom = jnp.sqrt(denom)
        return pooled / jnp.maximum(denom, 1e-12)[..., None]
    raise ValueError(f"unknown combiner {combiner!r}")
