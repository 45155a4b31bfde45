"""StructuredModel: compute the user tower once per request.

TPU-native rebuild of the reference's StructureFeature / structured-model
pass (reference: tensorflow/contrib/structured_model/python/core.py:31-58
— the graph pass finds the boundary tensors between a user tower and an
item tower and inserts tile ops so the user side runs once per request
instead of once per candidate item).

No graph pass is needed in a functional framework: the structure is the
call. :func:`structured_forward` evaluates the user tower at request
granularity ``[B_req, ...]``, the item tower at candidate granularity
``[B_req, I, ...]``, and broadcasts the user activations across the item
axis for the joint head — the tile the reference's pass inserted is one
``broadcast_to`` that XLA fuses away.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def structured_forward(
    user_fn: Callable[..., jax.Array],
    item_fn: Callable[..., jax.Array],
    head_fn: Callable[[jax.Array, jax.Array], jax.Array],
    user_inputs,
    item_inputs,
) -> jax.Array:
    """Score ``I`` candidate items per request with one user-tower pass.

    Args:
      user_fn: ``user_inputs ([B, ...]) -> [B, Du]`` user representation.
      item_fn: ``item_inputs ([B, I, ...]) -> [B, I, Di]`` — applied to the
        flattened ``[B*I, ...]`` view (batched, MXU-friendly).
      head_fn: ``([B, I, Du], [B, I, Di]) -> [B, I]`` joint scorer.
      user_inputs / item_inputs: pytrees of arrays with the leading shapes
        above.

    Returns [B, I] scores. The user tower runs at B, not B*I — the
    reference's enable_structured_model_mode win, by construction.
    """
    u = user_fn(user_inputs)                        # [B, Du] — once
    leaves = jax.tree_util.tree_leaves(item_inputs)
    B, I = leaves[0].shape[:2]
    flat_items = jax.tree_util.tree_map(
        lambda x: x.reshape((B * I,) + x.shape[2:]), item_inputs)
    v = item_fn(flat_items)                         # [B*I, Di]
    v = v.reshape(B, I, -1)
    u_tiled = jnp.broadcast_to(u[:, None, :], (B, I, u.shape[-1]))
    return head_fn(u_tiled, v)


def dot_head(u: jax.Array, v: jax.Array) -> jax.Array:
    """The common scorer: per-candidate dot product (retrieval ranking)."""
    return jnp.sum(u * v, axis=-1)
