"""Fixed-shape deduplication of 64-bit key batches.

Replaces the ``unique(ids)`` step of DeepRec's embedding lookup path
(reference: tensorflow/python/ops/embedding_ops.py:480 — unique -> gather ->
segment combine). Under jit everything must be static-shaped, so the unique
set is padded to the input length with the EMPTY sentinel; padding maps to
the table's null slot downstream.

Implemented as a lexicographic sort over the (hi, lo) planes (one fused
``lax.sort`` call with the original positions as payload) followed by
adjacent-difference segmentation — the standard TPU idiom for dedup.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..sparse import keys as K


class UniqueResult(NamedTuple):
    ukeys: K.Keys       # [n] unique keys, EMPTY-padded at the tail
    inverse: jax.Array  # [n] int32: position of each input key in ukeys
    counts: jax.Array   # [n] int32: multiplicity of each unique key (0 in padding)
    n_unique: jax.Array  # int32 scalar (EMPTY/invalid inputs excluded)


def unique_int32(idx: jax.Array):
    """Dedup a 1-D int32 index batch (single-plane fast path for static
    tables, e.g. multi-hash sub-indices). Returns (uidx, inverse, counts);
    ``uidx`` is padded at the tail with INT32_MAX-like max values — callers
    mask with ``uidx < size``."""
    n = idx.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    sidx, spos = jax.lax.sort((idx, pos), num_keys=1)
    prev = sidx[jnp.maximum(jnp.arange(n) - 1, 0)]
    first = (sidx != prev).at[0].set(True)
    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    inverse = jnp.zeros((n,), jnp.int32).at[spos].set(uid_sorted)
    scatter_to = jnp.where(first, uid_sorted, n)
    uidx = jnp.full((n,), jnp.iinfo(jnp.int32).max, jnp.int32)
    uidx = uidx.at[scatter_to].set(sidx, mode="drop")
    counts = jnp.zeros((n,), jnp.int32).at[uid_sorted].add(1)
    return uidx, inverse, counts


def unique(ids: K.Keys) -> UniqueResult:
    """Deduplicate a 1-D batch of keys. EMPTY keys group together at the
    front of the sort order and are excluded from ``n_unique``; their
    ``inverse`` entries still point at their (EMPTY) group so downstream
    gathers of the null row remain valid."""
    n = ids.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    skeys, (spos,) = K.sort_with(ids, pos)

    prev = skeys[jnp.maximum(jnp.arange(n) - 1, 0)]
    first = ~K.eq(skeys, prev)
    first = first.at[0].set(True)

    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    inverse = jnp.zeros((n,), jnp.int32).at[spos].set(uid_sorted)

    scatter_to = jnp.where(first, uid_sorted, n)
    ukeys = K.empty_like((n,))
    ukeys = K.Keys(
        ukeys.hi.at[scatter_to].set(skeys.hi, mode="drop"),
        ukeys.lo.at[scatter_to].set(skeys.lo, mode="drop"),
    )
    counts = jnp.zeros((n,), jnp.int32).at[uid_sorted].add(1)
    valid_group = ~K.is_empty(ukeys)
    counts = counts * valid_group.astype(jnp.int32)
    n_unique = jnp.sum(valid_group.astype(jnp.int32))
    return UniqueResult(ukeys, inverse, counts, n_unique)
