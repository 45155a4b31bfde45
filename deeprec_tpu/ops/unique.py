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
    ukeys: K.Keys       # [U] unique keys, EMPTY-padded at the tail
    inverse: jax.Array  # [n] int32: position of each input key in ukeys
    counts: jax.Array   # [U] int32: multiplicity of each unique key (0 in padding)
    n_unique: jax.Array  # int32 scalar (EMPTY/invalid inputs excluded)
    # int32 scalar: DISTINCT valid keys beyond the max_unique cap this
    # batch (they read the null row and take no update) — the saturation
    # signal the health watchdog alarms on. n_unique alone cannot detect
    # saturation when the capped slots also hold EMPTY padding groups.
    # (python-int default, NOT jnp.zeros: a module-level jnp call would
    # initialise the XLA backend at import, breaking
    # jax.distributed.initialize on multi-process workers)
    n_overflow: jax.Array = 0


def unique_int32(idx: jax.Array):
    """Dedup a 1-D int32 index batch (single-plane fast path for static
    tables, e.g. multi-hash sub-indices). Returns (uidx, inverse, counts);
    ``uidx`` is padded at the tail with INT32_MAX-like max values — callers
    mask with ``uidx < size``."""
    n = idx.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    sidx, spos = jax.lax.sort((idx, pos), num_keys=1)
    iota = jnp.arange(n, dtype=jnp.int32)
    prev = sidx[jnp.maximum(iota - 1, 0)]
    first = (sidx != prev).at[0].set(True)
    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    inverse = jnp.zeros((n,), jnp.int32).at[spos].set(uid_sorted,
                                                      unique_indices=True)
    scatter_to = jnp.where(first, uid_sorted, n + 1)  # OOB even of [n+1]
    uidx = jnp.full((n,), jnp.iinfo(jnp.int32).max, jnp.int32)
    uidx = uidx.at[scatter_to].set(sidx, mode="drop", unique_indices=True)
    counts = _group_counts(scatter_to, iota, n)
    return uidx, inverse, counts


def _group_counts(scatter_to: jax.Array, iota: jax.Array, n: int) -> jax.Array:
    """Per-group sizes from sorted group starts — a collision-free scatter
    of each group's first position followed by an adjacent difference
    (groups are contiguous in the sorted order), replacing the
    duplicate-index scatter-add that XLA serializes on TPU."""
    starts = jnp.full((n + 1,), n, jnp.int32)
    starts = starts.at[scatter_to].set(iota, mode="drop", unique_indices=True)
    return starts[1:] - starts[:-1]


def unique_cols(ids: K.Keys, max_unique: int | None = None) -> UniqueResult:
    """Column-parallel dedup of a feature-major ``[W, B]`` key batch.

    Semantically identical to ``unique(ids.reshape(-1))`` (the flat layout
    is feature-major, so flat index = w*B + b) — but the sort runs as W
    INDEPENDENT row sorts of width B instead of one sort of width W*B.
    ``lax.sort`` is the train step's most expensive op (bitonic depth
    log^2): at Criteo shapes (26 x 4096) the batched form halves the
    dedup cost measured on-chip.

    VALID ONLY when every key can appear in a single row: width-1 columns
    with pairwise-distinct salt groups (no shared embeddings, no sequence
    columns). A key recurring across two rows would produce two unique
    groups claiming one table slot — duplicate scatter destinations
    downstream. ``EmbeddingCollection`` checks eligibility and falls back
    to :func:`unique`. Cross-column duplicates after salting require an
    exact 64-bit key equality across different XOR salts (~2^-64 per pair)
    and degrade one step's update for that key, not correctness of the
    store.
    """
    W, B = ids.shape
    n = W * B
    cap = n if max_unique is None or max_unique >= n else max_unique
    u_out = cap + 1 if cap < n else n

    pos = jax.lax.broadcasted_iota(jnp.int32, (W, B), 1)
    shi, slo, spos = jax.lax.sort((ids.hi, ids.lo, pos), num_keys=2)
    skeys = K.Keys(shi, slo)

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (W, B), 1)
    prev = K.Keys(shi[:, jnp.maximum(jnp.arange(B) - 1, 0)],
                  slo[:, jnp.maximum(jnp.arange(B) - 1, 0)])
    first = ~K.eq(skeys, prev)
    first = first.at[:, 0].set(True)

    # per-row group rank and group count
    uid_row = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    groups_per_row = uid_row[:, -1] + 1
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(groups_per_row)[:-1]])
    guid = offsets[:, None] + uid_row
    over = guid >= cap
    guid_c = jnp.where(over, cap, guid)

    # inverse in flat feature-major layout: one collision-free scatter
    row_base = (jax.lax.broadcasted_iota(jnp.int32, (W, B), 0) * B)
    inverse = jnp.zeros((n,), jnp.int32).at[
        (row_base + spos).reshape(-1)].set(guid_c.reshape(-1),
                                           unique_indices=True)

    scatter_to = jnp.where(first & ~over, guid, u_out + 2).reshape(-1)
    ukeys = K.empty_like((u_out,))
    ukeys = K.Keys(
        ukeys.hi.at[scatter_to].set(shi.reshape(-1), mode="drop",
                                    unique_indices=True),
        ukeys.lo.at[scatter_to].set(slo.reshape(-1), mode="drop",
                                    unique_indices=True))

    # per-row group extents -> counts: starts[w, g] = first position of
    # group g in row w (B when g has no group); group g's count =
    # starts[g+1] - starts[g], the last group terminated by B
    starts = jnp.full((W, B + 1), B, jnp.int32)
    # non-first lanes route fully OUT of bounds (B+1) so mode="drop"
    # removes them — an in-bounds duplicate index under unique_indices=True
    # is undefined behaviour even if the cell is never read
    starts = starts.at[
        (jax.lax.broadcasted_iota(jnp.int32, (W, B), 0),
         jnp.where(first, uid_row, B + 1))].set(iota_b, mode="drop",
                                                unique_indices=True)
    gstarts = starts[:, :B]
    counts_row = jnp.where(gstarts < B, starts[:, 1:] - gstarts, 0)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (W, B), 1)
    gdest = offsets[:, None] + g_iota
    gdest = jnp.where((gstarts < B) & (gdest < cap), gdest, u_out + 2)
    counts = jnp.zeros((u_out,), jnp.int32).at[gdest.reshape(-1)].set(
        counts_row.reshape(-1), mode="drop", unique_indices=True)

    valid_group = ~K.is_empty(ukeys)
    counts = counts * valid_group.astype(jnp.int32)
    n_unique = jnp.sum(valid_group.astype(jnp.int32))
    n_overflow = jnp.sum((first & over & ~K.is_empty(skeys))
                         .astype(jnp.int32))
    return UniqueResult(ukeys, inverse, counts, n_unique, n_overflow)


def unique(ids: K.Keys, max_unique: int | None = None) -> UniqueResult:
    """Deduplicate a 1-D batch of keys. EMPTY keys group together at the
    front of the sort order and are excluded from ``n_unique``; their
    ``inverse`` entries still point at their (EMPTY) group so downstream
    gathers of the null row remain valid.

    ``max_unique`` caps the static width ``U`` of the unique set at
    ``max_unique + 1`` (instead of ``n``), shrinking every downstream op —
    hash probes, row gathers, optimizer scatters — by the same factor: the
    static-shape trade the sharded exchange also makes with ``bucket_cap``.
    Unique keys beyond the cap collapse into a dedicated EMPTY overflow
    group at index ``max_unique``: they read the null row (zeros) and take
    no updates this step. Size it so saturation (n_unique == max_unique)
    stays rare; heavy-tailed id batches need ~n/4."""
    n = ids.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    skeys, (spos,) = K.sort_with(ids, pos)

    iota = jnp.arange(n, dtype=jnp.int32)
    prev = skeys[jnp.maximum(iota - 1, 0)]
    first = ~K.eq(skeys, prev)
    first = first.at[0].set(True)

    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1

    if max_unique is None or max_unique >= n:
        u_out = n
        inv_sorted = uid_sorted
        keep_first = first
        starts_to = jnp.where(first, uid_sorted, u_out + 2)
        over = jnp.zeros((n,), jnp.bool_)
    else:
        u_out = max_unique + 1  # index max_unique = the overflow/null group
        over = uid_sorted >= max_unique
        inv_sorted = jnp.where(over, max_unique, uid_sorted)
        keep_first = first & ~over
        # keep the first overflow group's start too: it terminates the last
        # kept group's extent in the adjacent difference below
        starts_to = jnp.where(first & (uid_sorted <= max_unique),
                              uid_sorted, u_out + 2)

    inverse = jnp.zeros((n,), jnp.int32).at[spos].set(inv_sorted,
                                                      unique_indices=True)
    scatter_to = jnp.where(keep_first, inv_sorted, u_out + 2)  # OOB
    ukeys = K.empty_like((u_out,))
    ukeys = K.Keys(
        ukeys.hi.at[scatter_to].set(skeys.hi, mode="drop", unique_indices=True),
        ukeys.lo.at[scatter_to].set(skeys.lo, mode="drop", unique_indices=True),
    )
    starts = jnp.full((u_out + 1,), n, jnp.int32)
    starts = starts.at[starts_to].set(iota, mode="drop", unique_indices=True)
    counts = starts[1:] - starts[:-1]
    valid_group = ~K.is_empty(ukeys)
    counts = counts * valid_group.astype(jnp.int32)
    n_unique = jnp.sum(valid_group.astype(jnp.int32))
    n_overflow = jnp.sum((first & over & ~K.is_empty(skeys))
                         .astype(jnp.int32))
    return UniqueResult(ukeys, inverse, counts, n_unique, n_overflow)
