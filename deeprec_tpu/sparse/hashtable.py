"""Device-resident dynamic hash table: 64-bit key -> row slot.

This is the TPU-native replacement for DeepRec's CPU hash maps behind
``KVInterface`` (reference: tensorflow/core/framework/embedding/
{kv_interface.h:27, dense_hash_map.h, lockless_hash_map.h:41}). Instead of a
pointer-chasing host map, the index lives in HBM as flat int32 planes and all
operations are batched, vectorized XLA ops with static shapes:

* **lookup** — open addressing with double hashing (odd stride, full-cycle
  on the pow2 capacity), vectorized over the whole batch; a ``fori_loop``
  over probe offsets (bounded by ``max_probes``).
* **insert** — a parallel-claim algorithm: each round, every pending key
  proposes its current probe slot; contenders for the same empty slot are
  arbitrated with a scatter-min of their rank; winners write their key,
  losers (and keys whose candidate was occupied) advance to the next offset.
  This replaces the reference's lockless CPU insert (lockless_hash_map.h)
  with an O(rounds) data-parallel schedule that XLA maps onto the VPU.

Invariants:
  * capacity is a power of two; home slot = hash(key) & (cap-1).
  * every stored key lives within ``max_probes`` slots of its home (inserts
    that cannot place within the bound report overflow instead), so lookup's
    static probe bound is exact, not heuristic.
  * the all-ones key (int64 -1) is the EMPTY sentinel and cannot be stored
    (DeepRec likewise reserves -1 as the EV invalid key).
  * no tombstones: deletion happens only via :func:`rebuild` (eviction runs
    at checkpoint time, mirroring EmbeddingVar::Shrink at save —
    embedding_var.h:264-313).

The returned ``slots`` index an external row store of shape ``[capacity+1,
...]``: slot ``capacity`` is the shared *null row* used for failed lookups,
padding keys, and overflow, so downstream gathers never need masking.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import keys as K

INT32_MAX = np.int32(2**31 - 1)


class HashTable(NamedTuple):
    """Pytree state of the key index. ``key_hi/key_lo``: int32[capacity]."""

    key_hi: jax.Array
    key_lo: jax.Array
    size: jax.Array  # int32 [1]: number of occupied slots (shape (1,) so a
    #                  sharded stack of tables can shard it like any row axis)
    overflow: jax.Array  # int32 [1]: cumulative failed inserts

    @property
    def capacity(self) -> int:
        return self.key_hi.shape[0]

    @property
    def stored_keys(self) -> K.Keys:
        return K.Keys(self.key_hi, self.key_lo)


def create(capacity: int) -> HashTable:
    if capacity & (capacity - 1):
        raise ValueError(f"capacity must be a power of two, got {capacity}")
    return HashTable(
        key_hi=jnp.full((capacity,), K.EMPTY_HI, jnp.int32),
        key_lo=jnp.full((capacity,), K.EMPTY_LO, jnp.int32),
        size=jnp.zeros((1,), jnp.int32),
        overflow=jnp.zeros((1,), jnp.int32),
    )


def _home(keys: K.Keys, cap: int) -> jax.Array:
    return (K.hash32(keys) & np.uint32(cap - 1)).astype(jnp.int32)


def _step(keys: K.Keys, cap: int) -> jax.Array:
    """Double-hashing stride: odd (hence coprime with the pow2 capacity, so
    the probe sequence is a full cycle). Keeps the probe-length tail
    exponential instead of linear-probing's clustered tail."""
    return ((K.hash32(keys, seed=7) | np.uint32(1)) & np.uint32(cap - 1)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_probes",))
def lookup(table: HashTable, keys: K.Keys, max_probes: int = 32) -> Tuple[jax.Array, jax.Array]:
    """Find slots for a batch of keys.

    Returns ``(slots, found)``: ``slots[i] == capacity`` (the null row) when
    not found. EMPTY-sentinel keys are never found.
    """
    cap = table.capacity
    mask = np.int32(cap - 1)
    home = _home(keys, cap)
    step = _step(keys, cap)
    invalid = K.is_empty(keys)

    slots0 = jnp.full(keys.shape, cap, jnp.int32)
    found0 = jnp.zeros(keys.shape, jnp.bool_)
    done0 = invalid

    def body(i, carry):
        slots, found, done = carry
        idx = (home + i * step) & mask
        s_hi = table.key_hi[idx]
        s_lo = table.key_lo[idx]
        stored = K.Keys(s_hi, s_lo)
        match = K.eq(stored, keys) & ~done
        empty = K.is_empty(stored) & ~done
        slots = jnp.where(match, idx, slots)
        found = found | match
        done = done | match | empty
        return slots, found, done

    slots, found, _ = jax.lax.fori_loop(0, max_probes, body, (slots0, found0, done0))
    return slots, found


@functools.partial(jax.jit, static_argnames=("max_probes",))
def lookup_or_insert(
    table: HashTable,
    ukeys: K.Keys,
    max_probes: int = 32,
) -> Tuple[HashTable, jax.Array, jax.Array]:
    """Find-or-claim slots for a batch of **deduplicated** keys.

    EMPTY-sentinel keys act as padding and map to the null slot. Returns
    ``(table, slots, created)`` where ``created[i]`` marks keys that claimed
    a fresh slot this call (their rows must be initialised by the caller).
    """
    cap = table.capacity
    mask = np.int32(cap - 1)
    n = ukeys.shape[0]

    slots, found = lookup(table, ukeys, max_probes)
    invalid = K.is_empty(ukeys)
    pending = ~found & ~invalid

    home = _home(ukeys, cap)
    step = _step(ukeys, cap)
    rank = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)

    key_hi, key_lo = table.key_hi, table.key_lo
    off = jnp.zeros((n,), jnp.int32)

    def round_body(_, carry):
        key_hi, key_lo, pending, off, slots = carry
        idx = (home + off * step) & mask
        stored = K.Keys(key_hi[idx], key_lo[idx])
        empty = K.is_empty(stored)
        # Already present? (another duplicate across calls can't happen —
        # keys are deduped — but a pending key can discover itself if a
        # previous round stored it; keep the check for safety.)
        match = K.eq(stored, ukeys)
        slots = jnp.where(pending & match, idx, slots)
        pending = pending & ~match

        # Arbitrate empty-slot claims by scatter-min of rank.
        want = pending & empty
        claim_idx = jnp.where(want, idx, cap)  # losers scatter out of range
        arb = jnp.full((cap + 1,), INT32_MAX, jnp.int32)
        arb = arb.at[claim_idx].min(rank, mode="drop")
        win = want & (arb[idx] == rank)

        widx = jnp.where(win, idx, cap)
        key_hi = key_hi.at[widx].set(ukeys.hi, mode="drop")
        key_lo = key_lo.at[widx].set(ukeys.lo, mode="drop")
        slots = jnp.where(win, idx, slots)
        pending = pending & ~win
        off = jnp.where(pending, off + 1, off)
        return key_hi, key_lo, pending, off, slots

    key_hi, key_lo, pending, off, slots = jax.lax.fori_loop(
        0, max_probes, round_body, (key_hi, key_lo, pending, off, slots)
    )

    created = (slots != cap) & ~found & ~invalid
    n_failed = jnp.sum(pending).astype(jnp.int32)
    new_table = HashTable(
        key_hi=key_hi,
        key_lo=key_lo,
        size=table.size + jnp.sum(created).astype(jnp.int32),
        overflow=table.overflow + n_failed[None],
    )
    return new_table, slots, created


def occupied_mask(table: HashTable) -> jax.Array:
    return ~K.is_empty(table.stored_keys)


@functools.partial(jax.jit, static_argnames=("new_capacity", "max_probes"))
def rebuild(table: HashTable, keep: jax.Array, new_capacity: int | None = None,
            max_probes: int = 32) -> Tuple[HashTable, jax.Array]:
    """Rebuild the table keeping only slots where ``keep`` is True.

    Deletion/growth primitive (eviction at checkpoint time; capacity growth
    between steps). Returns ``(new_table, old_to_new)`` where ``old_to_new``
    maps old slot -> new slot (or new_capacity for dropped/empty slots) so
    callers can permute their row stores:

        new_rows = old_rows[reverse_permutation]  via
        new_rows = jnp.zeros(...).at[old_to_new].set(old_rows, mode='drop')
    """
    cap = table.capacity
    new_cap = new_capacity or cap
    live = occupied_mask(table) & keep
    kkeys = K.where(live, table.stored_keys, K.empty_like((cap,)))
    fresh = create(new_cap)
    fresh, new_slots, _ = lookup_or_insert(fresh, kkeys, max_probes)
    old_to_new = jnp.where(live, new_slots, new_cap)
    return fresh, old_to_new
