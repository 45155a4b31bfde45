"""Device-resident dynamic hash table: 64-bit key -> row slot.

This is the TPU-native replacement for DeepRec's CPU hash maps behind
``KVInterface`` (reference: tensorflow/core/framework/embedding/
{kv_interface.h:27, dense_hash_map.h, lockless_hash_map.h:41}). Instead of a
pointer-chasing host map, the index lives in HBM as flat int32 planes and all
operations are batched, vectorized XLA ops with static shapes:

* **lookup** — bucketed open addressing: slots are grouped into windows of
  ``WINDOW`` consecutive slots; one probe gathers a key's whole bucket (a
  contiguous 2-D row — one vector load instead of WINDOW scalar gathers)
  and matches all of it on the VPU. Bucket-to-bucket stepping uses double
  hashing (odd stride, full-cycle on the pow2 bucket count). A
  ``while_loop`` exits as soon as every key resolves — at sane load
  factors that is the first probe, so a lookup costs ~2 row gathers.
* **insert** — a parallel-claim algorithm at bucket granularity: each
  round, every pending key proposes the first empty slot of its current
  bucket; contenders for the same slot are arbitrated with a scatter-min
  of their rank; winners write their key, losers retry (same bucket if it
  may still have room, else the next bucket). This replaces the
  reference's lockless CPU insert (lockless_hash_map.h) with an O(rounds)
  data-parallel schedule, where rounds ≈ max bucket contention, not probe
  length.

Invariants:
  * capacity is a power of two; home bucket = hash(key) & (n_buckets-1).
  * inserts always fill the earliest bucket (in probe order) that has an
    empty slot, so "bucket with an empty slot and no match" proves
    absence during lookup, and every stored key lives within
    ``max_probes`` buckets of its home (failed inserts report overflow) —
    the probe bound is exact, not heuristic.
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

# Slots per bucket. One probe gathers a whole bucket row; 16 int32 lanes
# per plane keeps the gather a cheap contiguous row load while making a
# full bucket (the only reason to probe again) rare below ~0.85 load.
WINDOW = 16


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


def _window(cap: int) -> int:
    return min(WINDOW, cap)


def _home_bucket(keys: K.Keys, n_buckets: int) -> jax.Array:
    return (K.hash32(keys) & np.uint32(n_buckets - 1)).astype(jnp.int32)


def _bucket_step(keys: K.Keys, n_buckets: int) -> jax.Array:
    """Double-hashing bucket stride: odd (hence coprime with the pow2
    bucket count, so the probe sequence is a full cycle)."""
    return ((K.hash32(keys, seed=7) | np.uint32(1))
            & np.uint32(n_buckets - 1)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_probes",))
def lookup(table: HashTable, keys: K.Keys, max_probes: int = 32) -> Tuple[jax.Array, jax.Array]:
    """Find slots for a batch of keys.

    Returns ``(slots, found)``: ``slots[i] == capacity`` (the null row) when
    not found. EMPTY-sentinel keys are never found.
    """
    cap = table.capacity
    W = _window(cap)
    nb = cap // W
    bmask = np.int32(nb - 1)
    hi2d = table.key_hi.reshape(nb, W)
    lo2d = table.key_lo.reshape(nb, W)
    home = _home_bucket(keys, nb)
    step = _bucket_step(keys, nb)
    invalid = K.is_empty(keys)
    lane = jax.lax.broadcasted_iota(jnp.int32, (keys.shape[0], W), 1)

    slots0 = jnp.full(keys.shape, cap, jnp.int32)
    found0 = jnp.zeros(keys.shape, jnp.bool_)

    def cond(carry):
        i, _, _, done = carry
        return (i < max_probes) & ~done.all()

    def body(carry):
        i, slots, found, done = carry
        b = (home + i * step) & bmask
        hw = hi2d[b]                       # [n, W] one row gather per plane
        lw = lo2d[b]
        match = (hw == keys.hi[:, None]) & (lw == keys.lo[:, None]) & ~done[:, None]
        empty = (hw == K.EMPTY_HI) & (lw == K.EMPTY_LO)
        hit = match.any(-1)
        # first matching lane (at most one — keys are stored once)
        lane_idx = jnp.min(jnp.where(match, lane, W), axis=-1)
        slots = jnp.where(hit, b * W + lane_idx, slots)
        found = found | hit
        # a bucket with an empty slot ends the probe sequence (insert-order
        # invariant: earlier buckets fill first)
        done = done | hit | empty.any(-1)
        return i + 1, slots, found, done

    _, slots, found, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), slots0, found0, invalid))
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
    W = _window(cap)
    nb = cap // W
    bmask = np.int32(nb - 1)
    n = ukeys.shape[0]

    # no separate lookup pre-pass: the claim loop itself discovers matches
    # (round 0 resolves present keys), halving the probe gathers
    invalid = K.is_empty(ukeys)
    pending = ~invalid
    slots = jnp.full((n,), cap, jnp.int32)
    found = jnp.zeros((n,), jnp.bool_)

    home = _home_bucket(ukeys, nb)
    step = _bucket_step(ukeys, nb)
    rank = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, W), 1)

    def cond(carry):
        rounds, key_hi, key_lo, pending, off, slots, found = carry
        # each key probes at most max_probes buckets; contention within a
        # bucket retries the same offset, bounded by W extra rounds
        return pending.any() & (rounds < max_probes + W)

    def body(carry):
        rounds, key_hi, key_lo, pending, off, slots, found = carry
        b = (home + off * step) & bmask
        hw = key_hi.reshape(nb, W)[b]
        lw = key_lo.reshape(nb, W)[b]
        match = (hw == ukeys.hi[:, None]) & (lw == ukeys.lo[:, None])
        empty = (hw == K.EMPTY_HI) & (lw == K.EMPTY_LO)
        # a hit can only be a pre-existing key: keys are deduplicated, and a
        # claim resolves its key immediately, so nothing re-finds itself
        hit = match.any(-1) & pending
        lane_m = jnp.min(jnp.where(match, lane, W), axis=-1)
        slots = jnp.where(hit, b * W + lane_m, slots)
        found = found | hit
        pending = pending & ~hit

        # claim the first empty lane of the bucket
        has_empty = empty.any(-1)
        lane_e = jnp.min(jnp.where(empty, lane, W), axis=-1)
        want = pending & has_empty
        target = b * W + jnp.where(has_empty, lane_e, 0)
        claim_idx = jnp.where(want, target, cap)  # losers scatter OOB
        arb = jnp.full((cap + 1,), INT32_MAX, jnp.int32)
        arb = arb.at[claim_idx].min(rank, mode="drop")
        win = want & (arb[target] == rank)

        # winners target distinct slots (the arbitration guarantees it) and
        # losers index out of bounds -> dropped; unique_indices unlocks
        # XLA's parallel scatter (the serial fallback is ~50x slower on TPU)
        widx = jnp.where(win, target, cap)
        key_hi = key_hi.at[widx].set(ukeys.hi, mode="drop", unique_indices=True)
        key_lo = key_lo.at[widx].set(ukeys.lo, mode="drop", unique_indices=True)
        slots = jnp.where(win, target, slots)
        pending = pending & ~win
        # losers of a bucket with an empty lane retry the SAME bucket (the
        # lane may be taken, but the next empty lane is available next
        # round); keys whose bucket was full advance
        off = jnp.where(pending & ~has_empty, off + 1, off)
        # a key past the probe bound can neither match (stored keys live
        # within max_probes buckets of home) nor claim (a claim there would
        # be invisible to lookup's bounded probe): report overflow instead
        pending = pending & (off < max_probes)
        return rounds + 1, key_hi, key_lo, pending, off, slots, found

    _, key_hi, key_lo, pending, off, slots, found = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), table.key_hi, table.key_lo, pending,
         jnp.zeros((n,), jnp.int32), slots, found))

    created = (slots != cap) & ~found & ~invalid
    # failures = valid keys that neither matched nor claimed (whether they
    # ran out of rounds or were dropped at the probe bound above)
    n_failed = jnp.sum(~invalid & (slots == cap)).astype(jnp.int32)
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
    maps old slot -> new slot; dropped/empty slots map to ``new_capacity+1``
    (out of bounds even of the [new_cap+1] row stores, so a mode='drop'
    scatter skips them and the null row stays pristine):

        new_rows = jnp.zeros(...).at[old_to_new].set(old_rows, mode='drop')
    """
    cap = table.capacity
    new_cap = new_capacity or cap
    live = occupied_mask(table) & keep
    kkeys = K.where(live, table.stored_keys, K.empty_like((cap,)))
    fresh = create(new_cap)
    fresh, new_slots, _ = lookup_or_insert(fresh, kkeys, max_probes)
    old_to_new = jnp.where(live, new_slots, new_cap + 1)
    return fresh, old_to_new
