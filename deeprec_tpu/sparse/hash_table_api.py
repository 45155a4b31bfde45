"""HashTable / TensibleVariable: the reference's second KV stack.

TPU-native rebuild of the PAI hash-table system (reference:
tensorflow/core/framework/hash_table/hash_table.h:42 ``HashTable`` —
int64 key -> dense id allocator; tensible_variable.h:29
``TensibleVariable`` — growable segmented row tensor; admission
strategies incl. bloom_filter_strategy.h; python/ops/hash_table/
hash_table.py:142 and DistributedHashTable:388; ops/hash_ops.cc:52-391).

Semantic difference from EmbeddingVariable: HashTable *allocates dense
ids* (0, 1, 2, ...) for keys, and any number of TensibleVariables are
indexed by those ids — several tensors share one key space. Here:

  * :class:`IdAllocator` wraps the device hash table and assigns dense
    ids in admission order (a monotone counter), not probe slots — the
    id -> slot indirection lives in one extra int32 plane.
  * :class:`Tensible` is a fixed-capacity row store indexed by dense id
    (growth = double + copy, like TensibleVariable's segment append).
  * admission strategies compose exactly like EV filters (a CBF gate on
    id allocation = BloomFilterAdmitStrategy).

The sharded variant (DistributedHashTable) is the same row-sharded
exchange as the EV engine — ids are only meaningful per shard, matching
the reference's per-partition id spaces.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CBFFilter
from ..ops.unique import unique
from . import embedding_var as ev_mod
from . import hashtable as ht
from . import keys as K


class HashTableState(NamedTuple):
    index: ht.HashTable      # key -> probe slot
    ids: jax.Array           # [capacity] int32: dense id per slot (-1 empty)
    next_id: jax.Array       # int32 scalar: ids handed out so far
    cbf: Optional[jax.Array]  # admission counters or None


def create(capacity: int, admit: Optional[CBFFilter] = None) -> HashTableState:
    cbf = None
    if admit is not None:
        cbf = jnp.zeros((admit.num_counters(),), jnp.int32)
    return HashTableState(
        index=ht.create(capacity),
        ids=jnp.full((capacity,), -1, jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
        cbf=cbf,
    )


def gen_ids_unique(
    state: HashTableState,
    ukeys: K.Keys,
    counts: jax.Array,
    admit: Optional[CBFFilter] = None,
    max_probes: int = 32,
) -> Tuple[HashTableState, jax.Array, jax.Array]:
    """Id allocation over ALREADY-UNIQUE keys (the gen_ids core,
    reference hash_table.py:472 DistributedHashTable.gen_ids per
    partition). Returns (state, uids [U], created [U]); non-admitted /
    padding keys get id -1."""
    cap = state.index.capacity
    cbf = state.cbf
    gated = ukeys
    if admit is not None and cbf is not None:
        # admission counts within-batch MULTIPLICITY (the framework-wide
        # filter semantic matching the reference's AddFreq(count); see
        # embedding_var.lookup_or_create_unique). Sharded callers pass the
        # summed per-requester multiplicities as ``counts``.
        inc = counts.astype(jnp.int32)
        cbf, est = ev_mod._cbf_bump_and_estimate(cbf, admit, ukeys, inc)
        gated = K.where(est >= admit.filter_freq, ukeys,
                        K.empty_like(ukeys.shape))

    index, slots, created = ht.lookup_or_insert(state.index, gated, max_probes)
    # assign ids to created slots in rank order (deterministic allocation)
    order = jnp.cumsum(created.astype(jnp.int32)) - 1
    new_ids = jnp.where(created, state.next_id + order, 0)
    dest = jnp.where(created, slots, cap + 1)
    ids_plane = state.ids.at[dest].set(new_ids, mode="drop", unique_indices=True)
    n_created = jnp.sum(created.astype(jnp.int32))

    uids = jnp.where(slots < cap, ids_plane[jnp.minimum(slots, cap - 1)], -1)
    uids = jnp.where(K.is_empty(ukeys), -1, uids)
    new_state = HashTableState(index=index, ids=ids_plane,
                               next_id=state.next_id + n_created, cbf=cbf)
    return new_state, uids, created


def lookup_or_create(
    state: HashTableState,
    keys: K.Keys,
    admit: Optional[CBFFilter] = None,
    max_probes: int = 32,
    max_unique: int | None = None,
) -> Tuple[HashTableState, jax.Array]:
    """Dense ids for a batch of keys (HashTableLookupOp with admission,
    reference ops/hash_ops.cc HashTableOp/HashTableLookupOp). New keys get
    fresh ids in allocation order; non-admitted/padding keys get id -1.
    Returns (state, ids [n])."""
    uniq = unique(keys, max_unique)
    state, uids, _created = gen_ids_unique(state, uniq.ukeys, uniq.counts,
                                           admit, max_probes)
    out = uids[uniq.inverse]
    return state, jnp.where(K.is_empty(keys), -1, out)


def reinsert(state: HashTableState, keys: K.Keys, max_probes: int = 32):
    """Restore-time re-insertion into a FRESH state (the
    HashTableDirectRestoreOp semantics, ops/hash_ops.cc:353-391): keys go
    into the index, dense ids re-allocate COMPACTED in scan order — a
    probe-overflowed key must not leave a gap, or ``next_id`` (= count of
    live) would re-allocate an id already owned by a restored key.
    Returns ``(index, ids_plane, next_id, live, new_ids)``; callers
    scatter their rows at ``jnp.where(live, new_ids, cap + 1)``."""
    cap = state.ids.shape[0]
    index, slots, _ = ht.lookup_or_insert(state.index, keys, max_probes)
    live = ~K.is_empty(keys) & (slots != cap)
    new_ids = jnp.where(live, jnp.cumsum(live.astype(jnp.int32)) - 1, -1)
    dest = jnp.where(live, slots, cap + 1)
    ids_plane = state.ids.at[dest].set(new_ids, mode="drop",
                                       unique_indices=True)
    return index, ids_plane, jnp.sum(live.astype(jnp.int32)), live, new_ids


def lookup(state: HashTableState, keys: K.Keys, max_probes: int = 32
           ) -> jax.Array:
    """Read-only id lookup; unknown keys -> -1."""
    cap = state.index.capacity
    slots, found = ht.lookup(state.index, keys, max_probes)
    ids = jnp.where(found, state.ids[jnp.minimum(slots, cap - 1)], -1)
    return ids


def size(state: HashTableState) -> jax.Array:
    return state.next_id


# ---------------------------------------------------------------------------
# TensibleVariable: rows indexed by dense id.


class Tensible(NamedTuple):
    """Growable row store (reference TensibleVariable, segments collapsed
    into one array + the null row at index ``capacity``)."""

    rows: jax.Array  # [capacity+1, ...]

    @property
    def capacity(self) -> int:
        return self.rows.shape[0] - 1


def tensible(capacity: int, shape: Tuple[int, ...], dtype=jnp.float32,
             init=0.0) -> Tensible:
    return Tensible(rows=jnp.full((capacity + 1,) + tuple(shape), init, dtype))


def gather(t: Tensible, ids: jax.Array) -> jax.Array:
    """TensibleVariableGather: id -1 (or out of range) reads the null row."""
    idx = jnp.where((ids >= 0) & (ids < t.capacity), ids, t.capacity)
    return t.rows[idx]


def scatter(t: Tensible, ids: jax.Array, rows: jax.Array,
            ids_unique: bool = True) -> Tensible:
    """TensibleVariableScatter: id -1 rows are dropped."""
    idx = jnp.where((ids >= 0) & (ids < t.capacity), ids, t.capacity + 1)
    return Tensible(rows=t.rows.at[idx].set(
        rows.astype(t.rows.dtype), mode="drop", unique_indices=ids_unique))


def grow(t: Tensible, new_capacity: int, init=0.0) -> Tensible:
    """Segment-append growth (ids are stable, so growth is a plain copy)."""
    fresh = jnp.full((new_capacity + 1,) + t.rows.shape[1:], init, t.rows.dtype)
    return Tensible(rows=fresh.at[: t.capacity].set(t.rows[:-1]))


def apply_sparse(t: Tensible, opt, slot_state, ids: jax.Array,
                 grads: jax.Array, step) -> Tuple[Tensible, object]:
    """TensibleVariableApply* (reference ops/hash_training_ops.cc:90-227):
    the shared sparse optimizers update rows by dense id. ``ids`` must be
    deduplicated (gradients pre-summed), id -1 masked out."""
    mask = (ids >= 0) & (ids < t.capacity)
    slots = jnp.where(mask, ids, t.capacity)
    rows, slot_state = opt.apply(t.rows, slot_state, slots, grads, mask, step)
    return Tensible(rows=rows), slot_state
