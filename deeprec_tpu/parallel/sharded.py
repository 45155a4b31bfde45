"""Row-sharded embedding tables with all-to-all ID exchange over ICI.

This module replaces the entire PS/worker communication layer of the
reference (SURVEY.md §2.4: gRPC rendezvous + FuseRecv fusion + seastar
"grpc++" + star_server pull/push + SOK's NCCL all2all,
contrib/star/**, sparse_operation_kit/**) with mesh collectives:

  * each device owns one **row shard** of every table (owner =
    hash(key) mod n_shards — the mod-sharding invariant the reference's
    checkpoint format also relies on, embedding_var.h:196-199);
  * a lookup is: local dedup -> bucket unique ids by owner ->
    ``lax.all_to_all`` (ids out) -> owner-side dedup + lookup-or-create ->
    gather rows -> ``all_to_all`` (rows back) -> unbucket -> pool;
  * the **gradient exchange comes from autodiff**: the differentiable
    surface is the owner-side gathered rows, and the rows-back all_to_all /
    unbucket gathers are linear, so JAX's transpose emits exactly the
    reverse all_to_all + scatter-add — the hand-written grad path of SOK's
    all2all_dense_embedding falls out of the functional formulation.

Everything here runs *inside* ``shard_map`` over a 1-D mesh axis: functions
see the per-device view (local batch shard, local table shard) and
communicate only via the named axis. Admission filters, eviction, freq and
version metadata run on the owner shard, so their counts are global —
exactly the PS-side semantics of the reference.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..feature_column import EmbeddingCollection
from ..ops.unique import UniqueResult, unique, unique_cols
from ..sparse import embedding_var as ev
from ..sparse import hashtable as ht
from ..sparse import keys as K


class ShardedAux(NamedTuple):
    """Routing + owner-side lookup state for one sharded exchange."""

    # requester side
    local_uniq: UniqueResult   # dedup of the local flat ids [N]
    owner: jax.Array           # [U] destination shard per local unique id
    pos: jax.Array             # [U] position within the send bucket
    routed: jax.Array          # [U] bool: made it into the bucket (no overflow)
    # owner side (this device as server)
    recv_keys: K.Keys          # [S*C] ids received (flattened buckets)
    recv_uniq: UniqueResult    # dedup of recv ids
    recv_aux: ev.LookupAux     # owner-side lookup aux over recv_uniq.ukeys
    n_dropped: jax.Array       # int32: local unique ids that overflowed buckets


OWNER_SEED = 13  # must match checkpoint/saver.OWNER_SEED (reshard routing)


def _owner_of(keys: K.Keys, num_shards: int) -> jax.Array:
    """Destination shard: hash-mod (decorrelated from the in-shard probe
    hash by the seed). EMPTY keys route to the drop bucket (= num_shards)."""
    h = K.hash32(keys, seed=OWNER_SEED)
    own = (h % np.uint32(num_shards)).astype(jnp.int32)
    return jnp.where(K.is_empty(keys), num_shards, own)


def _bucket_positions(owner: jax.Array) -> jax.Array:
    """Rank of each element among same-owner elements (its position within
    the send bucket). Computed in the sorted order via run-start cummax —
    NOT a duplicate-index scatter-min, which XLA serializes on TPU
    (~1µs/element; the one forbidden pattern of docs/Performance.md)."""
    U = owner.shape[0]
    iota = jnp.arange(U, dtype=jnp.int32)
    srt_owner, srt_idx = jax.lax.sort((owner, iota), num_keys=2)
    is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                srt_owner[1:] != srt_owner[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    # srt_idx is a permutation -> collision-free scatter
    return jnp.zeros((U,), jnp.int32).at[srt_idx].set(
        iota - run_start, unique_indices=True)


def exchange_lookup_or_create(
    coll: EmbeddingCollection,
    state: ev.EVState,
    flat_ids: K.Keys,
    step: jax.Array,
    axis: str,
    bucket_cap: int,
) -> Tuple[ev.EVState, ShardedAux]:
    """Per-device half of the sharded lookup (call inside shard_map).

    ``state`` is the LOCAL table shard; ``flat_ids`` the LOCAL flat id batch
    in collection layout. ``bucket_cap`` is the static per-destination
    bucket size; unique ids beyond it are dropped (counted in
    ``n_dropped``) — size it at ~2x the expected uniques/shard.
    """
    S = jax.lax.axis_size(axis)
    uniq = _dedup_local(coll, flat_ids)
    U = uniq.ukeys.shape[0]
    owner = _owner_of(uniq.ukeys, S)

    pos = _bucket_positions(owner)
    routed = (owner < S) & (pos < bucket_cap)
    # shape (1,): shardable across the mesh axis when returned from shard_map
    n_dropped = jnp.sum((owner < S) & (pos >= bucket_cap)).astype(jnp.int32)[None]

    # build send buckets [S, C]
    dest = jnp.where(routed, owner * bucket_cap + pos, S * bucket_cap)
    send = K.empty_like((S * bucket_cap,))
    send = K.Keys(
        send.hi.at[dest].set(uniq.ukeys.hi, mode="drop", unique_indices=True),
        send.lo.at[dest].set(uniq.ukeys.lo, mode="drop", unique_indices=True),
    )
    # all_to_all the id buckets (both planes)
    recv_hi = jax.lax.all_to_all(send.hi.reshape(S, bucket_cap), axis, 0, 0, tiled=False)
    recv_lo = jax.lax.all_to_all(send.lo.reshape(S, bucket_cap), axis, 0, 0, tiled=False)
    recv_keys = K.Keys(recv_hi.reshape(-1), recv_lo.reshape(-1))

    # when the table tracks frequencies, the per-requester multiplicities
    # ride a third all_to_all so the owner's freq/CBF bookkeeping counts id
    # OCCURRENCES (reference AddFreq(count) semantics), not requesting
    # devices; light-layout tables skip the plane entirely
    recv_uniq = unique(recv_keys, coll.config.max_unique)
    if coll.config.freq_tracked:
        send_counts = jnp.zeros((S * bucket_cap,), jnp.int32).at[dest].set(
            uniq.counts.astype(jnp.int32), mode="drop", unique_indices=True)
        recv_counts = jax.lax.all_to_all(
            send_counts.reshape(S, bucket_cap), axis, 0, 0,
            tiled=False).reshape(-1)
        freq_counts = jax.ops.segment_sum(
            recv_counts, recv_uniq.inverse, recv_uniq.ukeys.shape[0])
    else:
        freq_counts = recv_uniq.counts.astype(jnp.int32)

    # owner side: dedup (the same key may arrive from several requesters),
    # then the collection's lookup-or-create with filters/metadata
    # (variant collections hook in here — e.g. adaptive warm seeding).
    state, recv_aux = coll.sharded_owner_lookup(state, recv_uniq, step,
                                                freq_counts)

    return state, ShardedAux(
        local_uniq=uniq, owner=owner, pos=pos, routed=routed,
        recv_keys=recv_keys, recv_uniq=recv_uniq, recv_aux=recv_aux,
        n_dropped=n_dropped,
    )


def _dedup_local(coll, ids):
    """Requester-side dedup: the batched per-column sort when the
    collection layout allows it (ops.unique.unique_cols), else the flat
    sort. ``ids`` may be the [W, B_local] feature-major planes or already
    flat."""
    if len(ids.shape) == 2 and getattr(coll, "_column_dedup_ok", False):
        return unique_cols(ids, coll.config.max_unique)
    flat = ids.reshape(-1) if len(ids.shape) > 1 else ids
    return unique(flat, coll.config.max_unique)




def gather_owner_rows(state_values: jax.Array, aux: ShardedAux,
                      config=None) -> jax.Array:
    """Owner-side rows for every received bucket position: [S*C, dim].
    This is the DIFFERENTIABLE leaf of the sharded lookup. Pass ``config``
    so lazily-initialised created rows read their deterministic init."""
    if config is not None:
        urows = ev.gather(state_values, aux.recv_aux, config)
    else:
        urows = state_values[aux.recv_aux.slots]
    return urows[aux.recv_uniq.inverse]


def _wire(x: jax.Array, wire_dtype) -> Tuple[jax.Array, object]:
    """Cast ``x`` to the exchange wire dtype (config.exchange_dtype).
    The caller casts back right after the collective so ONLY the wire is
    narrow: every gather/scatter/sum stays in the table dtype, and the
    autodiff transpose (cast -> reverse all_to_all -> cast) compresses the
    gradient exchange the same single-rounding way."""
    if wire_dtype is None:
        return x, x.dtype
    wd = jnp.dtype(wire_dtype)
    if wd == x.dtype:
        return x, x.dtype
    return x.astype(wd), x.dtype


def rows_back(urows_owner: jax.Array, aux: ShardedAux, axis: str,
              bucket_cap: int, wire_dtype=None) -> Tuple[jax.Array, jax.Array]:
    """Second all_to_all: owners return rows; requesters unbucket.

    Returns (rows_flat [N, dim], valid_flat [N]) in local flat-id layout.
    Linear in ``urows_owner`` -> autodiff emits the reverse exchange
    (in ``wire_dtype`` when set — see config.exchange_dtype).
    """
    S = jax.lax.axis_size(axis)
    d = urows_owner.shape[-1]
    send, out_dtype = _wire(urows_owner, wire_dtype)
    back = jax.lax.all_to_all(
        send.reshape(S, bucket_cap, d), axis, 0, 0,
        tiled=False).astype(out_dtype)
    # local unique id i fetches back[owner[i], pos[i]]
    u_idx = jnp.where(aux.routed, aux.owner * bucket_cap + aux.pos, 0)
    row_u = back.reshape(S * bucket_cap, d)[u_idx]
    row_u = jnp.where(aux.routed[:, None], row_u, 0.0)
    rows_flat = row_u[aux.local_uniq.inverse]
    valid_u = aux.routed & ~K.is_empty(aux.local_uniq.ukeys)
    valid_flat = valid_u[aux.local_uniq.inverse]
    return rows_flat, valid_flat


def apply_gradients_sharded(
    coll: EmbeddingCollection,
    state: ev.EVState,
    opt,
    slot_state,
    aux: ShardedAux,
    d_urows_owner: jax.Array,
    step: jax.Array,
):
    """Owner-side sparse apply: cotangents arrive per received bucket
    position (duplicates across requesters already summed per-position by
    the autodiff transpose); segment-sum them onto the owner's unique ids
    and apply."""
    n = aux.recv_uniq.ukeys.shape[0]
    grads_u = jax.ops.segment_sum(d_urows_owner, aux.recv_uniq.inverse, n)
    a = aux.recv_aux
    cur = ev.gather(state.values, a, coll.config)  # lazy-init effective rows
    values, slot_state = opt.apply(state.values, slot_state, a.slots,
                                   grads_u, a.admitted, step, cur_rows=cur,
                                   created=a.created)
    return state._replace(values=values), slot_state


def _sort_by(key: jax.Array, *payloads):
    out = jax.lax.sort((key,) + payloads, num_keys=1)
    return out[0], out[1:]


def exchange_lookup_readonly(
    coll: EmbeddingCollection,
    state: ev.EVState,
    flat_ids: K.Keys,
    axis: str,
    bucket_cap: int,
    wire_dtype=None,
) -> Tuple[jax.Array, jax.Array]:
    """Eval-path exchange: no insertion/metadata mutation; unknown keys read
    their deterministic would-be init row. Returns (rows_flat, valid_flat)
    in local flat layout."""
    S = jax.lax.axis_size(axis)
    uniq = _dedup_local(coll, flat_ids)
    U = uniq.ukeys.shape[0]
    owner = _owner_of(uniq.ukeys, S)
    pos = _bucket_positions(owner)
    routed = (owner < S) & (pos < bucket_cap)

    dest = jnp.where(routed, owner * bucket_cap + pos, S * bucket_cap)
    send = K.empty_like((S * bucket_cap,))
    send = K.Keys(
        send.hi.at[dest].set(uniq.ukeys.hi, mode="drop", unique_indices=True),
        send.lo.at[dest].set(uniq.ukeys.lo, mode="drop", unique_indices=True),
    )
    recv_hi = jax.lax.all_to_all(send.hi.reshape(S, bucket_cap), axis, 0, 0)
    recv_lo = jax.lax.all_to_all(send.lo.reshape(S, bucket_cap), axis, 0, 0)
    recv_keys = K.Keys(recv_hi.reshape(-1), recv_lo.reshape(-1))

    slots, found = ht.lookup(coll.table_index(state), recv_keys,
                             coll.config.max_probes)
    rows_r = coll.owner_readonly_rows(state, slots, found, recv_keys)

    d = rows_r.shape[-1]
    send_r, out_dtype = _wire(rows_r, wire_dtype)
    back = jax.lax.all_to_all(
        send_r.reshape(S, bucket_cap, d), axis, 0, 0).astype(out_dtype)
    u_idx = jnp.where(routed, owner * bucket_cap + pos, 0)
    row_u = back.reshape(S * bucket_cap, d)[u_idx]
    row_u = jnp.where(routed[:, None], row_u, 0.0)
    rows_flat = row_u[uniq.inverse]
    valid_u = routed & ~K.is_empty(uniq.ukeys)
    return rows_flat, valid_u[uniq.inverse]
