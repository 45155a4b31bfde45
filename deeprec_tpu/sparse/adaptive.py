"""Adaptive embedding: static hash-bucket table + dynamic EV, ids routed
by admission.

TPU-native rebuild of DeepRec's adaptive embedding
(reference: ``categorical_column_with_adaptive_embedding``
feature_column_v2.py:2051 and ``adaptive_embedding_lookup_sparse``
embedding_ops.py:678-795 — ids are dynamic_partition'ed between a static
hash-bucket Variable and an EmbeddingVariable by a mask).

Here the mask *is* the admission filter the EV already tracks: keys that
pass the frequency filter own an exact EV row; keys that have not (the
long tail) read/train a **shared** row in a small static ``[buckets, dim]``
table addressed by hash — collisions are acceptable for cold features and
memory stays bounded. As a key crosses the admission threshold it migrates
from the shared bucket to its own EV row seamlessly (its next lookup is
admitted; its EV row initialises from the static bucket row so learned
signal carries over — the reference's transition intent).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EmbeddingVariableConfig
from ..ops.unique import unique_int32
from . import embedding_var as ev
from . import keys as K


class AdaptiveState(NamedTuple):
    ev: ev.EVState
    static: jax.Array   # [buckets+1, dim]; last row = null


def create(config: EmbeddingVariableConfig, buckets: int,
           rng: jax.Array | None = None) -> AdaptiveState:
    if config.counter_filter is None and config.cbf_filter is None:
        raise ValueError("adaptive embedding needs an admission filter "
                         "(CounterFilter/CBFFilter) to define hot vs tail")
    rng = rng if rng is not None else jax.random.key(7)
    static = jax.random.normal(rng, (buckets + 1, config.embedding_dim),
                               jnp.float32) * config.initializer.scale
    static = static.at[buckets].set(0.0)
    return AdaptiveState(ev=ev.create(config), static=static)


def bucket_of(keys: K.Keys, buckets: int) -> jax.Array:
    h = K.hash32(keys, seed=29)
    b = (h % np.uint32(buckets)).astype(jnp.int32)
    return jnp.where(K.is_empty(keys), buckets, b)


def lookup_or_create(state: AdaptiveState, config: EmbeddingVariableConfig,
                     ids: K.Keys, step: jax.Array):
    """EV lookup with admission; a key crossing the admission threshold
    THIS step seeds its EV row from its static bucket row — the warm
    migration carries the signal learned in the shared bucket during the
    filtering period over to the dedicated row."""
    ev_state, aux = ev.lookup_or_create(state.ev, config, ids, step)
    buckets = state.static.shape[0] - 1
    b = bucket_of(aux.uniq.ukeys, buckets)
    if config.counter_filter is not None:
        thr = config.counter_filter.filter_freq
        prev_freq = ev_state.freqs[aux.slots] - aux.uniq.counts
        newly_admitted = aux.admitted & (prev_freq < thr)
    else:
        # CBF gating: slot allocation IS admission — seed at creation
        newly_admitted = aux.created
    dest = jnp.where(newly_admitted, aux.slots, config.capacity + 1)
    seeded = ev_state.values.at[dest].set(
        state.static[b].astype(ev_state.values.dtype), mode="drop",
        unique_indices=True)
    return AdaptiveState(ev=ev_state._replace(values=seeded),
                         static=state.static), aux


def gather(state: AdaptiveState, config: EmbeddingVariableConfig,
           aux: ev.LookupAux) -> jax.Array:
    """[n_unique, dim]: admitted keys read their EV row, tail keys the
    shared static bucket. Differentiable in both tables."""
    return gather_from(state.ev.values, state.static, config, aux)


def gather_from(values: jax.Array, static: jax.Array,
                config: EmbeddingVariableConfig, aux: ev.LookupAux) -> jax.Array:
    buckets = static.shape[0] - 1
    b = bucket_of(aux.uniq.ukeys, buckets)
    ev_rows = values[aux.slots]
    st_rows = static[b].astype(ev_rows.dtype)
    return jnp.where(aux.admitted[:, None], ev_rows, st_rows)


def apply_gradients(state: AdaptiveState, config: EmbeddingVariableConfig,
                    opt, slot_state, static_opt, static_slot,
                    aux: ev.LookupAux, grads_u: jax.Array, step: jax.Array):
    """Split the unique-row cotangent by route: admitted -> EV sparse apply;
    tail -> dedup hashed buckets, segment-sum, sparse apply on the static
    table (collided tail keys legitimately share their update)."""
    values, slot_state = opt.apply(state.ev.values, slot_state, aux.slots,
                                   grads_u, aux.admitted, step)

    buckets = state.static.shape[0] - 1
    tail = ~aux.admitted & ~K.is_empty(aux.uniq.ukeys)
    b = jnp.where(tail, bucket_of(aux.uniq.ukeys, buckets), buckets)
    ub, inv, _ = unique_int32(b)
    gb = jax.ops.segment_sum(jnp.where(tail[:, None], grads_u, 0.0),
                             inv, ub.shape[0])
    mask = ub < buckets
    static, static_slot = static_opt.apply(
        state.static, static_slot, jnp.where(mask, ub, buckets), gb, mask, step)
    return AdaptiveState(ev=state.ev._replace(values=values), static=static), \
        slot_state, static_slot
