"""EmbeddingVariable: dynamic hash-keyed embedding table on TPU.

TPU-native rebuild of DeepRec's ``EmbeddingVar`` resource (reference:
tensorflow/core/framework/embedding/embedding_var.h:51 — LookupOrCreateKey,
LookupOrCreateEmb, Shrink, GetSnapshot/Import) and its kernels
(tensorflow/core/kernels/kv_variable_ops.cc: KvResourceGatherOp:315,
KvResourceExportOp:787, KvResourceImportV2Op:549).

Design (functional, jit-first):
  * state is a pytree (:class:`EVState`): a :mod:`hashtable` index plus flat
    row stores ``values[capacity+1, dim]``, ``freqs``/``versions`` metadata
    (the ValuePtr NormalContiguous layout of value_ptr.h:141 collapses into
    parallel arrays — structs-of-arrays is the vector-unit-friendly layout).
  * the extra row ``capacity`` is the shared null row (zeros) for padding /
    overflow, so gathers never branch.
  * ``lookup_or_create`` performs dedup -> admission-gated insert -> init of
    created rows -> freq/version bookkeeping. It is *not* differentiated;
    the differentiable surface is :func:`gather` on ``state.values``.
  * eviction (``shrink``) runs at checkpoint time exactly like the
    reference (embedding_var.h:264-313) and returns a slot permutation the
    optimizer applies to its slot-variable row stores (slots share row
    lifetime with the primary, reference slot_creator.py:82-115).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (CBFFilter, CounterFilter, EmbeddingVariableConfig,
                      GlobalStepEvict, Initializer, L2WeightEvict)
from ..ops.unique import UniqueResult, unique
from ..ops import segment
from . import hashtable as ht
from . import keys as K


class EVState(NamedTuple):
    index: ht.HashTable
    values: jax.Array        # [capacity+1, dim] float
    freqs: jax.Array         # [capacity+1] int32 — lookup counter (admission + stats)
    versions: jax.Array      # [capacity+1] int32 — global step of last touch
    create_steps: jax.Array  # [capacity+1] int32 — global step of row creation
    cbf: Optional[jax.Array]  # [m] int32 counting-bloom counters, or None

    @property
    def capacity(self) -> int:
        return self.values.shape[0] - 1

    @property
    def dim(self) -> int:
        return self.values.shape[1]


class LookupAux(NamedTuple):
    """Everything the backward/apply path needs about one lookup."""

    uniq: UniqueResult       # dedup of the flat id batch
    slots: jax.Array         # [n] int32 slot per unique key (capacity = null)
    admitted: jax.Array      # [n] bool per unique key
    created: jax.Array       # [n] bool per unique key


def create(config: EmbeddingVariableConfig) -> EVState:
    cap = config.capacity
    dim = config.embedding_dim + config.fused_slot_columns
    dtype = jnp.dtype(config.value_dtype)
    cbf = None
    if config.cbf_filter is not None:
        cbf = jnp.zeros((config.cbf_filter.num_counters(),), jnp.int32)
    return EVState(
        index=ht.create(cap),
        values=jnp.zeros((cap + 1, dim), dtype),
        freqs=jnp.zeros((cap + 1,), jnp.int32),
        versions=jnp.full((cap + 1,), -1, jnp.int32),
        create_steps=jnp.full((cap + 1,), -1, jnp.int32),
        cbf=cbf,
    )


# ---------------------------------------------------------------------------
# Row initialisation (key-deterministic).

def init_rows(config: EmbeddingVariableConfig, ukeys: K.Keys) -> jax.Array:
    """Initial value for each key's row: [n, dim]. Deterministic in the key
    (the EV default-value semantics: the same id always initialises to the
    same vector, docs/Embedding-Variable.md default_value_dim)."""
    ini = config.initializer
    n = ukeys.shape[0]
    dim = config.embedding_dim
    dtype = jnp.dtype(config.value_dtype)
    if ini.kind == "zeros":
        return jnp.zeros((n, dim), dtype)
    if ini.kind == "constant":
        return jnp.full((n, dim), ini.constant, dtype)
    bits = K.random_uniform_bits(ukeys, jnp.int32(ini.seed), dim)
    u01 = (bits >> np.uint32(8)).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
    if ini.kind == "uniform":
        return ((u01 * 2.0 - 1.0) * ini.scale).astype(dtype)
    # normal / truncated_normal via Box-Muller on paired uniforms.
    bits2 = K.random_uniform_bits(ukeys, jnp.int32(ini.seed + 0x5BD1), dim)
    v01 = (bits2 >> np.uint32(8)).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u01, 1e-12)))
    z = r * jnp.cos(2.0 * np.pi * v01)
    if ini.kind == "truncated_normal":
        z = jnp.clip(z, -2.0, 2.0)
    elif ini.kind != "normal":
        raise ValueError(f"unknown initializer {ini.kind!r}")
    return (z * ini.scale).astype(dtype)


# ---------------------------------------------------------------------------
# Counting-bloom admission.

def _cbf_positions(cbf: CBFFilter, ukeys: K.Keys) -> jax.Array:
    m = np.uint32(cbf.num_counters() - 1)  # power of two
    cols = []
    for h in range(cbf.num_hashes):
        cols.append((K.hash32(ukeys, seed=h + 1) & m).astype(jnp.int32))
    return jnp.stack(cols, axis=-1)  # [n, num_hashes]


def _cbf_bump_and_estimate(
    counters: jax.Array, cbf: CBFFilter, ukeys: K.Keys, counts: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Add ``counts`` to each key's CBF cells; return (counters, estimate)
    where estimate is the post-bump min-count (conservative count-min)."""
    pos = _cbf_positions(cbf, ukeys)  # [n, H]
    valid = ~K.is_empty(ukeys)
    add = jnp.where(valid, counts, 0)
    flat = pos.reshape(-1)
    inc = jnp.repeat(add, cbf.num_hashes)
    counters = counters.at[flat].add(inc)
    est = jnp.min(counters[pos], axis=-1)
    return counters, jnp.where(valid, est, 0)


# ---------------------------------------------------------------------------
# The main entry: lookup-or-create on a flat id batch.

def lookup_or_create(
    state: EVState,
    config: EmbeddingVariableConfig,
    ids: K.Keys,
    global_step: jax.Array,
) -> Tuple[EVState, LookupAux]:
    """Dedup ``ids``, admit/insert keys, initialise fresh rows, bump
    freq/version. Returns the new state and the aux needed by
    :func:`gather` / the sparse optimizer.

    Mirrors KvResourceGatherOp (kv_variable_ops.cc:315-362) +
    EmbeddingFilter::LookupOrCreate (embedding_filter.h:56-88), expressed as
    batched vector ops instead of a per-key sharded loop.
    """
    return lookup_or_create_unique(state, config,
                                   unique(ids, config.max_unique), global_step)


def lookup_or_create_unique(
    state: EVState,
    config: EmbeddingVariableConfig,
    uniq,
    global_step: jax.Array,
    freq_counts: Optional[jax.Array] = None,
) -> Tuple[EVState, LookupAux]:
    """Core of :func:`lookup_or_create` over an already-deduplicated
    UniqueResult (callers that dedup themselves — e.g. the sharded exchange
    owner side — skip the second sort).

    ``freq_counts``: optional [n] override of the per-unique-key frequency
    increment. The sharded exchange owner passes the summed per-requester
    multiplicities here (its own dedup's counts would count requesting
    *devices*, not id occurrences).
    """
    cap = state.capacity
    ukeys, counts = uniq.ukeys, uniq.counts
    gs = jnp.asarray(global_step, jnp.int32)

    # Frequency counts within-batch MULTIPLICITY — reference parity: with a
    # filter configured, embedding_lookup_sparse uses unique_with_counts
    # (embedding_ops.py:592-596) and KvResourceGather passes each key's
    # count into CounterFilter::LookupOrCreate -> AddFreq(count)
    # (kv_variable_ops.cc:435-441, embedding_filter.h:307-317): an id seen
    # N times in one batch advances its admission counter by N. The sharded
    # owner receives the per-requester counts over the exchange
    # (``freq_counts``), so local and mesh trainers admit identically.
    freq_inc = (counts if freq_counts is None else freq_counts).astype(jnp.int32)

    cbf_counters = state.cbf
    if config.cbf_filter is not None:
        # Bloom-gated insertion: keys below the admission count never claim
        # a table slot — their counts live in the CBF only.
        cbf_counters, est = _cbf_bump_and_estimate(
            cbf_counters, config.cbf_filter, ukeys, freq_inc)
        insertable = est >= config.cbf_filter.filter_freq
        gated = K.where(insertable, ukeys, K.empty_like(ukeys.shape))
    else:
        gated = ukeys

    index, slots, created = ht.lookup_or_insert(state.index, gated, config.max_probes)

    # Created rows: filtered tables materialise the init rows eagerly (a
    # non-admitted key must keep serving its frozen init across steps).
    # Filter-less tables defer initialisation to :func:`gather` — created
    # rows are admitted and written by the optimizer within the same step,
    # so the [U -> capacity] row scatter here would be pure waste (it was
    # ~15% of the train step). All scatter destinations below are unique:
    # live unique keys own distinct slots, everything else routes to cap+1
    # (out of bounds -> dropped); unique_indices=True selects XLA's
    # parallel scatter path.
    dest = jnp.where(created, slots, cap + 1)
    values = state.values
    if config.filter_freq > 0 or not config.lazy_init:
        rows0 = init_rows(config, ukeys)
        if config.fused_slot_columns:
            pad = jnp.full((rows0.shape[0], config.fused_slot_columns),
                           config.fused_slot_init, rows0.dtype)
            rows0 = jnp.concatenate([rows0, pad], axis=-1)
        values = values.at[dest].set(rows0.astype(values.dtype),
                                     mode="drop", unique_indices=True)

    # Metadata scatters are gated per the reference's layout selection
    # ("light" ValuePtr without freq/version cells when no filter and no
    # eviction, kv_variable_ops.py:282-285): each 1-column scatter costs
    # real step time (~0.6ms each at U=17k on v5e) and a table that never
    # reads the metadata should not pay for writing it.
    live = (counts > 0) & (slots != cap)
    mdest = jnp.where(live, slots, cap + 1)
    if config.version_tracked:
        create_steps = state.create_steps.at[dest].set(
            gs, mode="drop", unique_indices=True)
        versions = state.versions.at[mdest].set(gs, mode="drop",
                                                unique_indices=True)
        versions = versions.at[cap].set(-1)
        create_steps = create_steps.at[cap].set(-1)
    else:
        create_steps = state.create_steps
        versions = state.versions
    if config.freq_tracked:
        freqs = state.freqs.at[mdest].add(freq_inc, mode="drop",
                                          unique_indices=True)
        # keep the null row pristine (values never scatter to it:
        # destinations are either live slots or out-of-bounds)
        freqs = freqs.at[cap].set(0)
    else:
        freqs = state.freqs

    if config.cbf_filter is not None:
        admitted = (slots != cap)
    elif config.counter_filter is not None:
        admitted = (slots != cap) & (freqs[slots] >= config.counter_filter.filter_freq)
    else:
        admitted = slots != cap

    new_state = EVState(index=index, values=values, freqs=freqs,
                        versions=versions, create_steps=create_steps, cbf=cbf_counters)
    return new_state, LookupAux(uniq=uniq, slots=slots, admitted=admitted, created=created)


# ---------------------------------------------------------------------------
# Differentiable surface.

def gather(values: jax.Array, aux: LookupAux, config: EmbeddingVariableConfig) -> jax.Array:
    """Embedding rows for the *unique* keys: [n, dim].

    Non-admitted keys read their (frozen) initial row — numerically equal to
    DeepRec's "return default value until admitted" because rows are
    initialised deterministically and never updated while filtered
    (training_ali_ops.cc:124-133 is_filter branch skips the update).
    Filter-less tables use lazy initialisation: rows created this step read
    their init here (the store still holds zeros) and the optimizer's
    write-back persists init+update in one scatter. Differentiate w.r.t.
    ``values`` gathered rows only: callers take grads of the [n, dim]
    output, keeping the cotangent sparse.
    """
    rows = values[aux.slots]
    if config.fused_slot_columns:
        rows = rows[:, : config.embedding_dim]
    if config.filter_freq > 0 or not config.lazy_init:
        return rows
    # additive (not select) so gradients still flow to created rows: a
    # created slot holds exact zeros (stores are zero-filled and slots are
    # only vacated by rebuilds, which zero-fill), hence rows+init == init
    init = init_rows(config, aux.uniq.ukeys).astype(rows.dtype)
    return rows + jnp.where(aux.created[:, None], init, 0.0)


def lookup_dense(
    state: EVState,
    config: EmbeddingVariableConfig,
    aux: LookupAux,
    batch_shape: Tuple[int, ...],
) -> jax.Array:
    """[batch..., dim] embeddings for the original (pre-dedup) id layout."""
    rows = gather(state.values, aux, config)
    return rows[aux.uniq.inverse].reshape(*batch_shape, config.embedding_dim)


def pooled_lookup(
    values: jax.Array,
    aux: LookupAux,
    config: EmbeddingVariableConfig,
    sample_ids: jax.Array,
    num_samples: int,
    weights: jax.Array | None = None,
    combiner: str | None = None,
) -> jax.Array:
    """embedding_lookup_sparse equivalent (reference embedding_ops.py:480):
    unique -> gather -> segment combine. ``sample_ids[i]`` is the example
    row of flat id ``i``; padding ids contribute zero rows (null row)."""
    rows = gather(values, aux, config)[aux.uniq.inverse]
    return segment.segment_combine(
        rows, sample_ids, num_samples, combiner or config.combiner, weights
    )


# ---------------------------------------------------------------------------
# Eviction / growth / snapshot.

def shrink(
    state: EVState,
    config: EmbeddingVariableConfig,
    global_step: jax.Array,
    new_capacity: int | None = None,
    keep_mask: jax.Array | None = None,
) -> Tuple[EVState, jax.Array]:
    """Apply the eviction policy and rebuild the index (checkpoint-time
    Shrink, embedding_var.h:264-313). Returns (state, old_to_new) — apply
    ``old_to_new`` to optimizer slot rows via :func:`permute_rows`.

    ``keep_mask`` ([capacity] bool) REPLACES the policy predicate when
    given — the caller decided which rows stay (e.g. the tiered trainers'
    combined policy+HBM-budget cold selection, which must match the rows
    they exported to the host tier)."""
    cap = state.capacity
    occ = ht.occupied_mask(state.index)
    keep = occ
    gs = jnp.asarray(global_step, jnp.int32)
    if keep_mask is not None:
        keep = keep & keep_mask
    else:
        pol = config.evict
        if isinstance(pol, GlobalStepEvict) and pol.steps_to_live > 0:
            keep = keep & (gs - state.versions[:cap] < pol.steps_to_live)
        elif isinstance(pol, L2WeightEvict) and pol.l2_weight_threshold > 0:
            vals = state.values[:cap, : config.embedding_dim]
            norms = jnp.sum(vals * vals, axis=-1)
            keep = keep & (norms >= pol.l2_weight_threshold)
    new_cap = new_capacity or cap
    new_index, old_to_new = ht.rebuild(state.index, keep, new_cap, config.max_probes)
    new_state = EVState(
        index=new_index,
        values=permute_rows(state.values, old_to_new, new_cap),
        freqs=permute_rows(state.freqs, old_to_new, new_cap),
        versions=permute_rows(state.versions, old_to_new, new_cap, fill=-1),
        create_steps=permute_rows(state.create_steps, old_to_new, new_cap, fill=-1),
        cbf=state.cbf,
    )
    return new_state, old_to_new


def permute_rows(rows: jax.Array, old_to_new: jax.Array, new_cap: int, fill=0) -> jax.Array:
    """Move per-slot rows through a rebuild permutation. ``rows`` is
    [old_cap+1, ...]; result is [new_cap+1, ...]. Dropped slots map to
    new_cap+1 in ``old_to_new`` (see hashtable.rebuild) so the scatter is
    collision-free."""
    out = jnp.full((new_cap + 1,) + rows.shape[1:], fill, rows.dtype)
    return out.at[old_to_new].set(rows[:-1], mode="drop", unique_indices=True)


def grow(state: EVState, config: EmbeddingVariableConfig, new_capacity: int) -> Tuple[EVState, jax.Array]:
    """Double (or more) the capacity; host-triggered between steps when
    ``load_factor`` crosses ~0.7 (the DenseHashMap growth analog)."""
    keep = jnp.ones((state.capacity,), jnp.bool_)
    st = state._replace()
    new_index, old_to_new = ht.rebuild(st.index, keep, new_capacity, config.max_probes)
    return EVState(
        index=new_index,
        values=permute_rows(st.values, old_to_new, new_capacity),
        freqs=permute_rows(st.freqs, old_to_new, new_capacity),
        versions=permute_rows(st.versions, old_to_new, new_capacity, fill=-1),
        create_steps=permute_rows(st.create_steps, old_to_new, new_capacity, fill=-1),
        cbf=st.cbf,
    ), old_to_new


def load_factor(state: EVState) -> jax.Array:
    # size has shape (n_shards_stacked,); sum gives global count
    return state.index.size.sum().astype(jnp.float32) / state.capacity


def pooled_lookup_multi_dim(
    values: jax.Array,
    aux: LookupAux,
    config: EmbeddingVariableConfig,
    batch_shape: Tuple[int, ...],
    combiners: Tuple[str, ...],
    weights: jax.Array | None = None,
) -> jax.Array:
    """Multi-dimension sparse pooling (reference
    embedding_ops.py:928 ``embedding_lookup_sparse_multi_dim`` /
    :1348 ``safe_embedding_lookup_multi_dim``): ids laid out as
    ``[B, L1, ..., Lk]`` (EMPTY-padded) pool innermost-first with one
    combiner per sparse dimension, e.g. a user's sessions x clicks
    pooling clicks within a session then sessions within the user.

    ``aux`` comes from :func:`lookup_or_create` over the flattened ids in
    the same layout; padding contributes nothing (and mean/sqrtn
    denominators count only valid entries at every level).
    """
    if len(combiners) != len(batch_shape) - 1:
        raise ValueError("one combiner per sparse dimension")
    rows = gather(values, aux, config)[aux.uniq.inverse]
    rows = rows.reshape(*batch_shape, config.embedding_dim)
    valid = (aux.slots != config.capacity)[aux.uniq.inverse]
    valid = valid.reshape(*batch_shape).astype(rows.dtype)
    if weights is not None:
        rows = rows * weights.reshape(*batch_shape)[..., None]
    rows = rows * valid[..., None]
    for combiner in reversed(combiners):
        if combiner == "sum":
            rows = jnp.sum(rows, axis=-2)
            valid = jnp.max(valid, axis=-1)  # level valid if any entry was
        elif combiner == "mean":
            denom = jnp.maximum(jnp.sum(valid, axis=-1), 1.0)
            rows = jnp.sum(rows, axis=-2) / denom[..., None]
            valid = jnp.max(valid, axis=-1)
        elif combiner == "sqrtn":
            denom = jnp.sqrt(jnp.maximum(jnp.sum(valid, axis=-1), 1.0))
            rows = jnp.sum(rows, axis=-2) / denom[..., None]
            valid = jnp.max(valid, axis=-1)
        else:
            raise ValueError(f"unknown combiner {combiner!r}")
        rows = rows * valid[..., None]
    return rows


def cold_mask_np(config: EmbeddingVariableConfig, values_np, versions_np,
                 occupied_np, global_step: int):
    """Host-side eviction predicate — THE single definition of "cold" for
    every host path (checkpoint save-time eviction, host-tier demotion), so
    they can never diverge from each other. Mirrors :func:`shrink`'s device
    predicate. ``values_np`` is the [cap(, +1), width] value store (fused
    slot columns are excluded from the L2 norm)."""
    import numpy as _np
    pol = config.evict
    cap = occupied_np.shape[0]
    cold = _np.zeros((cap,), bool)
    if isinstance(pol, GlobalStepEvict) and pol.steps_to_live > 0:
        cold = occupied_np & (global_step - versions_np[:cap]
                              >= pol.steps_to_live)
    elif isinstance(pol, L2WeightEvict) and pol.l2_weight_threshold > 0:
        v = _np.asarray(values_np[:cap, : config.embedding_dim], _np.float64)
        cold = occupied_np & (_np.sum(v * v, -1) < pol.l2_weight_threshold)
    return cold


def budget_cold_np(config: EmbeddingVariableConfig, versions_np, freqs_np,
                   occupied_np, policy_cold_np, hbm_budget: int):
    """HBM-budget pressure demotion on top of the policy predicate: if
    more than ``hbm_budget`` rows would stay resident, the least-recently
    -touched of them (version ascending, freq as the tiebreak — the
    reference's BatchCache LRU over ValuePtrs, embedding/cache.h) are
    forced cold too. Returns the combined cold mask."""
    import numpy as _np
    if hbm_budget <= 0:
        return policy_cold_np
    live = occupied_np & ~policy_cold_np
    excess = int(live.sum()) - int(hbm_budget)
    if excess <= 0:
        return policy_cold_np
    idx = _np.nonzero(live)[0]
    cap = occupied_np.shape[0]
    order = _np.lexsort((freqs_np[:cap][idx], versions_np[:cap][idx]))
    out = policy_cold_np.copy()
    out[idx[order[:excess]]] = True
    return out


class Snapshot(NamedTuple):
    """Dense export of a table: the checkpoint unit. Matches the reference's
    4-tensor EV bundle {keys, values, versions, freqs} + live mask
    (saveable_object_util.py:169-172, kv_variable_ops.h DumpEmbeddingValues)."""

    keys_hi: jax.Array
    keys_lo: jax.Array
    values: jax.Array
    versions: jax.Array
    freqs: jax.Array
    live: jax.Array  # bool per row


def export(state: EVState) -> Snapshot:
    cap = state.capacity
    return Snapshot(
        keys_hi=state.index.key_hi,
        keys_lo=state.index.key_lo,
        values=state.values[:cap],
        versions=state.versions[:cap],
        freqs=state.freqs[:cap],
        live=ht.occupied_mask(state.index),
    )


def import_snapshot(
    config: EmbeddingVariableConfig,
    keys: K.Keys,
    values: jax.Array,
    versions: jax.Array,
    freqs: jax.Array,
    create_steps: jax.Array | None = None,
) -> EVState:
    """Build a fresh state from dense key/value arrays (restore path,
    KvResourceImportV2 analog). ``keys`` may be EMPTY-padded."""
    state = create(config)
    index, slots, _created = ht.lookup_or_insert(state.index, keys, config.max_probes)
    cap = state.capacity
    live = ~K.is_empty(keys) & (slots != cap)
    dest = jnp.where(live, slots, cap + 1)  # OOB -> dropped; unique
    vals = state.values.at[dest].set(values.astype(state.values.dtype),
                                     mode="drop", unique_indices=True)
    cs = create_steps if create_steps is not None else versions
    return EVState(
        index=index,
        values=vals,
        freqs=state.freqs.at[dest].set(freqs, mode="drop", unique_indices=True),
        versions=state.versions.at[dest].set(versions, mode="drop", unique_indices=True),
        create_steps=state.create_steps.at[dest].set(cs, mode="drop", unique_indices=True),
        cbf=state.cbf,
    )
