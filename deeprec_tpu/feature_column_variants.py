"""Variant embedding collections: multi-hash, adaptive, dynamic-dim.

These make the EV variants (reference: MultiHashVariable
kv_variable_ops.py:768, categorical_column_with_adaptive_embedding
feature_column_v2.py:2051, DynamicEmbeddingVariable :782) first-class in
the training stack: each subclasses :class:`EmbeddingCollection` and
overrides the trainer hooks (init / lookup / rows_for_training /
apply_gradients / readonly_rows), so ``Trainer`` and the modelzoo CLI run
them unchanged.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .config import CBFFilter, EmbeddingVariableConfig, Initializer
from .feature_column import (CollectionAux, EmbeddingCollection,
                             EmbeddingColumn, SequenceEmbeddingColumn)
from .sparse import adaptive as ad
from .sparse import dynamicdim as dd_mod
from .sparse import embedding_var as ev
from .sparse import hash_table_api as hta
from .sparse import hashtable as ht_mod
from .sparse import keys as K
from .sparse import multihash as mh


class FlatAux(NamedTuple):
    """Aux for table types without a hash index: the flat id batch."""

    flat: K.Keys
    valid: jax.Array


class MultiHashCollection(EmbeddingCollection):
    """Coalesced columns over a compositional Q-R multi-hash table: O(Q+R)
    rows serve the whole id space; no dynamic index, no growth."""

    def __init__(self, columns, name: str = "mh",
                 table_sizes: Tuple[int, ...] = (1 << 16, 1 << 12),
                 combiner_op: str = "add", initializer_scale: float = 0.05,
                 **kwargs):
        super().__init__(columns, name=name, **kwargs)
        self.mh_config = mh.MultiHashConfig(
            name=name, embedding_dim=self.dim, table_sizes=table_sizes,
            combiner=combiner_op, initializer_scale=initializer_scale)

    # -- trainer hooks -----------------------------------------------------
    def init(self):
        return mh.create(self.mh_config)

    def init_slot(self, opt, state):
        return mh.init_slots(state, opt)

    def lookup_or_create(self, state, batch, step):
        if isinstance(batch, K.Keys):
            flat = batch.reshape(-1) if len(batch.shape) > 1 else batch
        else:
            flat, _ = self._flatten_ids(batch)
        return state, CollectionAux(ev_aux=FlatAux(
            flat=flat, valid=~K.is_empty(flat)))

    def rows_for_training(self, state, aux):
        return mh.lookup(state, self.mh_config, aux.ev_aux.flat)

    def _per_column_rows(self, urows, aux):
        return urows  # already in flat layout

    def embeddings(self, urows, aux, batch=None):
        return self.embeddings_from_rows(urows, aux.ev_aux.valid)

    def sequence_embeddings(self, urows, aux):
        return self.sequence_embeddings_from_rows(urows, aux.ev_aux.valid)

    def apply_gradients(self, state, opt, slot_state, aux, urow_grads,
                        step, urows=None):
        return mh.apply_gradients(state, self.mh_config, opt, slot_state,
                                  aux.ev_aux.flat, urow_grads, step)

    def readonly_rows(self, state, cats):
        state2, aux = self.lookup_or_create(state, cats, jnp.int32(0))
        return aux, self.rows_for_training(state2, aux)

    def needs_growth(self, state):
        return False

    def load_factor(self, state):
        return 0.0


class AdaptiveCollection(EmbeddingCollection):
    """Adaptive embedding: a shared static hash-bucket table serves the
    cold tail, exact EV rows serve admitted (hot) keys, with warm row
    migration at admission (reference adaptive_embedding_lookup_sparse).
    Requires a CounterFilter on the config."""

    def __init__(self, columns, name: str = "adaptive", buckets: int = 1 << 14,
                 **kwargs):
        super().__init__(columns, name=name, **kwargs)
        if self.config.counter_filter is None:
            raise ValueError("AdaptiveCollection requires counter_filter=")
        self.buckets = buckets

    def init(self):
        return ad.create(self.config, self.buckets)

    def init_slot(self, opt, state):
        return {"ev": opt.init(state.ev.values),
                "static": opt.init(state.static)}

    def lookup_or_create(self, state, batch, step):
        if isinstance(batch, K.Keys):
            flat = batch.reshape(-1) if len(batch.shape) > 1 else batch
        else:
            flat, _ = self._flatten_ids(batch)
        state, aux = ad.lookup_or_create(state, self.config, flat, step)
        return state, CollectionAux(ev_aux=aux)

    def rows_for_training(self, state, aux):
        return ad.gather_from(state.ev.values, state.static, self.config,
                              aux.ev_aux)

    def embeddings(self, urows, aux, batch=None):
        a = aux.ev_aux
        # adaptive: tail keys are valid too (they read the static bucket)
        valid = (~K.is_empty(a.uniq.ukeys))[a.uniq.inverse]
        rows = urows[a.uniq.inverse]
        return self.embeddings_from_rows(rows, valid)

    def sequence_embeddings(self, urows, aux):
        a = aux.ev_aux
        valid = (~K.is_empty(a.uniq.ukeys))[a.uniq.inverse]
        rows = urows[a.uniq.inverse]
        return self.sequence_embeddings_from_rows(rows, valid)

    def apply_gradients(self, state, opt, slot_state, aux, urow_grads,
                        step, urows=None):
        state, ev_slot, st_slot = ad.apply_gradients(
            state, self.config, opt, slot_state["ev"], opt,
            slot_state["static"], aux.ev_aux, urow_grads, step)
        return state, {"ev": ev_slot, "static": st_slot}

    def readonly_rows(self, state, cats):
        from .ops.unique import unique
        from .sparse import hashtable as ht
        if isinstance(cats, K.Keys):
            flat = cats.reshape(-1) if len(cats.shape) > 1 else cats
        else:
            flat, _ = self._flatten_ids(cats)
        uniq = unique(flat, self.config.max_unique)
        slots, found = ht.lookup(state.ev.index, uniq.ukeys,
                                 self.config.max_probes)
        admitted = found & (state.ev.freqs[slots] >=
                            self.config.counter_filter.filter_freq)
        aux = ev.LookupAux(uniq=uniq, slots=slots, admitted=admitted,
                           created=jnp.zeros_like(found))
        rows = ad.gather_from(state.ev.values, state.static, self.config, aux)
        return CollectionAux(ev_aux=aux), rows

    def needs_growth(self, state):
        return (float(ev.load_factor(state.ev)) >= 0.7
                or int(jnp.sum(state.ev.index.overflow)) > 0)

    def load_factor(self, state):
        return float(ev.load_factor(state.ev))


class HTState(NamedTuple):
    """Hash-table collection state: id allocator + row store (+ the
    reference's per-table snapshot unit, hash_table.py:142)."""

    alloc: hta.HashTableState
    table: hta.Tensible


class HTAux(NamedTuple):
    uniq: object               # UniqueResult over the flat keys
    uids: jax.Array            # [U] dense id per unique key (-1 invalid)
    created: jax.Array         # [U] allocated this step


class HashTableCollection(EmbeddingCollection):
    """``hash_table_column`` (reference feature_column/hash_table_column.py:49
    HashTableColumn + python/ops/hash_table/embedding.py): embedding lookup
    backed by the second KV stack — a dense-id-allocating HashTable plus a
    TensibleVariable row store — instead of an EmbeddingVariable. Runs
    through Trainer / the modelzoo CLI unchanged.

    Semantic differences from EV-backed columns, kept on purpose:
      * ids are allocated densely in admission order (0, 1, 2, ...), so the
        row store has zero index overhead at gather time;
      * slot variables are Tensibles over the same id space (reference
        create_slot, hash_table.py:524);
      * admission is a counting-Bloom gate on id allocation
        (bloom_filter_strategy.h).
    """

    def __init__(self, columns, name: str = "ht",
                 admit: Optional[CBFFilter] = None, **kwargs):
        super().__init__(columns, name=name, **kwargs)
        self.admit = admit

    # -- trainer hooks -----------------------------------------------------
    def init(self):
        cap = self.config.capacity
        return HTState(alloc=hta.create(cap, self.admit),
                       table=hta.tensible(cap, (self.dim,)))

    def init_slot(self, opt, state):
        return opt.init(state.table.rows)

    def lookup_or_create(self, state, batch, step):
        from .ops.unique import unique
        if isinstance(batch, K.Keys):
            flat = batch.reshape(-1) if len(batch.shape) > 1 else batch
        else:
            flat, _ = self._flatten_ids(batch)
        uniq = unique(flat, self.config.max_unique)
        alloc, uids, created = hta.gen_ids_unique(
            state.alloc, uniq.ukeys, uniq.counts, self.admit,
            self.config.max_probes)
        # freshly-allocated ids materialise their deterministic init row
        # (the reference's initializer runs at TensibleVariable append)
        init_ids = jnp.where(created & (uids >= 0), uids, -1)
        table = hta.scatter(state.table, init_ids,
                            ev.init_rows(self.config, uniq.ukeys))
        return (HTState(alloc=alloc, table=table),
                CollectionAux(ev_aux=HTAux(uniq=uniq, uids=uids,
                                           created=created)))

    def rows_for_training(self, state, aux):
        return hta.gather(state.table, aux.ev_aux.uids)

    def _valid_flat(self, aux):
        a = aux.ev_aux
        return (a.uids >= 0)[a.uniq.inverse]

    def embeddings(self, urows, aux, batch=None):
        rows = urows[aux.ev_aux.uniq.inverse]
        return self.embeddings_from_rows(rows, self._valid_flat(aux))

    def sequence_embeddings(self, urows, aux):
        rows = urows[aux.ev_aux.uniq.inverse]
        return self.sequence_embeddings_from_rows(rows, self._valid_flat(aux))

    def apply_gradients(self, state, opt, slot_state, aux, urow_grads,
                        step, urows=None):
        a = aux.ev_aux
        table, slot_state = hta.apply_sparse(
            state.table, opt, slot_state, a.uids, urow_grads, step)
        return state._replace(table=table), slot_state

    def readonly_rows(self, state, cats):
        from .ops.unique import unique
        if isinstance(cats, K.Keys):
            flat = cats.reshape(-1) if len(cats.shape) > 1 else cats
        else:
            flat, _ = self._flatten_ids(cats)
        uniq = unique(flat, self.config.max_unique)
        uids = hta.lookup(state.alloc, uniq.ukeys, self.config.max_probes)
        aux = CollectionAux(ev_aux=HTAux(
            uniq=uniq, uids=uids, created=jnp.zeros_like(uids, jnp.bool_)))
        rows = hta.gather(state.table, uids)
        # unknown keys read their deterministic would-be init (EV parity)
        init = ev.init_rows(self.config, uniq.ukeys).astype(rows.dtype)
        rows = jnp.where((uids >= 0)[:, None], rows, init)
        return aux, rows

    # -- growth (ids are stable, so growth is a copy + index rebuild) -------
    def needs_growth(self, state):
        import numpy as np
        cap = self.config.capacity
        return (int(np.asarray(state.alloc.next_id)) >= 0.7 * cap
                or int(np.asarray(state.alloc.index.overflow).sum()) > 0)

    def grow_state(self, state, slot_state, opt=None):
        import dataclasses
        import numpy as np
        cap = self.config.capacity
        new_cap = cap * 2
        # re-insert live keys into a double-size index (one device call);
        # dense ids are stable so row stores just extend
        live_keys = K.Keys(state.alloc.index.key_hi, state.alloc.index.key_lo)
        fresh = hta.create(new_cap, self.admit)
        index, slots, _ = ht_mod.lookup_or_insert(
            fresh.index, live_keys, self.config.max_probes)
        old_ids = state.alloc.ids
        dest = jnp.where(slots < new_cap, slots, new_cap + 1)
        ids_plane = fresh.ids.at[dest].set(old_ids, mode="drop",
                                           unique_indices=True)
        alloc = hta.HashTableState(index=index, ids=ids_plane,
                                   next_id=state.alloc.next_id,
                                   cbf=state.alloc.cbf)
        table = hta.grow(state.table, new_cap)

        fills = opt.fills if opt else None

        def grow_leaf(leaf, fill=0.0):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                    and leaf.shape[0] == cap + 1:
                fresh_rows = jnp.full((new_cap + 1,) + leaf.shape[1:],
                                      fill, leaf.dtype)
                return fresh_rows.at[:cap].set(leaf[:-1])
            return leaf

        if fills is None:
            slot_state = jax.tree_util.tree_map(grow_leaf, slot_state)
        else:
            slot_state = jax.tree_util.tree_map(grow_leaf, slot_state, fills)
        self.config = dataclasses.replace(self.config, capacity=new_cap)
        return HTState(alloc=alloc, table=table), slot_state

    def load_factor(self, state):
        import numpy as np
        return float(np.asarray(state.alloc.next_id)) / self.config.capacity


class DynamicDimCollection(EmbeddingCollection):
    """Frequency-adaptive row width: columns see ``block_num*block_dim``
    wide embeddings with inactive blocks zeroed (and not trained)."""

    def __init__(self, columns, name: str = "dyndim",
                 dynamic_dim: dd_mod.DynamicDimConfig = None, **kwargs):
        super().__init__(columns, name=name, **kwargs)
        if dynamic_dim is None or dynamic_dim.full_dim != self.dim:
            raise ValueError("dynamic_dim.full_dim must equal the column dim")
        self.dd = dynamic_dim

    def rows_for_training(self, state, aux):
        return dd_mod.gather(state, self.dd, aux.ev_aux, self.config)

    def apply_gradients(self, state, opt, slot_state, aux, urow_grads,
                        step, urows=None):
        # re-mask: inactive blocks receive no update even though the model
        # produced cotangents for the zeroed inputs; cur rows must be the
        # UNMASKED effective rows, so let the base recompute them
        a = aux.ev_aux
        mask = dd_mod.block_mask(self.dd, state.freqs[a.slots])
        return super().apply_gradients(state, opt, slot_state, aux,
                                       urow_grads * mask, step, urows=None)

    def readonly_rows(self, state, cats):
        aux, rows = super().readonly_rows(state, cats)
        mask = dd_mod.block_mask(self.dd, state.freqs[aux.ev_aux.slots])
        return aux, rows * mask
