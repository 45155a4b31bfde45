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

from .config import EmbeddingVariableConfig, Initializer
from .feature_column import (CollectionAux, EmbeddingCollection,
                             EmbeddingColumn, SequenceEmbeddingColumn)
from .sparse import adaptive as ad
from .sparse import dynamicdim as dd_mod
from .sparse import embedding_var as ev
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
