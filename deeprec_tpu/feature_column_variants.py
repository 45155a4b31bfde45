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


class _DenseCkptMixin:
    """Checkpoint hooks for collections whose state is a fixed-size dense
    pytree (no per-key hash index): the whole tree is dumped per save, the
    last save wins at restore. Replicated on a mesh, so the dump is
    identical for any shard count — trivially reshard-safe."""

    def ckpt_arrays(self, bundle, num_shards, since, evict, global_step):
        import numpy as np
        arrays = {"__dense__": np.asarray(1, np.int32)}
        for i, leaf in enumerate(jax.tree_util.tree_leaves(
                (bundle.ev, bundle.slot))):
            arrays[f"leaf__{i:04d}"] = np.asarray(leaf)
        return arrays

    def ckpt_restore(self, trainer, template, parts, num_shards):
        import numpy as np
        last = parts[-1]
        n = len(jax.tree_util.tree_leaves((template.ev, template.slot)))
        leaves = [jnp.asarray(last[f"leaf__{i:04d}"]) for i in range(n)]
        treedef = jax.tree_util.tree_structure((template.ev, template.slot))
        ev_new, slot_new = jax.tree_util.tree_unflatten(treedef, leaves)
        mesh = getattr(trainer, "mesh", None)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from .parallel.multihost import host_to_global
            put = lambda x: host_to_global(mesh, P(), np.asarray(x))
            ev_new = jax.tree_util.tree_map(put, ev_new)
            slot_new = jax.tree_util.tree_map(put, slot_new)
        return template._replace(ev=ev_new, slot=slot_new)


class MultiHashCollection(_DenseCkptMixin, EmbeddingCollection):
    """Coalesced columns over a compositional Q-R multi-hash table: O(Q+R)
    rows serve the whole id space; no dynamic index, no growth.

    Mesh design (reference shards MultiHashVariable across PS tasks via
    `partitioner=`, kv_variable_ops.py:768): the whole point of the Q-R
    trick is to compress the id space into tables that FIT, so on TPU the
    sub-tables are **replicated** across the mesh — the lookup is then a
    purely local dense gather (zero exchange), and the update allgathers
    the per-device (ids, cotangents) and applies the identical global
    update on every device, preserving replication bit-for-bit."""

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

    # -- sharded hooks (replicated tables, allgather gradient union) -------
    def sharded_table_spec(self, axis, slot_example):
        from jax.sharding import PartitionSpec as P
        from .train.trainer import TableBundle
        rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
        return TableBundle(ev=rep(jax.eval_shape(self.init)),
                           slot=rep(slot_example), health=None)

    def sharded_init_local(self, opt):
        from .train.trainer import TableBundle
        st = self.init()
        return TableBundle(ev=st, slot=self.init_slot(opt, st), health=None)

    def sharded_lookup_or_create(self, state, ids2d, step, axis, bucket_cap):
        # tables are replicated: the lookup is local, no exchange
        return self.lookup_or_create(state, ids2d, step)

    def sharded_health(self, health, aux):
        return health

    def sharded_rows(self, state, aux):
        return mh.lookup(state, self.mh_config, aux.ev_aux.flat)

    def sharded_rows_back(self, urows, aux, axis, bucket_cap):
        return urows, aux.ev_aux.valid

    def sharded_apply_gradients(self, state, opt, slot_state, aux,
                                d_urows, step, axis, num_shards):
        # union the per-device sparse updates: allgather (ids, cotangents)
        # and run the identical global-batch apply on every device
        flat = aux.ev_aux.flat
        g = jax.lax.all_gather(d_urows, axis)          # [S, N, d]
        hi = jax.lax.all_gather(flat.hi, axis)          # [S, N]
        lo = jax.lax.all_gather(flat.lo, axis)
        ids_g = K.Keys(hi.reshape(-1), lo.reshape(-1))
        return mh.apply_gradients(state, self.mh_config, opt, slot_state,
                                  ids_g, g.reshape(-1, g.shape[-1]), step)

    def sharded_readonly(self, state, ids2d, axis, bucket_cap):
        _, aux = self.lookup_or_create(state, ids2d, jnp.int32(0))
        return (mh.lookup(state, self.mh_config, aux.ev_aux.flat),
                aux.ev_aux.valid)


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

    def grow_state(self, state, slot_state, opt=None):
        import dataclasses
        from .optim.sparse import permute_slot_state
        new_cap = self.config.capacity * 2
        new_ev, perm = ev.grow(state.ev, self.config, new_cap)
        ev_slot = permute_slot_state(slot_state["ev"], perm, new_cap,
                                     fills=opt.fills if opt else None)
        self.config = dataclasses.replace(self.config, capacity=new_cap)
        return state._replace(ev=new_ev), {"ev": ev_slot,
                                           "static": slot_state["static"]}

    # -- sharded hooks: the EV half rides the owner-hash exchange; the
    #    static bucket table is small by construction and replicated, with
    #    its gradients dense-accumulated and psum'd (reference shards the
    #    adaptive pair across PS via partitioner; feature_column_v2.py:2051)
    def index_view(self, state):
        return state.ev

    def table_index(self, state):
        return state.ev.index

    def sharded_table_spec(self, axis, slot_example):
        from jax.sharding import PartitionSpec as P
        from .train.trainer import TableBundle
        ad_spec = ad.AdaptiveState(ev=self._ev_state_spec(axis), static=P())
        slot_spec = {
            "ev": self._ev_slot_spec(axis, slot_example["ev"]),
            "static": jax.tree_util.tree_map(lambda _: P(),
                                             slot_example["static"]),
        }
        return TableBundle(ev=ad_spec, slot=slot_spec, health=P(axis, None))

    def sharded_init_local(self, opt):
        from .train.trainer import TableBundle
        st = self.init()  # deterministic (fixed rng key) -> replicas agree
        return TableBundle(ev=st, slot=self.init_slot(opt, st),
                           health=jnp.zeros((1, 3), jnp.int32))

    def sharded_owner_lookup(self, state, uniq, step, freq_counts):
        """Owner-side EV lookup + the warm-migration seeding of
        :func:`adaptive.lookup_or_create`, driven by the summed
        per-requester multiplicities."""
        ev_state, aux = ev.lookup_or_create_unique(
            state.ev, self.config, uniq, step, freq_counts=freq_counts)
        buckets = state.static.shape[0] - 1
        b = ad.bucket_of(uniq.ukeys, buckets)
        if self.config.counter_filter is not None:
            thr = self.config.counter_filter.filter_freq
            prev = ev_state.freqs[aux.slots] - freq_counts
            newly = aux.admitted & (prev < thr)
        else:
            newly = aux.created
        dest = jnp.where(newly, aux.slots, self.config.capacity + 1)
        seeded = ev_state.values.at[dest].set(
            state.static[b].astype(ev_state.values.dtype), mode="drop",
            unique_indices=True)
        return (state._replace(ev=ev_state._replace(values=seeded)), aux)

    def sharded_rows(self, state, aux):
        blended = ad.gather_from(state.ev.values, state.static, self.config,
                                 aux.recv_aux)
        return blended[aux.recv_uniq.inverse]

    def owner_readonly_rows(self, state, slots, found, keys):
        thr = (self.config.counter_filter.filter_freq
               if self.config.counter_filter is not None else 0)
        admitted = found & (state.ev.freqs[slots] >= thr)
        buckets = state.static.shape[0] - 1
        b = ad.bucket_of(keys, buckets)
        ev_rows = state.ev.values[slots]
        st_rows = state.static[b].astype(ev_rows.dtype)
        return jnp.where(admitted[:, None], ev_rows, st_rows)

    def sharded_apply_gradients(self, state, opt, slot_state, aux,
                                d_urows, step, axis, num_shards):
        from .ops.unique import unique_int32
        a = aux.recv_aux
        n = aux.recv_uniq.ukeys.shape[0]
        gu = jax.ops.segment_sum(d_urows, aux.recv_uniq.inverse, n)
        # EV half: admitted keys, owner-local apply
        cur = ev.gather(state.ev.values, a, self.config)
        values, ev_slot = opt.apply(state.ev.values, slot_state["ev"],
                                    a.slots, gu, a.admitted, step,
                                    cur_rows=cur, created=a.created)
        # static half: tail keys -> dense per-bucket grads, psum across the
        # mesh, identical dense apply on every device (replication-safe)
        buckets = state.static.shape[0] - 1
        tail = ~a.admitted & ~K.is_empty(a.uniq.ukeys)
        b = jnp.where(tail, ad.bucket_of(a.uniq.ukeys, buckets), buckets)
        ub, inv, _ = unique_int32(b)
        gb = jax.ops.segment_sum(jnp.where(tail[:, None], gu, 0.0), inv,
                                 ub.shape[0])
        dest = jnp.where(ub < buckets, ub, buckets + 1)  # OOB -> dropped
        dense = jnp.zeros_like(state.static).at[dest].add(
            gb.astype(state.static.dtype), mode="drop", unique_indices=True)
        touched = jnp.zeros((buckets + 1,), jnp.int32).at[dest].set(
            1, mode="drop", unique_indices=True)
        dense = jax.lax.psum(dense, axis)
        touched = jax.lax.psum(touched, axis) > 0
        static, st_slot = opt.apply(state.static, slot_state["static"],
                                    jnp.arange(buckets + 1), dense, touched,
                                    step)
        return (state._replace(ev=state.ev._replace(values=values),
                               static=static),
                {"ev": ev_slot, "static": st_slot})

    def sharded_grow_local(self, bundle, new_cap, fills):
        from .optim.sparse import permute_slot_state
        new_ev, perm = ev.grow(bundle.ev.ev, self.config, new_cap)
        ev_slot = permute_slot_state(bundle.slot["ev"], perm, new_cap,
                                     fills=fills)
        return bundle._replace(ev=bundle.ev._replace(ev=new_ev),
                               slot={"ev": ev_slot,
                                     "static": bundle.slot["static"]})

    # -- checkpoint: EV half in the 4-array reshard-safe format; static
    #    half (replicated) as dense leaves, last save wins
    def ckpt_arrays(self, bundle, num_shards, since, evict, global_step):
        import numpy as np
        from .checkpoint.saver import table_snapshot_host
        out = table_snapshot_host(self.config, bundle.ev.ev,
                                  bundle.slot["ev"], num_shards=num_shards,
                                  since_step=since, evict=evict,
                                  global_step=global_step)
        out["static__table"] = np.asarray(bundle.ev.static)
        for i, leaf in enumerate(jax.tree_util.tree_leaves(
                bundle.slot["static"])):
            out[f"static__slot{i:04d}"] = np.asarray(leaf)
        return out

    def ckpt_restore(self, trainer, template, parts, num_shards):
        import dataclasses
        import numpy as np
        from .checkpoint import saver as SV
        name = next(n for n, c in trainer.collections.items() if c is self)
        opt = trainer.sparse_optimizers[name]
        ev_parts = [{k: v for k, v in p.items()
                     if not k.startswith("static__")} for p in parts]
        n_max = sum(p["keys"].shape[0] for p in ev_parts)
        per_shard = int(np.ceil(n_max / num_shards)) + 8
        cap = SV.needed_capacity(per_shard, self.config.capacity)
        if cap != self.config.capacity:
            self.config = dataclasses.replace(self.config, capacity=cap)
            trainer.rejit()

        def scatter_all(st, slot):
            for p in (ev_parts if num_shards == 1 else ()):
                # fold multi-shard CBF blocks into the single-shard sketch
                # (the generic restore path's _cbf_for_shard treatment) —
                # _scatter_table's exact-shape guard would drop them
                cbf = SV._cbf_for_shard(p, 0, 1)
                if cbf is not None:
                    p = dict(p, cbf=cbf)
                st, slot = SV._scatter_table(st, slot, opt, self.config, p)
            return st, slot

        if num_shards == 1:
            st = ev.create(self.config)
            slot = opt.init(st.values)
            st, slot = scatter_all(st, slot)
            ev_state, ev_slot = st, slot
        else:
            from .parallel.multihost import stack_rowsharded
            routed = [SV.route_to_shards(p, num_shards) for p in ev_parts]
            shard_states, shard_slots = [], []
            for s in range(num_shards):
                st = ev.create(self.config)
                slot = opt.init(st.values)
                for p in routed:
                    st, slot = SV._scatter_table(st, slot, opt,
                                                 self.config, p[s])
                shard_states.append(st)
                shard_slots.append(slot)
            ev_state = stack_rowsharded(trainer.mesh, trainer.axis,
                                        shard_states)
            ev_slot = stack_rowsharded(trainer.mesh, trainer.axis,
                                       shard_slots)

        static = jnp.asarray(parts[-1]["static__table"])
        n_st = len(jax.tree_util.tree_leaves(template.slot["static"]))
        st_leaves = [jnp.asarray(parts[-1][f"static__slot{i:04d}"])
                     for i in range(n_st)]
        st_slot = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template.slot["static"]), st_leaves)
        if num_shards > 1:
            from jax.sharding import PartitionSpec as P
            from .parallel.multihost import host_to_global
            put = lambda x: host_to_global(trainer.mesh, P(), np.asarray(x))
            static = put(static)
            st_slot = jax.tree_util.tree_map(put, st_slot)
        return template._replace(
            ev=ad.AdaptiveState(ev=ev_state, static=static),
            slot={"ev": ev_slot, "static": st_slot})


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
        if admit is not None and self.config.track_freq is None:
            # the admission CBF needs the multiplicity counts routed over
            # the sharded exchange (freq_tracked gates the counts plane)
            import dataclasses as _dc
            self.config = _dc.replace(self.config, track_freq=True)

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

    # -- sharded hooks: the same owner-hash exchange as the EV engine, with
    #    per-shard id spaces (reference DistributedHashTable partitions,
    #    hash_table.py:388 — each partition's HashTable allocates in its
    #    own space; ids never leave the owner here, only rows do)
    def index_view(self, state):
        return state.alloc  # has .index with size/overflow planes

    def table_index(self, state):
        return state.alloc.index

    @staticmethod
    def _local_alloc(alloc):
        return alloc._replace(next_id=alloc.next_id.reshape(()))

    @staticmethod
    def _stacked_alloc(alloc):
        return alloc._replace(next_id=alloc.next_id.reshape(1))

    def sharded_table_spec(self, axis, slot_example):
        from jax.sharding import PartitionSpec as P
        from .train.trainer import TableBundle
        alloc_spec = hta.HashTableState(
            index=self._ev_index_spec(axis), ids=P(axis), next_id=P(axis),
            cbf=P(axis) if self.admit else None)
        ht_spec = HTState(alloc=alloc_spec,
                          table=hta.Tensible(rows=P(axis)))
        return TableBundle(ev=ht_spec,
                           slot=self._ev_slot_spec(axis, slot_example),
                           health=P(axis, None))

    def sharded_init_local(self, opt):
        from .train.trainer import TableBundle
        st = self.init()
        st = HTState(alloc=self._stacked_alloc(st.alloc), table=st.table)
        return TableBundle(ev=st, slot=opt.init(st.table.rows),
                           health=jnp.zeros((1, 3), jnp.int32))

    def sharded_owner_lookup(self, state, uniq, step, freq_counts):
        alloc, uids, created = hta.gen_ids_unique(
            self._local_alloc(state.alloc), uniq.ukeys, freq_counts,
            self.admit, self.config.max_probes)
        init_ids = jnp.where(created & (uids >= 0), uids, -1)
        table = hta.scatter(state.table, init_ids,
                            ev.init_rows(self.config, uniq.ukeys))
        return (HTState(alloc=self._stacked_alloc(alloc), table=table),
                HTAux(uniq=uniq, uids=uids, created=created))

    def sharded_rows(self, state, aux):
        return hta.gather(state.table,
                          aux.recv_aux.uids)[aux.recv_uniq.inverse]

    def sharded_rows_back(self, urows, aux, axis, bucket_cap):
        """Rows ride back as usual; validity additionally reflects the
        owner's admission/allocation verdict (id -1), returned over one
        extra int plane — the local trainer's ``uids >= 0`` mask."""
        rows, valid = super().sharded_rows_back(urows, aux, axis, bucket_cap)
        S = jax.lax.axis_size(axis)
        vflag = (aux.recv_aux.uids >= 0).astype(
            jnp.int32)[aux.recv_uniq.inverse]
        back = jax.lax.all_to_all(vflag.reshape(S, bucket_cap), axis, 0, 0)
        u_idx = jnp.where(aux.routed, aux.owner * bucket_cap + aux.pos, 0)
        v_u = (back.reshape(-1)[u_idx] > 0) & aux.routed
        return rows, valid & v_u[aux.local_uniq.inverse]

    def sharded_apply_gradients(self, state, opt, slot_state, aux,
                                d_urows, step, axis, num_shards):
        a = aux.recv_aux
        n = aux.recv_uniq.ukeys.shape[0]
        grads_u = jax.ops.segment_sum(d_urows, aux.recv_uniq.inverse, n)
        table, slot_state = hta.apply_sparse(state.table, opt, slot_state,
                                             a.uids, grads_u, step)
        return state._replace(table=table), slot_state

    def owner_readonly_rows(self, state, slots, found, keys):
        cap = self.config.capacity
        uids = jnp.where(found, state.alloc.ids[jnp.minimum(slots, cap - 1)],
                         -1)
        rows = hta.gather(state.table, uids)
        init = ev.init_rows(self.config, keys).astype(rows.dtype)
        return jnp.where((uids >= 0)[:, None], rows, init)

    def sharded_grow_local(self, bundle, new_cap, fills):
        state = bundle.ev
        alloc = self._local_alloc(state.alloc)
        live_keys = K.Keys(alloc.index.key_hi, alloc.index.key_lo)
        fresh = hta.create(new_cap, self.admit)
        index, slots, _ = ht_mod.lookup_or_insert(fresh.index, live_keys,
                                                  self.config.max_probes)
        dest = jnp.where(slots < new_cap, slots, new_cap + 1)
        ids_plane = fresh.ids.at[dest].set(alloc.ids, mode="drop",
                                           unique_indices=True)
        new_alloc = hta.HashTableState(index=index, ids=ids_plane,
                                       next_id=alloc.next_id.reshape(1),
                                       cbf=alloc.cbf)
        table = hta.grow(state.table, new_cap)
        cap1 = self.config.capacity + 1

        def grow_leaf(leaf, fill=0.0):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                    and leaf.shape[0] == cap1:
                fresh_rows = jnp.full((new_cap + 1,) + leaf.shape[1:],
                                      fill, leaf.dtype)
                return fresh_rows.at[: cap1 - 1].set(leaf[:-1])
            return leaf

        if fills is None:
            slot = jax.tree_util.tree_map(grow_leaf, bundle.slot)
        else:
            slot = jax.tree_util.tree_map(grow_leaf, bundle.slot, fills)
        return bundle._replace(ev=HTState(alloc=new_alloc, table=table),
                               slot=slot)

    # -- checkpoint: per-key {key, row, slot rows} — ids are per-shard
    #    internals and are RE-ALLOCATED at restore, so the format reshards
    #    to any shard count (reference HashTableDirectRestoreOp re-inserts
    #    keys, ops/hash_ops.cc:353-391)
    def ckpt_arrays(self, bundle, num_shards, since, evict, global_step):
        import numpy as np
        from .checkpoint import format as F
        from .parallel.multihost import addressable_blocks
        cap = self.config.capacity
        cap1 = cap + 1
        S = num_shards
        st = bundle.ev
        key_hi = addressable_blocks(st.alloc.index.key_hi, S, cap)
        key_lo = addressable_blocks(st.alloc.index.key_lo, S, cap)
        idsb = addressable_blocks(st.alloc.ids, S, cap)
        rowsb = addressable_blocks(st.table.rows, S, cap1)
        slot_rows = []
        for nm, leaf in F.slot_leaf_names(bundle.slot):
            if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == S * cap1:
                slot_rows.append((nm, addressable_blocks(leaf, S, cap1)))
        sel_keys, sel_vals = [], []
        sel_slots = {nm: [] for nm, _ in slot_rows}
        for s in sorted(key_hi):
            keys64 = ((key_hi[s].astype(np.int64) << 32)
                      | key_lo[s].astype(np.uint32).astype(np.int64))
            live = (keys64 != -1) & (idsb[s] >= 0)
            uid = idsb[s][live]
            sel_keys.append(keys64[live])
            sel_vals.append(rowsb[s][uid])
            for nm, blocks in slot_rows:
                sel_slots[nm].append(blocks[s][uid])
        out = {"__ht__": np.asarray(1, np.int32),
               "keys": np.concatenate(sel_keys),
               "values": np.concatenate(sel_vals)}
        for nm, parts in sel_slots.items():
            out[f"slot__{nm}"] = np.concatenate(parts)
        if st.alloc.cbf is not None:
            out["cbf_shards"] = np.asarray(S, np.int32)
            if (not isinstance(st.alloc.cbf, jax.Array)
                    or st.alloc.cbf.is_fully_addressable):
                out["cbf"] = np.asarray(st.alloc.cbf)
            else:
                # multi-process: save the addressable sketch blocks, like
                # the EV path (saver.table_snapshot_host) — dropping them
                # resets pre-admission counts only on multi-process
                # restores, diverging admission by deployment size
                m = st.alloc.cbf.shape[0] // S
                for s, blk in addressable_blocks(st.alloc.cbf, S, m).items():
                    out[f"cbf__shard{s:03d}"] = blk
        return out

    def _restore_one_shard(self, arrays, opt):
        """Fresh local HTState + slot from compacted rows: keys re-insert,
        dense ids re-allocate in scan order."""
        from .checkpoint import format as F
        cap = self.config.capacity
        st = self.init()
        keys = K.from_numpy(arrays["keys"])
        index, ids_plane, next_id, live, new_ids = hta.reinsert(
            st.alloc, keys, self.config.max_probes)
        cbf = st.alloc.cbf
        if cbf is not None and "cbf" in arrays \
                and arrays["cbf"].shape == cbf.shape:
            cbf = jnp.asarray(arrays["cbf"], cbf.dtype)
        alloc = hta.HashTableState(
            index=index, ids=ids_plane, next_id=next_id, cbf=cbf)
        row_dest = jnp.where(live, new_ids, cap + 1)
        table = hta.Tensible(rows=st.table.rows.at[row_dest].set(
            jnp.asarray(arrays["values"], st.table.rows.dtype),
            mode="drop", unique_indices=True))
        slot = opt.init(st.table.rows)
        flat = F.slot_leaf_names(slot)
        treedef = jax.tree_util.tree_structure(slot)
        leaves = []
        for nm, leaf in flat:
            rk = f"slot__{nm}"
            if rk in arrays:
                leaves.append(leaf.at[row_dest].set(
                    jnp.asarray(arrays[rk], leaf.dtype), mode="drop",
                    unique_indices=True))
            else:
                leaves.append(leaf)
        return (HTState(alloc=alloc, table=table),
                jax.tree_util.tree_unflatten(treedef, leaves))

    def ckpt_restore(self, trainer, template, parts, num_shards):
        import dataclasses
        import numpy as np
        from .checkpoint import saver as SV
        name = next(n for n, c in trainer.collections.items() if c is self)
        opt = trainer.sparse_optimizers[name]

        # merge parts, newest occurrence of a key wins
        def merge(parts):
            keys = np.concatenate([p["keys"] for p in parts])
            sel = SV.last_wins_sel(keys)
            out = {}
            for k in parts[0]:
                if k == "__ht__" or k == "cbf_shards" or k.startswith("cbf"):
                    continue
                out[k] = np.concatenate([p[k] for p in parts])[sel]
            # CBF sketches ride whole (newest part wins), incl. per-shard
            # blocks from multi-process saves — _cbf_for_shard folds them
            for k in parts[-1]:
                if k == "cbf_shards" or k.startswith("cbf"):
                    out[k] = parts[-1][k]
            return out

        merged = merge(parts)
        n = merged["keys"].shape[0]
        per_shard = int(np.ceil(n / num_shards)) + 8
        cap = SV.needed_capacity(per_shard, self.config.capacity)
        if cap != self.config.capacity:
            self.config = dataclasses.replace(self.config, capacity=cap)
            trainer.rejit()
        if num_shards == 1:
            cbf = SV._cbf_for_shard(merged, 0, 1)
            if cbf is not None:
                merged = dict(merged, cbf=cbf)
            st, slot = self._restore_one_shard(merged, opt)
            return template._replace(ev=st, slot=slot)
        from .parallel.multihost import stack_rowsharded
        routed = SV.route_to_shards(merged, num_shards)
        states, slots = [], []
        for s in range(num_shards):
            st, slot = self._restore_one_shard(routed[s], opt)
            st = HTState(alloc=self._stacked_alloc(st.alloc), table=st.table)
            states.append(st)
            slots.append(slot)
        return template._replace(
            ev=stack_rowsharded(trainer.mesh, trainer.axis, states),
            slot=stack_rowsharded(trainer.mesh, trainer.axis, slots))


class DynamicDimCollection(EmbeddingCollection):
    """Frequency-adaptive row width: columns see ``block_num*block_dim``
    wide embeddings with inactive blocks zeroed (and not trained)."""

    def __init__(self, columns, name: str = "dyndim",
                 dynamic_dim: dd_mod.DynamicDimConfig = None, **kwargs):
        super().__init__(columns, name=name, **kwargs)
        if dynamic_dim is None or dynamic_dim.full_dim != self.dim:
            raise ValueError("dynamic_dim.full_dim must equal the column dim")
        self.dd = dynamic_dim
        if self.config.track_freq is None:
            # block widths gate on freq: the light layout must not drop it
            import dataclasses as _dc
            self.config = _dc.replace(self.config, track_freq=True)

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

    # -- sharded hooks: state is a plain EVState, so the owner-hash
    #    exchange and the 4-array checkpoint path apply unchanged; only the
    #    frequency-derived block masking joins on the owner side (where the
    #    freq metadata lives — global counts, like the reference's PS)
    def sharded_rows(self, state, aux):
        a = aux.recv_aux
        rows = ev.gather(state.values, a, self.config)
        rows = rows * dd_mod.block_mask(self.dd, state.freqs[a.slots])
        return rows[aux.recv_uniq.inverse]

    def sharded_apply_gradients(self, state, opt, slot_state, aux,
                                d_urows, step, axis, num_shards):
        # defensive re-mask (the masked sharded_rows already zeroes the
        # inactive blocks' cotangents through autodiff)
        a = aux.recv_aux
        mask_u = dd_mod.block_mask(self.dd, state.freqs[a.slots])
        d_urows = d_urows * mask_u[aux.recv_uniq.inverse]
        return super().sharded_apply_gradients(state, opt, slot_state, aux,
                                               d_urows, step, axis,
                                               num_shards)

    def owner_readonly_rows(self, state, slots, found, keys):
        rows = super().owner_readonly_rows(state, slots, found, keys)
        return rows * dd_mod.block_mask(self.dd, state.freqs[slots])
