"""DistributedHashTable: the second KV stack, row-sharded over the mesh.

TPU-native rebuild of the reference's partitioned hash-table system
(python/ops/hash_table/hash_table.py:388 ``DistributedHashTable``: a
key-hash slicer routes each key to one partition, each partition's
HashTable allocates ids in its own id space, lookups gather per partition
and stitch). Here the partitions are mesh shards and the routing is the
same owner-hash all_to_all exchange as the EV engine
(parallel/sharded.py) — gen_ids, embedding lookup, and the gradient
exchange (via autodiff transpose) all ride ICI collectives instead of
dynamic_partition + parallel_dynamic_stitch over gRPC.

Id spaces are PER SHARD (the reference's per-partition spaces): a global
id is ``local_id * S + shard`` — stable under table growth and dense
enough to index per-shard Tensible stores directly.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..config import CBFFilter, Initializer
from ..ops.unique import unique
from ..sparse import embedding_var as ev
from ..sparse import hash_table_api as hta
from ..sparse import keys as K
from . import multihost as mh
from .sharded import OWNER_SEED, _bucket_positions, _owner_of


class DHTState(NamedTuple):
    alloc: hta.HashTableState   # stacked per-shard allocator [S*...]
    table: hta.Tensible         # stacked per-shard rows [S*(cap+1), dim]


class DistributedHashTable:
    """Row-sharded HashTable + TensibleVariable over a 1-D mesh.

    API (mirrors the reference's, hash_table.py:388):
      * ``init()`` -> DHTState (sharded global arrays)
      * ``gen_ids(state, hi, lo)`` -> (state, global_ids) — dense ids,
        allocated on the owner shard (-1 for padding/non-admitted)
      * ``lookup_and_grads(...)`` — rows in key order + the table-row
        cotangent of a supplied output cotangent (the gradient exchange is
        emitted by autodiff transpose of the rows-back all_to_all)
      * ``apply_cotangent(...)`` — full training update: lookup + owner-side
        sparse apply (TensibleVariableApply*, hash_training_ops.cc:90-227)
      * ``size`` / ``snapshot`` — totals / (keys, ids) across shards
    """

    def __init__(self, mesh, capacity_per_shard: int, dim: int,
                 initializer: Optional[Initializer] = None,
                 admit: Optional[CBFFilter] = None, axis: str = "dp",
                 max_probes: int = 32, bucket_cap: int = 1024,
                 max_unique: Optional[int] = None):
        self.mesh = mesh
        self.axis = axis
        self.S = int(np.prod(mesh.devices.shape))
        self.cap = capacity_per_shard
        self.dim = dim
        self.initializer = initializer or Initializer("normal", scale=0.05)
        self.admit = admit
        self.max_probes = max_probes
        self.bucket_cap = bucket_cap
        self.max_unique = max_unique
        # a minimal EV-config view so ev.init_rows can derive key-seeded rows
        from ..config import EmbeddingVariableConfig
        self._init_cfg = EmbeddingVariableConfig(
            name="dht", embedding_dim=dim, capacity=capacity_per_shard,
            initializer=self.initializer)
        # LRU-bounded: a long-lived process cycling batch shapes or
        # optimizer objects must not accumulate compiled programs forever
        from collections import OrderedDict
        self._jit_cache: "OrderedDict" = OrderedDict()
        self._jit_cache_max = 16

    def _cache_get(self, key):
        fn = self._jit_cache.get(key)
        if fn is not None:
            self._jit_cache.move_to_end(key)
        return fn

    def _cache_put(self, key, value):
        self._jit_cache[key] = value
        self._jit_cache.move_to_end(key)
        while len(self._jit_cache) > self._jit_cache_max:
            self._jit_cache.popitem(last=False)
        return value

    # -- construction --------------------------------------------------------
    def init(self) -> DHTState:
        def tile(leaf):
            # per-shard scalars (next_id) ride as [S] row-sharded arrays
            x = np.asarray(leaf)
            if x.ndim == 0:
                x = x[None]
            t = np.tile(x, (self.S,) + (1,) * (x.ndim - 1))
            return mh.host_to_global(self.mesh, P(self.axis), t)

        alloc = jax.tree_util.tree_map(tile, hta.create(self.cap, self.admit))
        table = jax.tree_util.tree_map(
            tile, hta.tensible(self.cap, (self.dim,)))
        return DHTState(alloc=alloc, table=table)

    def _specs(self):
        alloc_spec = hta.HashTableState(
            index=jax.tree_util.tree_map(lambda _: P(self.axis),
                                         hta.create(4).index),
            ids=P(self.axis), next_id=P(self.axis),
            cbf=P(self.axis) if self.admit else None)
        return DHTState(alloc=alloc_spec, table=hta.Tensible(rows=P(self.axis)))

    @staticmethod
    def _local_alloc(alloc: hta.HashTableState) -> hta.HashTableState:
        """Per-device view -> the scalar-next_id shape hta expects."""
        return alloc._replace(next_id=alloc.next_id.reshape(()))

    @staticmethod
    def _stacked_alloc(alloc: hta.HashTableState) -> hta.HashTableState:
        return alloc._replace(next_id=alloc.next_id.reshape(1))

    # -- per-device bodies (inside shard_map) --------------------------------
    def _exchange(self, keys: K.Keys):
        """Requester side: dedup + owner-bucket the local flat keys. The
        per-requester multiplicities ride a third plane so owner-side
        admission counts id OCCURRENCES across the global batch (the
        framework-wide AddFreq(count) semantic)."""
        S = self.S
        uniq = unique(keys, self.max_unique)
        owner = _owner_of(uniq.ukeys, S)
        pos = _bucket_positions(owner)
        routed = (owner < S) & (pos < self.bucket_cap)
        dest = jnp.where(routed, owner * self.bucket_cap + pos,
                         S * self.bucket_cap)
        send = K.empty_like((S * self.bucket_cap,))
        send = K.Keys(
            send.hi.at[dest].set(uniq.ukeys.hi, mode="drop", unique_indices=True),
            send.lo.at[dest].set(uniq.ukeys.lo, mode="drop", unique_indices=True))
        send_counts = jnp.zeros((S * self.bucket_cap,), jnp.int32).at[dest].set(
            uniq.counts.astype(jnp.int32), mode="drop", unique_indices=True)
        recv_hi = jax.lax.all_to_all(send.hi.reshape(S, self.bucket_cap),
                                     self.axis, 0, 0)
        recv_lo = jax.lax.all_to_all(send.lo.reshape(S, self.bucket_cap),
                                     self.axis, 0, 0)
        recv_counts = jax.lax.all_to_all(
            send_counts.reshape(S, self.bucket_cap), self.axis, 0,
            0).reshape(-1)
        recv = K.Keys(recv_hi.reshape(-1), recv_lo.reshape(-1))
        return uniq, owner, pos, routed, recv, recv_counts

    def _ids_back(self, uids_r: jax.Array, uniq, owner, pos, routed):
        """Return owner-side per-bucket-position values to requesters and
        spread them back to local flat order ([N] via uniq.inverse)."""
        S = self.S
        back = jax.lax.all_to_all(
            uids_r.reshape(S, self.bucket_cap), self.axis, 0, 0)
        u_idx = jnp.where(routed, owner * self.bucket_cap + pos, 0)
        val_u = back.reshape(-1)[u_idx]
        val_u = jnp.where(routed, val_u, -1)
        return val_u[uniq.inverse]

    def _gen_ids_device(self, state: DHTState, khi, klo):
        """shard_map body: allocate ids for the local key batch."""
        keys = K.Keys(khi.reshape(-1), klo.reshape(-1))
        uniq, owner, pos, routed, recv, rcounts = self._exchange(keys)
        # owner side: dedup + allocate on the local shard
        ruq = unique(recv, self.max_unique)
        counts_u = jax.ops.segment_sum(rcounts, ruq.inverse,
                                       ruq.ukeys.shape[0])
        alloc, uids_u, created = hta.gen_ids_unique(
            self._local_alloc(state.alloc), ruq.ukeys, counts_u,
            self.admit, self.max_probes)
        alloc = self._stacked_alloc(alloc)
        # freshly-allocated ids materialise their deterministic init rows
        init_ids = jnp.where(created & (uids_u >= 0), uids_u, -1)
        table = hta.scatter(state.table,
                            init_ids, ev.init_rows(self._init_cfg, ruq.ukeys))
        # per-shard -> global id space BEFORE returning to requesters
        me = jax.lax.axis_index(self.axis).astype(jnp.int32)
        guids_u = jnp.where(uids_u >= 0, uids_u * self.S + me, -1)
        guids_r = guids_u[ruq.inverse]
        flat_ids = self._ids_back(guids_r, uniq, owner, pos, routed)
        return DHTState(alloc=alloc, table=table), flat_ids

    def gen_ids(self, state: DHTState, keys_hi, keys_lo):
        """Global dense ids for a per-device-sharded key batch [S, n]."""
        key = ("gen_ids", keys_hi.shape)
        fn = self._cache_get(key)
        if fn is None:
            spec = self._specs()
            fn = self._cache_put(key, jax.jit(jax.shard_map(
                lambda st, h, l: self._gen_ids_device(st, h, l),
                mesh=self.mesh,
                in_specs=(spec, P(self.axis), P(self.axis)),
                out_specs=(spec, P(self.axis)), check_vma=False)))
        return fn(state, keys_hi, keys_lo)

    def _lookup_device(self, state: DHTState, khi, klo):
        """shard_map body: gen ids + gather rows; rows differentiable."""
        keys = K.Keys(khi.reshape(-1), klo.reshape(-1))
        uniq, owner, pos, routed, recv, rcounts = self._exchange(keys)
        ruq = unique(recv, self.max_unique)
        counts_u = jax.ops.segment_sum(rcounts, ruq.inverse,
                                       ruq.ukeys.shape[0])
        alloc, uids_u, created = hta.gen_ids_unique(
            self._local_alloc(state.alloc), ruq.ukeys, counts_u,
            self.admit, self.max_probes)
        alloc = self._stacked_alloc(alloc)
        init_ids = jnp.where(created & (uids_u >= 0), uids_u, -1)
        table = hta.scatter(state.table,
                            init_ids, ev.init_rows(self._init_cfg, ruq.ukeys))
        new_state = DHTState(alloc=alloc, table=table)

        def rows_of(table_rows):
            urows = hta.gather(hta.Tensible(rows=table_rows), uids_u)
            rows_r = urows[ruq.inverse]
            back = jax.lax.all_to_all(
                rows_r.reshape(self.S, self.bucket_cap, self.dim),
                self.axis, 0, 0)
            u_idx = jnp.where(routed, owner * self.bucket_cap + pos, 0)
            row_u = back.reshape(-1, self.dim)[u_idx]
            row_u = jnp.where(routed[:, None], row_u, 0.0)
            return row_u[uniq.inverse]

        valid = self._ids_back(
            jnp.where(uids_u >= 0, 1, 0)[ruq.inverse].astype(jnp.int32),
            uniq, owner, pos, routed) > 0
        # the aux the caller must carry to apply_gradients
        aux = (uniq, owner, pos, routed, ruq, uids_u)
        return new_state, rows_of, valid, aux

    def lookup_and_grads(self, state: DHTState, keys_hi, keys_lo, cotangent):
        """One fused jitted exchange used by tests/serving: lookup rows and
        simultaneously apply a caller-supplied cotangent (simulating the
        backward pass) via VJP — proves the gradient exchange."""
        key = ("lookup_grads", keys_hi.shape, cotangent.shape)
        fn = self._cache_get(key)
        if fn is None:
            spec = self._specs()

            def body(st, h, l, ct):
                st2, rows_of, valid, aux = self._lookup_device(st, h, l)

                rows, vjp = jax.vjp(rows_of, st2.table.rows)
                (d_rows,) = vjp(ct.reshape(-1, self.dim))
                return st2, rows, valid, d_rows

            fn = self._cache_put(key, jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(spec, P(self.axis), P(self.axis), P(self.axis)),
                out_specs=(spec, P(self.axis), P(self.axis), P(self.axis)),
                check_vma=False)))
        return fn(state, keys_hi, keys_lo, cotangent)

    def apply_cotangent(self, state: DHTState, opt, slot_state,
                        keys_hi, keys_lo, cotangent, step):
        """Full training update: lookup + owner-side sparse apply of the
        cotangent (grads for repeated keys summed by the transpose)."""
        # id(opt) is only stable while the object lives; the cache entry
        # therefore holds a strong reference to opt so the address can
        # never be reused by a different optimizer (see _jit_cache values)
        key = ("apply", keys_hi.shape, cotangent.shape, id(opt))
        entry = self._cache_get(key)
        if entry is None:
            spec = self._specs()

            def body(st, slot, h, l, ct, stp):
                st2, rows_of, valid, aux = self._lookup_device(st, h, l)
                (uniq, owner, pos, routed, ruq, uids_u) = aux
                rows, vjp = jax.vjp(rows_of, st2.table.rows)
                (d_rows,) = vjp(ct.reshape(-1, self.dim))
                # d_rows is dense over the local table rows: the transpose
                # already scatter-added per-row cotangents. Convert to the
                # sparse apply over this step's touched ids.
                n = ruq.ukeys.shape[0]
                mask = uids_u >= 0
                slots = jnp.where(mask, uids_u, st2.table.capacity)
                grads_u = d_rows[slots]
                t_rows, slot = opt.apply(st2.table.rows, slot, slots,
                                         grads_u, mask, stp)
                return st2._replace(table=hta.Tensible(rows=t_rows)), slot, rows, valid

            slot_spec = jax.tree_util.tree_map(
                lambda l: (P(self.axis) if hasattr(l, "ndim") and l.ndim >= 1
                           and l.shape[0] == self.S * (self.cap + 1) else P()),
                slot_state)
            entry = self._cache_put(key, (jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(spec, slot_spec, P(self.axis), P(self.axis),
                          P(self.axis), P()),
                out_specs=(spec, slot_spec, P(self.axis), P(self.axis)),
                check_vma=False)), opt))
        fn, _ref = entry
        return fn(state, slot_state, keys_hi, keys_lo, cotangent, step)

    def init_slot(self, opt, state: DHTState):
        """Slot Tensibles over the same (sharded) id space (reference
        create_slot, hash_table.py:524)."""
        def tile(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1:
                t = np.tile(np.asarray(leaf), (self.S,) + (1,) * (leaf.ndim - 1))
                return mh.host_to_global(self.mesh, P(self.axis), t)
            return mh.host_to_global(self.mesh, P(), leaf)
        local = hta.tensible(self.cap, (self.dim,))
        return jax.tree_util.tree_map(tile, opt.init(local.rows))

    def size(self, state: DHTState) -> int:
        return int(mh.np_global(state.alloc.next_id).sum())

    # -- operational tail: health / growth / reshard-safe checkpoints -----
    def health(self, state: DHTState) -> dict:
        """Host-side watchdog counters: allocator fill, index overflow
        (failed inserts — those keys silently resolve to id -1, which is
        otherwise indistinguishable from non-admission), per-shard skew."""
        sizes = mh.np_global(state.alloc.next_id).reshape(-1)
        over = mh.np_global(state.alloc.index.overflow).reshape(-1)
        return {
            "size": int(sizes.sum()),
            "capacity_per_shard": self.cap,
            "shards": self.S,
            "load_factor": float(sizes.max()) / self.cap,
            "overflow": int(over.sum()),
            "max_shard_size": int(sizes.max()),
        }

    def maybe_grow(self, state: DHTState, threshold: float = 0.7) -> DHTState:
        """Rebuild every shard at 2x capacity when the fullest shard passes
        ``threshold`` (or any insert has failed). Dense ids are stable —
        growth re-inserts keys and copies rows (TensibleVariable segment
        append). Invalidate's the jit cache (static shapes change)."""
        h = self.health(state)
        if h["load_factor"] < threshold and h["overflow"] == 0:
            return state
        new_cap = self.cap * 2
        spec = self._specs()

        from ..sparse import hashtable as ht_mod

        def per_shard(st: DHTState):
            alloc = self._local_alloc(st.alloc)
            live_keys = K.Keys(alloc.index.key_hi, alloc.index.key_lo)
            fresh = hta.create(new_cap, self.admit)
            index, slots, _ = ht_mod.lookup_or_insert(fresh.index, live_keys,
                                                      self.max_probes)
            dest = jnp.where(slots < new_cap, slots, new_cap + 1)
            ids_plane = fresh.ids.at[dest].set(alloc.ids, mode="drop",
                                               unique_indices=True)
            new_alloc = hta.HashTableState(index=index, ids=ids_plane,
                                           next_id=alloc.next_id.reshape(1),
                                           cbf=alloc.cbf)
            table = hta.grow(st.table, new_cap)
            return DHTState(alloc=new_alloc, table=table)

        grow_fn = jax.jit(jax.shard_map(per_shard, mesh=self.mesh,
                                        in_specs=(spec,), out_specs=spec,
                                        check_vma=False))
        out = grow_fn(state)
        import dataclasses as _dc
        self.cap = new_cap
        self._init_cfg = _dc.replace(self._init_cfg, capacity=new_cap)
        self._jit_cache.clear()
        return out

    def checkpoint_arrays(self, state: DHTState) -> dict:
        """Compacted per-key {keys, values} (+ per-shard CBF blocks) — the
        reshard-safe save unit (ids are per-shard internals, re-allocated
        at restore like HashTableDirectRestoreOp, ops/hash_ops.cc:353-391)."""
        key_hi = mh.addressable_blocks(state.alloc.index.key_hi, self.S,
                                       self.cap)
        key_lo = mh.addressable_blocks(state.alloc.index.key_lo, self.S,
                                       self.cap)
        idsb = mh.addressable_blocks(state.alloc.ids, self.S, self.cap)
        rowsb = mh.addressable_blocks(state.table.rows, self.S, self.cap + 1)
        ks, vs = [], []
        for s in sorted(key_hi):
            k64 = ((key_hi[s].astype(np.int64) << 32)
                   | key_lo[s].astype(np.uint32).astype(np.int64))
            live = (k64 != -1) & (idsb[s] >= 0)
            ks.append(k64[live])
            vs.append(rowsb[s][idsb[s][live]])
        out = {"keys": np.concatenate(ks), "values": np.concatenate(vs)}
        if state.alloc.cbf is not None:
            out["cbf_shards"] = np.asarray(self.S, np.int32)
            if (not isinstance(state.alloc.cbf, jax.Array)
                    or state.alloc.cbf.is_fully_addressable):
                out["cbf"] = np.asarray(state.alloc.cbf)
            else:
                # multi-process: save addressable sketch blocks (EV-path
                # parity, saver.table_snapshot_host) — dropping them would
                # reset admission counts only on multi-process restores
                m = state.alloc.cbf.shape[0] // self.S
                for s, blk in mh.addressable_blocks(
                        state.alloc.cbf, self.S, m).items():
                    out[f"cbf__shard{s:03d}"] = blk
        return out

    def restore_arrays(self, arrays: dict) -> DHTState:
        """Rebuild a (possibly differently-sharded) DHT from compacted
        arrays: keys route by the owner hash, ids re-allocate per shard."""
        from ..checkpoint.saver import route_to_shards
        import dataclasses as _dc
        n_max = int(np.ceil(arrays["keys"].shape[0] / self.S)) + 8
        while n_max > 0.7 * self.cap:
            self.cap *= 2
            self._init_cfg = _dc.replace(self._init_cfg, capacity=self.cap)
            self._jit_cache.clear()
        routed = route_to_shards(arrays, self.S)
        states = []
        for s in range(self.S):
            part = routed[s]
            st = hta.create(self.cap, self.admit)
            keys = K.from_numpy(part["keys"])
            index, ids_plane, next_id, live, new_ids = hta.reinsert(
                st, keys, self.max_probes)
            cbf = st.cbf
            if cbf is not None and "cbf" in part \
                    and part["cbf"].shape == cbf.shape:
                cbf = jnp.asarray(part["cbf"], cbf.dtype)
            alloc = hta.HashTableState(
                index=index, ids=ids_plane,
                next_id=next_id.reshape(1), cbf=cbf)
            row_dest = jnp.where(live, new_ids, self.cap + 1)
            rows = hta.tensible(self.cap, (self.dim,)).rows.at[row_dest].set(
                jnp.asarray(part["values"], jnp.float32), mode="drop",
                unique_indices=True)
            states.append(DHTState(alloc=alloc, table=hta.Tensible(rows)))
        return mh.stack_rowsharded(self.mesh, self.axis, states)

    def snapshot(self, state: DHTState):
        """(keys int64[n], global_ids int32[n]) across shards (reference
        DistributedHashTable.snapshot concatenates partitions)."""
        out_k, out_i = [], []
        key_hi = mh.addressable_blocks(state.alloc.index.key_hi, self.S,
                                       self.cap)
        key_lo = mh.addressable_blocks(state.alloc.index.key_lo, self.S,
                                       self.cap)
        ids = mh.addressable_blocks(state.alloc.ids, self.S, self.cap)
        for s in sorted(key_hi):
            live = ~((key_hi[s] == -1) & (key_lo[s] == -1))
            k64 = ((key_hi[s][live].astype(np.int64) << 32)
                   | key_lo[s][live].astype(np.uint32).astype(np.int64))
            out_k.append(k64)
            out_i.append(ids[s][live] * self.S + s)
        return np.concatenate(out_k), np.concatenate(out_i)
