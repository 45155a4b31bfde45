"""TieredShardedTrainer: host-DRAM overflow tiers for row-sharded tables.

Combines the two M6 capabilities (SURVEY.md §7): row-sharded tables over a
device mesh (parallel/trainer.py) and HBM + host-DRAM multi-tier storage
(train/tiered_trainer.py). The host tier is per-process; rows are keyed by
feature id, and promotion/demotion respect the mesh's owner routing
(parallel/sharded._owner_of) so a promoted row lands on the shard that
serves it.

Mechanics (single-controller; on multi-host pods each process manages the
tier for its own shards):

* **promote**: before a step, the batch's unique ids probe the host tier;
  hits are bucketed by owner shard and inserted by one jitted shard_map
  (each shard claims its bucket's keys and scatters the payload rows);
  rows whose insert the shard refused (index full) stay in the tier.
* **demote**: between steps, per-shard policy-cold rows are exported to
  the tier and each shard shrinks (index rebuild) — one jitted shard_map.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import StorageType
from ..sparse import embedding_var as ev
from ..sparse import hashtable as ht
from ..sparse import keys as K
from ..optim.sparse import permute_slot_state
from ..train.trainer import TableBundle, TrainState
from ..utils.native import HostKV
from .sharded import OWNER_SEED
from .trainer import ShardedTrainer


class TieredShardedTrainer(ShardedTrainer):
    """ShardedTrainer with host-DRAM overflow tiers for HBM_DRAM tables."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tiers: Dict[str, HostKV] = {}
        self._promote_fns: Dict = {}
        self._demote_fns: Dict = {}
        for name, coll in self.collections.items():
            if coll.config.storage.storage_type == StorageType.HBM_DRAM:
                self.tiers[name] = None  # sized lazily (row width)

    # -- step wrapper -------------------------------------------------------
    def train_step(self, state: TrainState, batch) -> TrainState:
        if self.tiers:
            state = self._promote_for_batch(state, batch)
        return super().train_step(state, batch)

    # -- promotion ------------------------------------------------------------
    def _promote_for_batch(self, state: TrainState, batch) -> TrainState:
        new_tables = dict(state.tables)
        changed = False
        for name, kv in self.tiers.items():
            if kv is None or len(kv) == 0:
                continue
            coll = self.collections[name]
            ids = np.unique(coll.pack_ids_np(batch))
            ids = ids[ids != -1]
            payload, found = kv.lookup(ids)
            if not found.any():
                continue
            hit_ids = ids[found]
            hit_rows = payload[found]
            # bucket hits by owner shard; pad buckets to a shared pow2
            own = (K.hash32_np(hit_ids, seed=OWNER_SEED)
                   % np.uint32(self.S)).astype(np.int64)
            per = max(int(np.bincount(own, minlength=self.S).max()), 1)
            n_pad = max(8, 1 << (per - 1).bit_length())
            bk = np.full((self.S, n_pad), -1, np.int64)
            br = np.zeros((self.S, n_pad, hit_rows.shape[1]), np.float32)
            fill = np.zeros(self.S, np.int64)
            pos = np.zeros(len(hit_ids), np.int64)
            for i, s in enumerate(own):
                pos[i] = fill[s]
                bk[s, fill[s]] = hit_ids[i]
                br[s, fill[s]] = hit_rows[i]
                fill[s] += 1
            bundle, live = self._insert_promoted(
                name, new_tables[name], bk, br, int(np.asarray(state.step)))
            new_tables[name] = bundle
            live = np.asarray(live)  # [S, n_pad]
            # erase only rows confirmed inserted (a full shard can refuse)
            confirmed = live[own, pos]
            if confirmed.any():
                kv.erase(hit_ids[confirmed])
            changed = True
        return state._replace(tables=new_tables) if changed else state

    def _insert_promoted(self, name, bundle: TableBundle,
                         bucket_keys: np.ndarray, bucket_rows: np.ndarray,
                         gs: int):
        coll = self.collections[name]
        cfg = coll.config
        key = (name, bucket_keys.shape[1], bucket_rows.shape[2])
        if key not in self._promote_fns:
            axis = self.axis
            bundle_spec = self._bundle_spec(name)

            def per_shard(bundle, khi, klo, rows, step):
                st = bundle.ev
                keys = K.Keys(khi[0], klo[0])
                index, slots, _ = ht.lookup_or_insert(st.index, keys,
                                                      cfg.max_probes)
                live = ~K.is_empty(keys) & (slots != cfg.capacity)
                dest = jnp.where(live, slots, cfg.capacity + 1)
                values = st.values.at[dest].set(
                    rows[0].astype(st.values.dtype), mode="drop",
                    unique_indices=True)
                # stamp the current step so a fresh promotion is not
                # immediately re-evicted by GlobalStepEvict
                versions = st.versions.at[dest].set(
                    step[0], mode="drop", unique_indices=True)
                return bundle._replace(ev=st._replace(
                    index=index, values=values, versions=versions)), live[None]

            self._promote_fns[key] = jax.jit(jax.shard_map(
                per_shard, mesh=self.mesh,
                in_specs=(bundle_spec, P(axis, None), P(axis, None),
                          P(axis, None, None), P(axis)),
                out_specs=(bundle_spec, P(axis, None)), check_vma=False))
        hi, lo = K.split_np(bucket_keys)
        steps = jax.device_put(jnp.full((self.S,), gs, jnp.int32),
                               NamedSharding(self.mesh, P(self.axis)))
        return self._promote_fns[key](bundle, jnp.asarray(hi),
                                      jnp.asarray(lo),
                                      jnp.asarray(bucket_rows), steps)

    def _bundle_spec(self, name):
        return super()._table_spec(self.collections[name],
                                   self._slot_examples[name])

    # -- demotion ---------------------------------------------------------------
    def maybe_demote(self, state: TrainState) -> TrainState:
        """Per-shard policy-cold rows -> host tier; each shard shrinks."""
        new_tables = dict(state.tables)
        changed = False
        gs = int(state.step)
        for name in list(self.tiers):
            coll = self.collections[name]
            cfg = coll.config
            if cfg.evict is None:
                continue
            bundle = new_tables[name]
            cap1 = cfg.capacity + 1
            cap = cfg.capacity
            key_hi = np.asarray(bundle.ev.index.key_hi).reshape(self.S, cap)
            key_lo = np.asarray(bundle.ev.index.key_lo).reshape(self.S, cap)
            values = np.asarray(bundle.ev.values).reshape(self.S, cap1, -1)
            versions = np.asarray(bundle.ev.versions).reshape(self.S, cap1)
            any_cold = False
            for s in range(self.S):
                occupied = ~((key_hi[s] == -1) & (key_lo[s] == -1))
                cold = ev.cold_mask_np(cfg, values[s], versions[s],
                                       occupied, gs)
                if not cold.any():
                    continue
                any_cold = True
                idx = np.nonzero(cold)[0]
                keys64 = ((key_hi[s, idx].astype(np.int64) << 32)
                          | key_lo[s, idx].astype(np.uint32).astype(np.int64))
                if self.tiers[name] is None:
                    self.tiers[name] = HostKV(values.shape[2], 1 << 16)
                self.tiers[name].upsert(keys64,
                                        values[s, idx].astype(np.float32))
            if not any_cold:
                continue
            new_tables[name] = self._shrink_sharded(name, bundle, gs)
            changed = True
        return state._replace(tables=new_tables) if changed else state

    def _shrink_sharded(self, name, bundle: TableBundle, gs: int):
        coll = self.collections[name]
        cfg = coll.config
        if name not in self._demote_fns:
            bundle_spec = self._bundle_spec(name)

            def per_shard(bundle, step):
                new_ev, perm = ev.shrink(bundle.ev, cfg, step[0])
                slot = permute_slot_state(bundle.slot, perm, cfg.capacity)
                return bundle._replace(ev=new_ev, slot=slot)

            self._demote_fns[name] = jax.jit(jax.shard_map(
                per_shard, mesh=self.mesh,
                in_specs=(bundle_spec, P(self.axis)),
                out_specs=bundle_spec, check_vma=False))
        steps = jnp.full((self.S,), gs, jnp.int32)
        steps = jax.device_put(steps, NamedSharding(self.mesh, P(self.axis)))
        return self._demote_fns[name](bundle, steps)

    def host_tier_rows(self, name: str) -> int:
        kv = self.tiers.get(name)
        return len(kv) if kv else 0
