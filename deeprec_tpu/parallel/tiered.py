"""TieredShardedTrainer: host-DRAM overflow tiers for row-sharded tables.

Combines the two M6 capabilities (SURVEY.md §7): row-sharded tables over a
device mesh (parallel/trainer.py) and HBM + host-DRAM multi-tier storage
(train/tiered_trainer.py). The host tier is per-process; rows are keyed by
feature id, and promotion/demotion respect the mesh's owner routing
(parallel/sharded._owner_of) so a promoted row lands on the shard that
serves it. Payloads carry the FULL row state — values, freq/version/
create_step (exact int bit patterns) and optimizer slot rows — via the
shared layout in sparse/tier_payload.py, so the sharded tier path has the
same fidelity as the single-device one.

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
from ..sparse import keys as K
from ..sparse import tier_payload as TP
from ..optim.sparse import permute_slot_state
from ..train.tiered_trainer import TIERED_STORAGE, TierCheckpointMixin
from ..train.trainer import TableBundle, TrainState
from ..utils.native import HostKV
from . import multihost as mh
from .sharded import OWNER_SEED
from .trainer import ShardedTrainer


class TieredShardedTrainer(TierCheckpointMixin, ShardedTrainer):
    """ShardedTrainer with host-DRAM overflow tiers for HBM_DRAM tables."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tiers: Dict[str, HostKV] = {}
        self._promote_fns: Dict = {}
        self._demote_fns: Dict = {}
        for name, coll in self.collections.items():
            if coll.config.storage.storage_type in TIERED_STORAGE:
                self.tiers[name] = None  # sized lazily (row width)

    # -- step wrapper -------------------------------------------------------
    def train_step(self, state: TrainState, batch) -> TrainState:
        if self.tiers:
            state = self._promote_for_batch(state, batch)
        return super().train_step(state, batch)

    def _payload_spec(self, name, bundle) -> TP.PayloadSpec:
        # row leaves in the stacked global view have leading dim S*(cap+1)
        cap1 = self.collections[name].config.capacity + 1
        return TP.spec(bundle.ev.values.shape[-1], bundle.slot, self.S * cap1)

    # -- promotion ------------------------------------------------------------
    def prepare_probe(self, batch) -> Dict[str, np.ndarray]:
        """Process-local tier-probe ids per tiered table (pure numpy — safe
        in prefetch worker threads). Collectives happen in
        :meth:`promote_packed`, NOT here."""
        out = {}
        for name in self.tiers:
            ids = np.unique(self.collections[name].pack_ids_np(batch))
            out[name] = ids[ids != -1]
        return out

    def _promote_for_batch(self, state: TrainState, batch) -> TrainState:
        return self.promote_packed(state, self.prepare_probe(batch))

    def promote_packed(self, state: TrainState,
                       probe: Dict[str, np.ndarray]) -> TrainState:
        """Probe the host tier(s) for the batch's ids; promote hits onto
        their owner shards. Multi-process: tiers are per-process and hold
        only locally-owned keys, but the batch is per-process too — the ids
        are allgathered so the OWNER process sees every id in the global
        batch (otherwise a demoted key recreated via the exchange would
        later be clobbered by its stale tier row). Every branch below that
        decides whether to run the collective insert is agreed globally."""
        new_tables = dict(state.tables)
        changed = False
        for name, kv in self.tiers.items():
            # global skip: no process has tier rows for this table
            if mh.all_max(len(kv) if kv is not None else 0) == 0:
                continue
            ids = mh.allgather_varlen(probe[name])
            ids = np.unique(ids)
            if kv is not None and len(kv):
                payload, found = kv.lookup(ids)
            else:
                payload = np.zeros((len(ids), 1), np.float32)
                found = np.zeros((len(ids),), bool)
            hit_ids = ids[found]
            hit_rows = payload[found]
            lo, hi_ = mh.local_shard_range(self.mesh, self.axis, self.S)
            S_local = hi_ - lo
            # bucket hits by LOCAL owner shard; shared global pad width
            own = (K.hash32_np(hit_ids, seed=OWNER_SEED)
                   % np.uint32(self.S)).astype(np.int64)
            local = (own >= lo) & (own < hi_)  # tier may hold foreign keys
            #                                    after a resharded restore
            hit_ids, hit_rows, own = hit_ids[local], hit_rows[local], own[local]
            per = int(np.bincount(own - lo, minlength=S_local).max()) \
                if len(own) else 0
            n_pad = mh.all_max(max(8, 1 << max(per - 1, 0).bit_length()))
            if mh.all_max(len(own)) == 0:
                continue
            width = self._payload_spec(name, new_tables[name]).width
            bk = np.full((S_local, n_pad), -1, np.int64)
            br = np.zeros((S_local, n_pad, width), np.float32)
            # vectorized bucket packing: rank within each owner group via a
            # stable sort + searchsorted (a restore can land 100k+ tier rows
            # in one hot batch; a per-row python loop would crawl)
            shard = own - lo
            order = np.argsort(shard, kind="stable")
            shard_sorted = shard[order]
            first = np.searchsorted(shard_sorted, shard_sorted, side="left")
            pos = np.empty(len(shard), np.int64)
            pos[order] = np.arange(len(shard)) - first
            bk[shard, pos] = hit_ids
            br[shard, pos] = hit_rows
            bundle, live = self._insert_promoted(name, new_tables[name], bk, br)
            new_tables[name] = bundle
            # local rows of the [S, n_pad] live mask
            live_l = mh.addressable_blocks(live, self.S, 1)
            live_np = np.concatenate([live_l[s] for s in range(lo, hi_)])
            # erase only rows confirmed inserted (a full shard can refuse)
            confirmed = live_np[own - lo, pos] if len(own) else \
                np.zeros((0,), bool)
            if confirmed.any():
                kv.erase(hit_ids[confirmed])
            changed = True
        return state._replace(tables=new_tables) if changed else state

    def _insert_promoted(self, name, bundle: TableBundle,
                         bucket_keys: np.ndarray, bucket_rows: np.ndarray):
        """``bucket_keys/rows`` are the LOCAL shards' buckets
        ([S_local, n_pad(, W)]); assembled into global arrays here."""
        coll = self.collections[name]
        cfg = coll.config
        spec = self._payload_spec(name, bundle)
        key = (name, bucket_keys.shape[1], bucket_rows.shape[2], cfg.capacity)
        if key not in self._promote_fns:
            axis = self.axis
            bundle_spec = self._bundle_spec(name)

            def per_shard(bundle, khi, klo, rows):
                keys = K.Keys(khi[0], klo[0])
                bundle, live = TP.scatter(bundle, cfg, spec, keys, rows[0])
                return bundle, live[None]

            self._promote_fns[key] = jax.jit(jax.shard_map(
                per_shard, mesh=self.mesh,
                in_specs=(bundle_spec, P(axis, None), P(axis, None),
                          P(axis, None, None)),
                out_specs=(bundle_spec, P(axis, None)), check_vma=False),
                donate_argnums=(0,))  # in-place insert; see tiered_trainer
        hi, lo = K.split_np(bucket_keys)
        g = lambda spec_, x: mh.globalize(self.mesh, spec_, x)
        return self._promote_fns[key](bundle,
                                      g(P(self.axis, None), hi),
                                      g(P(self.axis, None), lo),
                                      g(P(self.axis, None, None), bucket_rows))

    def _bundle_spec(self, name):
        return super()._table_spec(self.collections[name],
                                   self._slot_examples[name])

    # -- demotion ---------------------------------------------------------------
    def maybe_demote(self, state: TrainState) -> TrainState:
        """Per-shard cold rows -> host tier (full payload); each shard
        shrinks. "Cold" = eviction policy + HBM-budget pressure
        (``StorageOption.hbm_capacity`` is the TOTAL resident-row budget
        for the table, split evenly across the S shards — LRU by version,
        freq tiebreak, like the single-device path). Multi-process: every
        process demotes only its addressable shards into its own tier; the
        shrink decision is agreed globally (the shard_map rebuild is a
        collective every process must enter)."""
        new_tables = dict(state.tables)
        changed = False
        gs = int(state.step)
        for name in list(self.tiers):
            coll = self.collections[name]
            cfg = coll.config
            budget = cfg.storage.hbm_capacity
            if cfg.evict is None and budget <= 0:
                continue
            shard_budget = max(1, budget // self.S) if budget > 0 else 0
            bundle = new_tables[name]
            cap1 = cfg.capacity + 1
            cap = cfg.capacity
            spec = self._payload_spec(name, bundle)
            key_hi = mh.addressable_blocks(bundle.ev.index.key_hi, self.S, cap)
            key_lo = mh.addressable_blocks(bundle.ev.index.key_lo, self.S, cap)
            values = mh.addressable_blocks(bundle.ev.values, self.S, cap1)
            freqs = mh.addressable_blocks(bundle.ev.freqs, self.S, cap1)
            versions = mh.addressable_blocks(bundle.ev.versions, self.S, cap1)
            create_steps = mh.addressable_blocks(bundle.ev.create_steps,
                                                 self.S, cap1)
            # per-shard views of the row-shaped slot leaves (leading dim
            # cap1 per shard, matching tier_payload.pack_np)
            leaves = jax.tree_util.tree_leaves(bundle.slot)
            slot_blocks = {sl.index: mh.addressable_blocks(leaves[sl.index],
                                                           self.S, cap1)
                           for sl in spec.slot_rows}

            def shard_leaves(s):
                return [slot_blocks[i][s] if i in slot_blocks else None
                        for i in range(len(leaves))]

            any_cold = False
            keep_local = []
            for s in sorted(key_hi):
                occupied = ~((key_hi[s] == -1) & (key_lo[s] == -1))
                cold = ev.cold_mask_np(cfg, values[s], versions[s],
                                       occupied, gs)
                cold = ev.budget_cold_np(cfg, versions[s], freqs[s],
                                         occupied, cold, shard_budget)
                keep_local.append(~cold)
                if not cold.any():
                    continue
                any_cold = True
                idx = np.nonzero(cold)[0]
                keys64 = ((key_hi[s][idx].astype(np.int64) << 32)
                          | key_lo[s][idx].astype(np.uint32).astype(np.int64))
                if self.tiers[name] is None:
                    self.tiers[name] = self._make_tier(name, spec.width)
                payload = TP.pack_np(spec, idx, values[s], freqs[s],
                                     versions[s], create_steps[s],
                                     shard_leaves(s))
                self.tiers[name].upsert(keys64, payload)
            if not mh.all_max(int(any_cold)):
                continue
            new_tables[name] = self._shrink_sharded(
                name, bundle, gs, np.stack(keep_local))
            changed = True
        return state._replace(tables=new_tables) if changed else state

    def _shrink_sharded(self, name, bundle: TableBundle, gs: int,
                        keep_local: np.ndarray):
        """``keep_local`` is [S_local, cap] bool — each shard drops exactly
        the rows its process just exported to the tier (the host-side cold
        predicate is authoritative; recomputing it on device could diverge
        on the float L2 norm and strand a row in both tiers)."""
        coll = self.collections[name]
        cfg = coll.config
        fills = self.sparse_optimizers[name].fills
        fn_key = (name, cfg.capacity)  # capacity can grow between calls
        if fn_key not in self._demote_fns:
            bundle_spec = self._bundle_spec(name)

            def per_shard(bundle, step, keep):
                new_ev, perm = ev.shrink(bundle.ev, cfg, step[0],
                                         keep_mask=keep[0])
                slot = permute_slot_state(bundle.slot, perm, cfg.capacity,
                                          fills=fills)
                return bundle._replace(ev=new_ev, slot=slot)

            self._demote_fns[fn_key] = jax.jit(jax.shard_map(
                per_shard, mesh=self.mesh,
                in_specs=(bundle_spec, P(self.axis), P(self.axis, None)),
                out_specs=bundle_spec, check_vma=False))
        steps = mh.host_to_global(self.mesh, P(self.axis),
                                  np.full((self.S,), gs, np.int32))
        keep = mh.globalize(self.mesh, P(self.axis, None), keep_local)
        return self._demote_fns[fn_key](bundle, steps, keep)

    def host_tier_rows(self, name: str) -> int:
        kv = self.tiers.get(name)
        return len(kv) if kv else 0

    def import_tier(self, name: str, keys: np.ndarray, rows: np.ndarray):
        """Per-process tiers hold only locally-owned keys; a resharded
        restore filters the merged tier parts by owner here."""
        if name not in self.tiers or len(keys) == 0:
            return
        lo, hi = mh.local_shard_range(self.mesh, self.axis, self.S)
        own = (K.hash32_np(keys, seed=OWNER_SEED)
               % np.uint32(self.S)).astype(np.int64)
        local = (own >= lo) & (own < hi)
        if not local.any():
            return
        super().import_tier(name, keys[local], rows[local])
