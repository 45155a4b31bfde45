"""TieredTrainer: multi-tier (HBM + host-DRAM) embedding training.

The trainer-level integration of the host tier (reference: DeepRec's
StorageType DRAM/PMEM multi-tier EmbeddingVariable,
embedding/config.proto:5 + docs/Embedding-Variable.md storage sections,
exercised by modelzoo/features/pmem): tables whose ``StorageOption`` is
``HBM_DRAM`` keep hot rows in device HBM and spill policy-cold rows to a
native host-DRAM KV (C++ arena, utils/native.py), with **full fidelity**
— values, freq/version metadata, and optimizer slot rows all survive
demotion and return intact on promotion (payload layout:
sparse/tier_payload.py — integer meta round-trips as exact bit patterns).

Mechanics (host at step boundaries, device step stays one jit):

* before each train step, the incoming batch's unique ids probe the host
  tier (pure numpy/C++ — no device sync); hits are scattered back into
  HBM (one small jitted insert) and leave the host tier;
* :meth:`maybe_demote` (call periodically, like ``maybe_grow``) exports
  policy-cold rows (+meta +slot rows) to the host tier and shrinks HBM.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StorageType
from ..sparse import embedding_var as ev
from ..sparse import keys as K
from ..sparse import tier_payload as TP
from ..utils.native import HostKV
from ..optim.sparse import permute_slot_state
from .trainer import TableBundle, Trainer, TrainState


TIERED_STORAGE = (StorageType.HBM_DRAM, StorageType.HBM_DRAM_SSD)


class TierCheckpointMixin:
    """Host-tier persistence hooks, shared by TieredTrainer and
    TieredShardedTrainer. A restart must not lose demoted rows: the
    reference's snapshot spans storage tiers (embedding_var.h:221
    GetSnapshot walks the kv regardless of DRAM/PMEM placement), so the
    checkpoint saver exports/imports these alongside the device tables."""

    def _make_tier(self, name: str, width: int):
        """Build the host store for one table per its StorageOption:
        plain host-DRAM KV, or the DRAM->SSD cascade (TierStack) when the
        config caps the DRAM row budget / names a backing file."""
        from ..utils.native import TierStack
        st = self.collections[name].config.storage
        if st.storage_type == StorageType.HBM_DRAM_SSD:
            import tempfile
            path = st.ssd_path or os.path.join(
                tempfile.gettempdir(),
                f"deeprec_ssd_{name}_{os.getpid()}.arena")
            return TierStack(width, self._tier_version_col(name),
                             st.dram_row_budget, path)
        return HostKV(width, 1 << 16)

    def _tier_version_col(self, name: str) -> int:
        """Version-stamp column inside the packed payload: the values block
        (embedding_dim + fused slot columns) is followed by freq, version,
        create_step (tier_payload layout)."""
        cfg = self.collections[name].config
        return cfg.embedding_dim + cfg.fused_slot_columns + 1

    def export_tiers(self, state, since: Optional[int] = None):
        """name -> (keys int64[n], payload f32[n, W]) for every non-empty
        host tier. ``since`` filters to rows whose (bit-pattern) version
        stamp is >= since — the incremental-save contract; a row demoted
        after the last save carries the version of its final on-device
        update, which that save already captured if it was older."""
        out = {}
        for name, kv in getattr(self, "tiers", {}).items():
            if kv is None or len(kv) == 0:
                continue
            keys, rows = kv.export()
            if since is not None:
                dim = self._payload_spec(name, state.tables[name]).dim
                vers = rows[:, dim + 1].copy().view(np.int32)
                sel = vers >= since
                keys, rows = keys[sel], rows[sel]
            if len(keys):
                out[name] = (keys, rows)
        return out

    def import_tier(self, name: str, keys: np.ndarray, rows: np.ndarray):
        """Upsert restored rows into the host tier (created lazily at the
        restored payload width; newest-wins across base+incremental saves
        because callers import in save order)."""
        if name not in self.tiers:
            return
        if self.tiers[name] is None:
            self.tiers[name] = self._make_tier(name, rows.shape[1])
        self.tiers[name].upsert(keys, rows)


class TieredTrainer(TierCheckpointMixin, Trainer):
    """Trainer with host-DRAM overflow tiers for HBM_DRAM tables."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tiers: Dict[str, HostKV] = {}
        self._insert_fns: Dict = {}  # (name, n_pad, width) -> jitted insert
        for name, coll in self.collections.items():
            if coll.config.storage.storage_type in TIERED_STORAGE:
                self.tiers[name] = None  # sized lazily at first demote

    # -- promotion -----------------------------------------------------------
    def train_step(self, state: TrainState, batch) -> TrainState:
        if self.tiers:
            state = self._promote_for_batch(state, batch)
        return super().train_step(state, batch)

    def _payload_spec(self, name, bundle) -> TP.PayloadSpec:
        coll = self.collections[name]
        cap1 = coll.config.capacity + 1
        return TP.spec(bundle.ev.values.shape[1], bundle.slot, cap1)

    def prepare_probe(self, batch) -> Dict[str, np.ndarray]:
        """Host-side tier-probe ids for each tiered table (pure numpy —
        safe to run in prefetch worker threads alongside prepare_batch).
        Feed the result to :meth:`promote_packed` before the jitted step
        when driving ``_jit_train`` directly (the CLI's staged pipeline);
        :meth:`train_step` does both for you."""
        out = {}
        for name in self.tiers:
            ids = np.unique(self.collections[name].pack_ids_np(batch))
            out[name] = ids[ids != -1]
        return out

    def _promote_for_batch(self, state: TrainState, batch) -> TrainState:
        return self.promote_packed(state, self.prepare_probe(batch))

    def promote_packed(self, state: TrainState,
                       probe: Dict[str, np.ndarray]) -> TrainState:
        new_tables = dict(state.tables)
        changed = False
        for name, kv in self.tiers.items():
            if kv is None or len(kv) == 0:
                continue
            ids = probe[name]
            payload, found = kv.lookup(ids)
            if not found.any():
                continue
            hit_ids = ids[found]
            hit_rows = payload[found]
            # pad to a pow2 width to bound jit retraces
            n = hit_ids.shape[0]
            n_pad = max(8, 1 << (n - 1).bit_length())
            pad_ids = np.full((n_pad,), -1, np.int64)
            pad_ids[:n] = hit_ids
            pad_rows = np.zeros((n_pad, hit_rows.shape[1]), np.float32)
            pad_rows[:n] = hit_rows
            bundle = new_tables[name]
            new_tables[name], live = self._insert_promoted(
                name, bundle, K.from_numpy(pad_ids), jnp.asarray(pad_rows))
            # erase only rows confirmed inserted into HBM: a near-full hash
            # table can refuse placement, and erasing first would lose the
            # demoted training state permanently
            confirmed = np.asarray(live)[:n]
            if confirmed.any():
                kv.erase(hit_ids[confirmed])
            changed = True
        return state._replace(tables=new_tables) if changed else state

    def _insert_promoted(self, name, bundle: TableBundle, keys: K.Keys,
                         payload: jax.Array):
        coll = self.collections[name]
        cfg = coll.config
        spec = self._payload_spec(name, bundle)
        cache_key = (name, int(keys.hi.shape[0]), int(payload.shape[1]),
                     cfg.capacity)
        if cache_key not in self._insert_fns:
            # donate the bundle: without it every promote copies the whole
            # table (values+slots+meta, ~300MB at 2M rows) — the soak's
            # promotion-storm fences were dominated by exactly that copy
            self._insert_fns[cache_key] = jax.jit(
                lambda b, k, p: TP.scatter(b, cfg, spec, k, p),
                donate_argnums=(0,))
        return self._insert_fns[cache_key](bundle, keys, payload)

    # -- demotion --------------------------------------------------------------
    def maybe_demote(self, state: TrainState) -> TrainState:
        """Export cold rows (values+meta+slot rows) to the host tier and
        shrink HBM. "Cold" is the eviction-policy predicate PLUS HBM-budget
        pressure: when ``StorageOption.hbm_capacity`` caps resident rows,
        the least-recently-touched surviving rows are demoted too (the
        reference's BatchCache LRU over multi-tier ValuePtrs,
        embedding/cache.h) — so a table can tier with NO eviction policy at
        all. Call between steps at whatever cadence the policy implies
        (e.g. every steps_to_live/2 steps)."""
        new_tables = dict(state.tables)
        changed = False
        gs = int(state.step)
        for name in list(self.tiers):
            coll = self.collections[name]
            cfg = coll.config
            budget = cfg.storage.hbm_capacity
            if cfg.evict is None and budget <= 0:
                continue
            bundle = new_tables[name]
            key_hi = np.asarray(bundle.ev.index.key_hi)
            key_lo = np.asarray(bundle.ev.index.key_lo)
            occupied = ~((key_hi == -1) & (key_lo == -1))
            versions = np.asarray(bundle.ev.versions)
            freqs = np.asarray(bundle.ev.freqs)
            # the ONE cold predicate (shared with shrink / checkpoint save)
            cold = ev.cold_mask_np(cfg, np.asarray(bundle.ev.values),
                                   versions, occupied, gs)
            cold = ev.budget_cold_np(cfg, versions, freqs, occupied, cold,
                                     budget)
            if not cold.any():
                continue
            idx = np.nonzero(cold)[0]
            keys64 = ((key_hi[idx].astype(np.int64) << 32)
                      | key_lo[idx].astype(np.uint32).astype(np.int64))
            spec = self._payload_spec(name, bundle)
            if self.tiers[name] is None:
                self.tiers[name] = self._make_tier(name, spec.width)
            payload = TP.pack_np(
                spec, idx, np.asarray(bundle.ev.values),
                freqs, versions,
                np.asarray(bundle.ev.create_steps),
                [np.asarray(l) for l in jax.tree_util.tree_leaves(bundle.slot)])
            self.tiers[name].upsert(keys64, payload)

            # shrink drops EXACTLY the rows just exported (keep_mask), so
            # budget-demoted rows leave HBM and the tier can never hold a
            # row that still trains on device
            new_ev, perm = ev.shrink(bundle.ev, cfg,
                                     jnp.asarray(gs, jnp.int32),
                                     keep_mask=jnp.asarray(~cold))
            slot = permute_slot_state(bundle.slot, perm, cfg.capacity,
                                      fills=self.sparse_optimizers[name].fills)
            new_tables[name] = bundle._replace(ev=new_ev, slot=slot)
            changed = True
        return state._replace(tables=new_tables) if changed else state

    def host_tier_rows(self, name: str) -> int:
        kv = self.tiers.get(name)
        return len(kv) if kv else 0
