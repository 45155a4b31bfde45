"""TieredTrainer: multi-tier (HBM + host-DRAM) embedding training.

The trainer-level integration of :mod:`deeprec_tpu.sparse.tiered`
(reference: DeepRec's StorageType DRAM/PMEM multi-tier EmbeddingVariable,
embedding/config.proto:5 + docs/Embedding-Variable.md storage sections,
exercised by modelzoo/features/pmem): tables whose ``StorageOption`` is
``HBM_DRAM`` keep hot rows in device HBM and spill policy-cold rows to a
native host-DRAM KV (C++ arena, utils/native.py), with **full fidelity**
— values, freq/version metadata, and optimizer slot rows all survive
demotion and return intact on promotion.

Mechanics (host at step boundaries, device step stays one jit):

* before each train step, the incoming batch's unique ids probe the host
  tier (pure numpy/C++ — no device sync); hits are scattered back into
  HBM (one small jitted insert) and leave the host tier;
* :meth:`maybe_demote` (call periodically, like ``maybe_grow``) exports
  policy-cold rows (+meta +slot rows) to the host tier and shrinks HBM.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StorageType
from ..sparse import embedding_var as ev
from ..sparse import hashtable as ht
from ..sparse import keys as K
from ..utils.native import HostKV
from ..optim.sparse import permute_slot_state
from .trainer import TableBundle, Trainer, TrainState


def _slot_row_leaves(slot_state, cap1: int):
    """(leaf_path_index, per-row flattened width) for row-shaped leaves."""
    leaves = jax.tree_util.tree_leaves(slot_state)
    out = []
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap1:
            w = int(np.prod(leaf.shape[1:], dtype=np.int64)) if leaf.ndim > 1 else 1
            out.append((i, w, leaf.shape[1:], leaf.dtype))
    return out


class TieredTrainer(Trainer):
    """Trainer with host-DRAM overflow tiers for HBM_DRAM tables."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tiers: Dict[str, HostKV] = {}
        self._payload: Dict[str, list] = {}
        self._insert_fns: Dict = {}  # (name, n_pad, width) -> jitted insert
        for name, coll in self.collections.items():
            if coll.config.storage.storage_type == StorageType.HBM_DRAM:
                # payload per row: values + freq + version + create_step +
                # flattened slot rows (all as f32 bit patterns)
                self.tiers[name] = None  # sized lazily at first demote

    # -- promotion -----------------------------------------------------------
    def train_step(self, state: TrainState, batch) -> TrainState:
        if self.tiers:
            state = self._promote_for_batch(state, batch)
        return super().train_step(state, batch)

    def _payload_spec(self, name, bundle):
        coll = self.collections[name]
        cap1 = coll.config.capacity + 1
        slots = _slot_row_leaves(bundle.slot, cap1)
        dim = bundle.ev.values.shape[1]  # includes fused slot columns
        width = dim + 3 + sum(w for _, w, _, _ in slots)
        return dim, slots, width

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
        dim, slot_rows, _w = self._payload_spec(name, bundle)
        cache_key = (name, int(keys.hi.shape[0]), int(payload.shape[1]))
        if cache_key in self._insert_fns:
            return self._insert_fns[cache_key](bundle, keys, payload)

        @jax.jit
        def insert(bundle, keys, payload):
            st = bundle.ev
            cap = cfg.capacity
            index, slots, _created = ht.lookup_or_insert(st.index, keys,
                                                         cfg.max_probes)
            live = ~K.is_empty(keys) & (slots != cap)
            dest = jnp.where(live, slots, cap + 1)
            o = 0
            values = st.values.at[dest].set(
                payload[:, :dim].astype(st.values.dtype), mode="drop",
                unique_indices=True)
            o = dim
            freqs = st.freqs.at[dest].set(
                payload[:, o].astype(jnp.int32), mode="drop", unique_indices=True)
            versions = st.versions.at[dest].set(
                payload[:, o + 1].astype(jnp.int32), mode="drop", unique_indices=True)
            create_steps = st.create_steps.at[dest].set(
                payload[:, o + 2].astype(jnp.int32), mode="drop", unique_indices=True)
            o += 3
            leaves = jax.tree_util.tree_leaves(bundle.slot)
            treedef = jax.tree_util.tree_structure(bundle.slot)
            for i, w, shape, dtype in slot_rows:
                part = payload[:, o:o + w].reshape((keys.shape[0],) + shape)
                leaves[i] = leaves[i].at[dest].set(
                    part.astype(dtype), mode="drop", unique_indices=True)
                o += w
            slot = jax.tree_util.tree_unflatten(treedef, leaves)
            return TableBundle(
                ev=st._replace(index=index, values=values, freqs=freqs,
                               versions=versions, create_steps=create_steps),
                slot=slot), live

        self._insert_fns[cache_key] = insert
        return insert(bundle, keys, payload)

    # -- demotion --------------------------------------------------------------
    def maybe_demote(self, state: TrainState) -> TrainState:
        """Export policy-cold rows (values+meta+slot rows) to the host tier
        and shrink HBM. Call between steps at whatever cadence the eviction
        policy implies (e.g. every steps_to_live/2 steps)."""
        new_tables = dict(state.tables)
        changed = False
        gs = int(state.step)
        for name in list(self.tiers):
            coll = self.collections[name]
            cfg = coll.config
            if cfg.evict is None:
                continue
            bundle = new_tables[name]
            cap = cfg.capacity
            key_hi = np.asarray(bundle.ev.index.key_hi)
            key_lo = np.asarray(bundle.ev.index.key_lo)
            occupied = ~((key_hi == -1) & (key_lo == -1))
            versions = np.asarray(bundle.ev.versions)
            # the ONE cold predicate (shared with shrink / checkpoint save)
            cold = ev.cold_mask_np(cfg, np.asarray(bundle.ev.values),
                                   versions, occupied, gs)
            if not cold.any():
                continue
            idx = np.nonzero(cold)[0]
            keys64 = ((key_hi[idx].astype(np.int64) << 32)
                      | key_lo[idx].astype(np.uint32).astype(np.int64))
            dim, slot_rows, width = self._payload_spec(name, bundle)
            if self.tiers[name] is None:
                self.tiers[name] = HostKV(width, capacity_hint=1 << 16)
            payload = np.zeros((idx.shape[0], width), np.float32)
            payload[:, :dim] = np.asarray(bundle.ev.values, np.float32)[idx]
            payload[:, dim] = np.asarray(bundle.ev.freqs)[idx]
            payload[:, dim + 1] = versions[idx]
            payload[:, dim + 2] = np.asarray(bundle.ev.create_steps)[idx]
            o = dim + 3
            leaves = jax.tree_util.tree_leaves(bundle.slot)
            for i, w, shape, dtype in slot_rows:
                payload[:, o:o + w] = np.asarray(
                    leaves[i], np.float32)[idx].reshape(idx.shape[0], -1)
                o += w
            self.tiers[name].upsert(keys64, payload)

            new_ev, perm = ev.shrink(bundle.ev, cfg,
                                     jnp.asarray(gs, jnp.int32))
            slot = permute_slot_state(bundle.slot, perm, cfg.capacity)
            new_tables[name] = TableBundle(ev=new_ev, slot=slot)
            changed = True
        return state._replace(tables=new_tables) if changed else state

    def host_tier_rows(self, name: str) -> int:
        kv = self.tiers.get(name)
        return len(kv) if kv else 0
