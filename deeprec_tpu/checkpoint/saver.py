"""Checkpoint save/restore for trainers: full + incremental, reshard-safe.

The TPU-native counterpart of the reference's EV-aware ``Saver``
(python/training/saver.py:170-229 BulkSaverBuilder), ``IncrementalSaver``
(python/training/incremental_saver.py:77,297,409,480) and the restore ops
``KvResourceImportV2`` (kernels/kv_variable_ops.cc:549) /
``KvResourceIncrImport`` (:720). Differences in mechanism, parity in
semantics:

* **Full save**: per table, live rows are compacted on host into dense
  {keys, values, versions, freqs, create_steps} arrays + optimizer slot
  rows. Eviction policy is applied at save time exactly like
  ``EmbeddingVar::Shrink`` at save (embedding_var.h:264-313).
* **Incremental save**: rows with ``version >= last_save_step`` — the
  version stamp written by every lookup plays the role of the reference's
  ``RecordSparseIndices`` recorder (incr_save_restore_ops.h:329); no extra
  recording pass is needed.
* **Restore**: latest full + replay of newer incrementals
  (``recover_incr_checkpoints`` semantics, incremental_saver.py:480).
  Rows are re-routed by the runtime's owner hash, so the shard count may
  change between save and restore; capacities auto-grow if the restored
  row count needs it.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EmbeddingVariableConfig, GlobalStepEvict, L2WeightEvict
from ..sparse import embedding_var as ev
from ..sparse import hashtable as ht
from ..sparse import keys as K
from . import format as F

OWNER_SEED = 13  # must match parallel/sharded._owner_of


# ---------------------------------------------------------------------------
# Host-side snapshot (device -> compacted numpy)


def _keys64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    return (hi.astype(np.int64) << np.int64(32)) | (
        lo.astype(np.uint32).astype(np.int64))


from ..parallel.multihost import addressable_blocks as _blocks


def table_snapshot_host(
    config: EmbeddingVariableConfig,
    ev_state,
    slot_state,
    num_shards: int = 1,
    since_step: Optional[int] = None,
    evict: bool = True,
    global_step: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Compact live (and, for incrementals, recently-touched) rows of a
    table — possibly a stacked multi-shard table — into flat numpy arrays.
    """
    cap = config.capacity
    cap1 = cap + 1
    S = num_shards
    if since_step is not None and not config.version_tracked:
        # light-layout table (no version stamps): a version-delta selection
        # would silently drop every row — degrade to a full-row section.
        # The reference's light EVs likewise need the recorder op for true
        # deltas; set track_version=True for version-delta incrementals.
        import warnings
        warnings.warn(
            f"table {config.name!r} has no version tracking "
            "(track_version/evict unset): incremental save falls back to "
            "all live rows for it", stacklevel=2)
        since_step = None

    # per-shard host blocks: on a multi-process mesh each process sees (and
    # saves) only its addressable shards — the per-part save unit
    key_hi = _blocks(ev_state.index.key_hi, S, cap)
    key_lo = _blocks(ev_state.index.key_lo, S, cap)
    values = _blocks(ev_state.values, S, cap1)
    freqs = _blocks(ev_state.freqs, S, cap1)
    versions = _blocks(ev_state.versions, S, cap1)
    create_steps = _blocks(ev_state.create_steps, S, cap1)
    local_shards = sorted(key_hi.keys())

    slot_rows = []  # (name, dict shard -> [cap1, ...])
    slot_scalars = {}
    for name, leaf in F.slot_leaf_names(slot_state):
        shape0 = leaf.shape[0] if getattr(leaf, "ndim", 0) >= 1 else None
        if shape0 == S * cap1:
            slot_rows.append((name, _blocks(leaf, S, cap1)))
        else:
            slot_scalars[f"scalar__{name}"] = np.asarray(leaf)

    sel_keys, sel_rows = [], {name: [] for name, _ in slot_rows}
    sel_vals, sel_freqs, sel_vers, sel_cs = [], [], [], []
    for s in local_shards:
        keys = _keys64(key_hi[s], key_lo[s])
        live = keys != np.int64(-1)
        if evict and config.evict is not None and global_step is not None:
            pol = config.evict
            if isinstance(pol, GlobalStepEvict) and pol.steps_to_live > 0:
                live &= (global_step - versions[s][:cap]) < pol.steps_to_live
            elif isinstance(pol, L2WeightEvict) and pol.l2_weight_threshold > 0:
                norms = np.sum(values[s][:cap, :config.embedding_dim]
                               .astype(np.float64) ** 2, axis=-1)
                live &= norms >= pol.l2_weight_threshold
        if since_step is not None:
            live &= versions[s][:cap] >= since_step
        idx = np.nonzero(live)[0]
        sel_keys.append(keys[idx])
        sel_vals.append(values[s][idx])
        sel_freqs.append(freqs[s][idx])
        sel_vers.append(versions[s][idx])
        sel_cs.append(create_steps[s][idx])
        for name, arr in slot_rows:
            sel_rows[name].append(arr[s][idx])

    out = {
        "keys": np.concatenate(sel_keys),
        "values": np.concatenate(sel_vals),
        "freqs": np.concatenate(sel_freqs),
        "versions": np.concatenate(sel_vers),
        "create_steps": np.concatenate(sel_cs),
    }
    for name, parts in sel_rows.items():
        out[f"slot__{name}"] = np.concatenate(parts)
    out.update(slot_scalars)
    if ev_state.cbf is not None:
        out["cbf_shards"] = np.asarray(S, np.int32)
        if (not isinstance(ev_state.cbf, jax.Array)
                or ev_state.cbf.is_fully_addressable):
            out["cbf"] = np.asarray(ev_state.cbf)
        else:
            # multi-process: every process saves its addressable shards'
            # sketch blocks (reference checkpoints bloom counters
            # unconditionally, kv_variable_ops.cc import/export) — without
            # them a restore silently resets pre-admission counts and
            # admission behavior diverges by deployment size
            m = ev_state.cbf.shape[0] // S
            for s, blk in _blocks(ev_state.cbf, S, m).items():
                out[f"cbf__shard{s:03d}"] = blk
    return out


# ---------------------------------------------------------------------------
# Restore builders (numpy -> device state)


def _scatter_table(state, slot_state, opt, config, arrays) -> Tuple[Any, Any]:
    """Insert ``arrays`` rows into (state, slot_state). Shared by fresh
    restore and incremental replay."""
    cap = config.capacity
    keys = K.from_numpy(arrays["keys"])
    index, slots, _created = ht.lookup_or_insert(state.index, keys,
                                                 config.max_probes)
    live = ~K.is_empty(keys) & (slots != cap)
    dest = jnp.where(live, slots, cap + 1)  # OOB -> dropped; unique
    values = state.values.at[dest].set(
        jnp.asarray(arrays["values"], state.values.dtype), mode="drop",
        unique_indices=True)
    freqs = state.freqs.at[dest].set(
        jnp.asarray(arrays["freqs"], jnp.int32), mode="drop",
        unique_indices=True)
    versions = state.versions.at[dest].set(
        jnp.asarray(arrays["versions"], jnp.int32), mode="drop",
        unique_indices=True)
    create_steps = state.create_steps.at[dest].set(
        jnp.asarray(arrays["create_steps"], jnp.int32), mode="drop",
        unique_indices=True)

    new_slot = {}
    flat = F.slot_leaf_names(slot_state)
    treedef = jax.tree_util.tree_structure(slot_state)
    leaves = []
    for name, leaf in flat:
        rk, sk = f"slot__{name}", f"scalar__{name}"
        if rk in arrays:
            leaves.append(leaf.at[dest].set(
                jnp.asarray(arrays[rk], leaf.dtype), mode="drop",
                unique_indices=True))
        elif sk in arrays:
            leaves.append(jnp.asarray(arrays[sk], leaf.dtype))
        else:
            leaves.append(leaf)
    new_slot = jax.tree_util.tree_unflatten(treedef, leaves)

    cbf = state.cbf
    if cbf is not None and "cbf" in arrays and arrays["cbf"].shape == cbf.shape:
        # exact CBF restore only when the shard count is unchanged; counts of
        # never-admitted keys are per-shard sketches and cannot be re-routed.
        cbf = jnp.asarray(arrays["cbf"], cbf.dtype)
    new_state = ev.EVState(index=index, values=values, freqs=freqs,
                           versions=versions, create_steps=create_steps,
                           cbf=cbf)
    return new_state, new_slot


def last_wins_sel(keys: np.ndarray) -> np.ndarray:
    """Indices selecting the LAST occurrence of each key in ``keys``
    (ascending original order). The one definition of part-merge
    semantics: parts are ordered oldest-first, so the newest row wins."""
    if keys.size == 0:
        return np.empty(0, np.int64)
    order = np.arange(keys.shape[0])
    srt = np.lexsort((order, keys))
    ks = keys[srt]
    last = np.r_[ks[1:] != ks[:-1], True]
    return np.sort(srt[last])


def needed_capacity(n_rows: int, current: int, load: float = 0.6) -> int:
    cap = current
    while n_rows > load * cap:
        cap *= 2
    return cap


def _cbf_for_shard(arrays: Dict[str, np.ndarray], s: int, num_shards: int
                   ) -> Optional[np.ndarray]:
    """Per-shard CBF sketch at restore. Same shard count -> exact block.
    Different count -> the elementwise SUM of all saved blocks: count-min
    sketches over disjoint key sets sum to a valid (conservative) sketch
    of the union, so counts survive a reshard — a key may be admitted
    slightly early from collision overestimates, never late."""
    cbf_shards = int(arrays["cbf_shards"]) if "cbf_shards" in arrays else 0
    blocks = [arrays[k] for k in sorted(arrays)
              if k.startswith("cbf__shard")]
    if "cbf" in arrays:
        full = arrays["cbf"]
        if cbf_shards == num_shards:
            m = full.shape[0] // num_shards
            return full[s * m:(s + 1) * m]
        # reshard: fold the stacked per-shard sketches into one union
        if cbf_shards > 1:
            m = full.shape[0] // cbf_shards
            return full.reshape(cbf_shards, m).sum(axis=0, dtype=full.dtype)
        return full
    if blocks:
        if cbf_shards == num_shards and len(blocks) == num_shards:
            return blocks[s]
        return np.sum(np.stack(blocks), axis=0, dtype=blocks[0].dtype)
    return None


def route_to_shards(arrays: Dict[str, np.ndarray], num_shards: int
                    ) -> List[Dict[str, np.ndarray]]:
    """Split compacted rows by the runtime owner hash (reshard-safe)."""
    own = K.hash32_np(arrays["keys"], seed=OWNER_SEED) % np.uint32(num_shards)
    out = []
    skip = {"cbf", "cbf_shards"}
    skip |= {k for k in arrays if k.startswith("cbf__shard")}
    row_keys = [k for k, v in arrays.items()
                if k == "keys" or (hasattr(v, "ndim") and v.ndim >= 1
                                   and v.shape[0] == arrays["keys"].shape[0]
                                   and k not in skip)]
    # reshard case: every shard gets the same union fold — compute once
    cbf_shards = int(arrays["cbf_shards"]) if "cbf_shards" in arrays else 0
    cbf_union = (_cbf_for_shard(arrays, 0, num_shards)
                 if cbf_shards != num_shards else None)
    for s in range(num_shards):
        sel = np.nonzero(own == s)[0]
        shard = {k: (arrays[k][sel] if k in row_keys else arrays[k])
                 for k in arrays if k not in skip}
        cbf = (cbf_union if cbf_union is not None
               else _cbf_for_shard(arrays, s, num_shards))
        if cbf is not None:
            shard["cbf"] = cbf
        out.append(shard)
    return out


# ---------------------------------------------------------------------------
# The manager


class CheckpointManager:
    """Full + incremental checkpointing for ``Trainer`` / ``ShardedTrainer``.

    The ``save_incremental_checkpoint_secs`` workflow of the reference
    (monitored_session.py:476,626) maps to :meth:`maybe_save`:
    full saves every ``full_secs``, incremental saves every ``incr_secs``.
    """

    def __init__(self, directory: str, full_secs: Optional[float] = None,
                 incr_secs: Optional[float] = None, keep: int = 3):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.full_secs = full_secs
        self.incr_secs = incr_secs
        self.keep = keep
        self._last_full_time = time.time()
        self._last_incr_time = time.time()
        self._aux = {}  # name -> (snapshot_fn, restore_fn)
        saves = F.list_saves(directory)
        self._last_save_step = saves[-1]["step"] if saves else None

    # -- auxiliary run state (WorkQueue position etc.) -----------------------
    def attach_aux(self, name: str, snapshot_fn, restore_fn) -> None:
        """Save/restore a JSON-able side state with every checkpoint —
        the SaveableObject channel of the reference's WorkQueue
        (python/ops/work_queue.py:113): restoring an older checkpoint must
        rewind the data position along with the tables. ``snapshot_fn()``
        runs at each save (process 0); ``restore_fn(state)`` runs after a
        successful restore with the NEWEST applied save's snapshot (pass
        ``None`` when the caller already applied it out-of-band, e.g. the
        CLI rewinds its WorkQueue at stream creation, before any item is
        claimed)."""
        self._aux[name] = (snapshot_fn, restore_fn)

    def _write_aux(self, path: str, part) -> None:
        if part not in (None, 0) or not self._aux:
            return
        import json
        for name, (snap, _) in self._aux.items():
            tmp = os.path.join(path, f"aux_{name}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(snap(), f)
            os.replace(tmp, os.path.join(path, f"aux_{name}.json"))

    def _restore_aux(self, newest_path: str) -> None:
        import json
        for name, (_, restore_fn) in self._aux.items():
            if restore_fn is None:
                continue
            p = os.path.join(newest_path, f"aux_{name}.json")
            if os.path.exists(p):
                with open(p) as f:
                    restore_fn(json.load(f))

    # -- save --------------------------------------------------------------
    def _collect(self, trainer, state, since: Optional[int], evict: bool):
        S = getattr(trainer, "S", 1)
        gs = int(state.step)
        tables = {}
        for name, coll in trainer.collections.items():
            b = state.tables[name]
            # collection polymorphism: base EV = the 4-array compacted
            # format; variant collections (multi-hash / adaptive / hash
            # table) declare their own layout via the ckpt_arrays hook
            tables[name] = coll.ckpt_arrays(b, S, since, evict, gs)
        dense_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(
            (state.params, state.opt_state, state.step))]
        # host-tier rows (TieredTrainer / TieredShardedTrainer): demoted
        # rows are training state too — a restart must not lose them
        # (reference embedding_var.h:221 GetSnapshot spans storage tiers)
        export_tiers = getattr(trainer, "export_tiers", None)
        if export_tiers is not None:
            for name, (keys, rows) in export_tiers(state, since=since).items():
                tables[f"__tier__{name}"] = {"keys": keys, "rows": rows}
        return tables, dense_leaves

    def _mp(self):
        """(part, n_parts, barrier) for multi-process saves; every process
        writes the rows of its own addressable shards (the reference's
        per-PS-task bundle shards), process 0 the manifest/dense."""
        if jax.process_count() == 1:
            return None, 1, None
        from ..parallel import multihost
        return jax.process_index(), jax.process_count(), multihost.barrier

    def save(self, trainer, state, evict: bool = True) -> str:
        step = int(state.step)
        tables, dense = self._collect(trainer, state, since=None, evict=evict)
        path = os.path.join(self.directory, F.step_dirname("full", step))
        part, n_parts, barrier = self._mp()
        F.write_save(path, {
            "kind": "full", "step": step,
            "tables": {n: int(t["keys"].shape[0]) if "keys" in t else -1
                       for n, t in tables.items()},
        }, dense, tables, part=part, n_parts=n_parts, barrier=barrier)
        self._write_aux(path, part)
        self._last_save_step = step
        self._last_full_time = time.time()
        if part in (None, 0):
            self._gc()
        return path

    def save_incremental(self, trainer, state) -> str:
        step = int(state.step)
        since = self._last_save_step
        if since is None:
            return self.save(trainer, state)
        tables, dense = self._collect(trainer, state, since=since, evict=False)
        path = os.path.join(self.directory, F.step_dirname("incr", step))
        part, n_parts, barrier = self._mp()
        F.write_save(path, {
            "kind": "incr", "step": step, "since": since,
            "tables": {n: int(t["keys"].shape[0]) if "keys" in t else -1
                       for n, t in tables.items()},
        }, dense, tables, part=part, n_parts=n_parts, barrier=barrier)
        self._write_aux(path, part)
        self._last_save_step = step
        self._last_incr_time = time.time()
        return path

    def maybe_save(self, trainer, state) -> Optional[str]:
        now = time.time()
        if self.full_secs is not None and now - self._last_full_time >= self.full_secs:
            return self.save(trainer, state)
        if self.incr_secs is not None and now - self._last_incr_time >= self.incr_secs:
            return self.save_incremental(trainer, state)
        return None

    def _gc(self):
        import shutil
        saves = F.list_saves(self.directory)
        fulls = [m for m in saves if m["kind"] == "full"]
        if self.keep and len(fulls) > self.keep:
            cutoff = fulls[-self.keep]["step"]  # oldest retained full
            for m in fulls[:-self.keep]:
                shutil.rmtree(m["path"], ignore_errors=True)
            # incrementals at or below the oldest retained full are
            # unreachable by any restore_plan over the kept fulls
            for m in saves:
                if m["kind"] == "incr" and m["step"] <= cutoff:
                    shutil.rmtree(m["path"], ignore_errors=True)
        # superseded same-step saves renamed by write_save — delete only
        # when the base dir exists (a lone .old copy IS the save: the
        # crash-recovery case list_saves handles)
        names = set(os.listdir(self.directory))
        for name in names:
            if ".old." in name and name.split(".old.")[0] in names:
                shutil.rmtree(os.path.join(self.directory, name),
                              ignore_errors=True)

    # -- restore -------------------------------------------------------------
    def restore(self, trainer, state) -> Tuple[Any, bool]:
        """Restore the latest full save + newer incrementals into ``state``
        (a freshly-initialised TrainState used as the structure template).
        Returns (state, restored?). Auto-grows table capacities (and re-jits
        the trainer) when the restored row count requires it.
        """
        base, incrs = F.restore_plan(self.directory)
        if base is None:
            return state, False
        S = getattr(trainer, "S", 1)

        # merged per-table arrays: base + replay determines capacity needs
        loads = [(base, F.read_dense(base["path"]))]
        all_arrays = {name: [F.read_table(base["path"], name)]
                      for name in trainer.collections}
        for m in incrs:
            loads.append((m, F.read_dense(m["path"])))
            for name in trainer.collections:
                all_arrays[name].append(F.read_table(m["path"], name))

        grew = False
        new_tables = {}
        for name, coll in trainer.collections.items():
            parts = all_arrays[name]
            # variant collections rebuild their own state (reshard-safe by
            # construction — replicated dense trees or split EV/dense)
            custom = coll.ckpt_restore(trainer, state.tables[name], parts, S)
            if custom is not None:
                new_tables[name] = custom
                continue
            # distinct keys across base+replay bound the row count per shard
            n_max = sum(p["keys"].shape[0] for p in parts)
            per_shard = int(np.ceil(n_max / S)) + 8
            cap = needed_capacity(per_shard, coll.config.capacity)
            if cap != coll.config.capacity:
                coll.config = dataclasses.replace(coll.config, capacity=cap)
                grew = True
            opt = trainer.sparse_optimizers[name]
            if S == 1:
                st = ev.create(coll.config)
                slot = opt.init(st.values)
                for p in parts:
                    cbf = _cbf_for_shard(p, 0, 1)
                    if cbf is not None:
                        p = dict(p, cbf=cbf)
                    st, slot = _scatter_table(st, slot, opt, coll.config, p)
                new_tables[name] = state.tables[name]._replace(ev=st, slot=slot)
            else:
                shard_states, shard_slots = [], []
                routed = [route_to_shards(p, S) for p in parts]
                for s in range(S):
                    st = ev.create(coll.config)
                    slot = opt.init(st.values)
                    for p in routed:
                        st, slot = _scatter_table(st, slot, opt, coll.config, p[s])
                    shard_states.append(st)
                    shard_slots.append(slot)
                new_tables[name] = _stack_shards(
                    trainer, coll, state.tables[name], shard_states, shard_slots)

        # host tiers: merge tier parts across base+incrementals (upsert in
        # save order — newest wins). A tier row is imported unless the
        # DEVICE snapshot holds the same key at an equal-or-newer version:
        # a key trained on-device AFTER a base save and then demoted exists
        # only in a later incremental's tier export, and its device copy in
        # the base is STALE — presence alone must not win.
        import_tier = getattr(trainer, "import_tier", None)
        if import_tier is not None:
            for name in getattr(trainer, "tiers", {}):
                coll = trainer.collections[name]
                vcol = (coll.config.embedding_dim
                        + coll.config.fused_slot_columns + 1)
                parts = [p for p in all_arrays.get(name, [])
                         if "keys" in p and len(p["keys"])]
                if parts:
                    dk = np.concatenate([p["keys"] for p in parts])
                    dv = np.concatenate([p["versions"] for p in parts])
                    o = np.argsort(dk, kind="stable")
                    ks, vs = dk[o], dv[o]
                    starts = np.flatnonzero(
                        np.r_[True, ks[1:] != ks[:-1]])
                    kuniq = ks[starts]
                    vmax = np.maximum.reduceat(vs, starts)
                else:
                    kuniq = np.zeros((0,), np.int64)
                    vmax = np.zeros((0,), np.int32)
                for m in [base] + incrs:
                    try:
                        tp = F.read_table(m["path"], f"__tier__{name}")
                    except FileNotFoundError:
                        continue
                    tk = tp["keys"]
                    if len(kuniq):
                        tver = tp["rows"][:, vcol].copy().view(np.int32)
                        idx = np.searchsorted(kuniq, tk)
                        safe = np.minimum(idx, len(kuniq) - 1)
                        on_dev = (idx < len(kuniq)) & (kuniq[safe] == tk)
                        dev_ver = np.where(on_dev, vmax[safe],
                                           np.int32(-2**31))
                        mask = ~on_dev | (tver > dev_ver)
                    else:
                        mask = np.ones((len(tk),), bool)
                    if mask.any():
                        import_tier(name, tk[mask], tp["rows"][mask])

        # dense: last loaded wins (params/opt_state/step saved every time)
        _, dense_leaves = loads[-1]
        template = (state.params, state.opt_state, state.step)
        treedef = jax.tree_util.tree_structure(template)
        leaves = [jnp.asarray(x) for x in dense_leaves]
        params, opt_state, step = jax.tree_util.tree_unflatten(treedef, leaves)
        if S > 1:
            from jax.sharding import PartitionSpec as P
            from ..parallel.multihost import host_to_global
            put = lambda x: host_to_global(trainer.mesh, P(), x)
            params = jax.tree_util.tree_map(put, params)
            opt_state = jax.tree_util.tree_map(put, opt_state)
            step = put(step)

        state = state._replace(params=params, opt_state=opt_state,
                               tables=new_tables, step=step)
        if grew:
            trainer.rejit()
        self._last_save_step = int(step)
        self._restore_aux((incrs[-1] if incrs else base)["path"])
        return state, True


def _stack_shards(trainer, coll, bundle_template, shard_states, shard_slots):
    """Stack per-shard pytrees into the trainer's row-sharded global arrays
    (multi-process safe: every process computes the same per-shard host
    state and materialises only its addressable shards)."""
    from ..parallel.multihost import stack_rowsharded
    ev_state = stack_rowsharded(trainer.mesh, trainer.axis, shard_states)
    slot = stack_rowsharded(trainer.mesh, trainer.axis, shard_slots)
    return bundle_template._replace(ev=ev_state, slot=slot)
