"""Serving: load a checkpoint into a read-only predictor with live
incremental refresh.

TPU-native rebuild of the reference's serving stack (SURVEY.md §2.6):
the Triton backend shim (triton/tensorflow_backend_tf.cc) becomes a
jit-compiled apply function over restored state; the incremental serving
ops ``KvResourceIncrImport`` (kernels/kv_variable_ops.cc:720) and
``IncrRestore`` (incr_save_restore_ops.cc:203) become :meth:`Predictor.refresh`,
which applies newly-arrived incremental saves onto the live serving tables
without reloading the model.

Lookups are **read-only**: unknown keys fall back to their deterministic
init row (the EV default-value semantics), no admission/metadata mutation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import format as F
from ..checkpoint.saver import _scatter_table, needed_capacity
from ..feature_column import EmbeddingCollection, NumericColumn, normalize_dense
from ..optim.sparse import sparse_sgd
from ..sparse import embedding_var as ev
from ..train.trainer import _readonly_lookup


def _adopt_row_layout(coll, arrays) -> None:
    """Adopt the checkpoint's row layout: training may have fused optimizer
    slot columns into the values rows (``config.fused_slot_columns`` — the
    reference's ValuePtr layout, train.cli does this for adagrad/adam), so
    the stored width is ``embedding_dim + fused``. Serving reads the width
    from the checkpoint itself instead of requiring the training flags;
    the readonly lookup slices ``[:, :embedding_dim]`` either way."""
    cfg = getattr(coll, "config", None)
    vals = arrays.get("values") if isinstance(arrays, dict) else None
    if cfg is None or vals is None or vals.ndim != 2:
        return
    extra = vals.shape[1] - cfg.embedding_dim
    if extra >= 0 and extra != cfg.fused_slot_columns:
        coll.config = dataclasses.replace(cfg, fused_slot_columns=extra)


class Predictor:
    """Read-only model server over a checkpoint directory.

    Args:
      model: the flax module used at training time.
      numeric_columns / collections: same feature config as training.
      ckpt_dir: directory written by :class:`CheckpointManager`.
      forward: optional custom forward (same signature as the trainer's).
    """

    def __init__(self, model, numeric_columns: Sequence[NumericColumn],
                 collections: Dict[str, EmbeddingCollection], ckpt_dir: str,
                 forward=None):
        self.model = model
        self.numeric_columns = list(numeric_columns)
        # host-index training collections carry a host resolver the
        # serving path must not share (or mutate): serve their plain
        # device-index view — the checkpoint formats are interchangeable
        self.collections = {n: (c.device_view()
                                if hasattr(c, "device_view") else c)
                            for n, c in collections.items()}
        self.ckpt_dir = ckpt_dir
        self.forward = forward
        self._noopt = sparse_sgd(0.0)
        self.params = None
        self.step = None
        self.tables: Dict[str, ev.EVState] = {}
        self._applied_steps: set = set()
        self._jit_predict = None
        base, incrs = F.restore_plan(ckpt_dir)
        if base is None:
            raise FileNotFoundError(f"no full checkpoint in {ckpt_dir}")
        self._load_base(base)
        for m in incrs:
            self._apply_save(m)

    # -- loading -----------------------------------------------------------
    @staticmethod
    def _tier_arrays(coll, manifest, name):
        """Demoted rows from a tiered checkpoint, unpacked into the device
        table's array format (values + bit-pattern int meta; optimizer
        slots dropped — serving never reads them). A tiered trainer's
        snapshot spans storage tiers; serving must too, or cold keys
        silently read their default row."""
        try:
            tp = F.read_table(manifest["path"], f"__tier__{name}")
        except FileNotFoundError:
            return None
        dim = coll.config.embedding_dim + coll.config.fused_slot_columns
        rows = tp["rows"]
        return {
            "keys": tp["keys"],
            "values": rows[:, :dim],
            "freqs": rows[:, dim].copy().view(np.int32),
            "versions": rows[:, dim + 1].copy().view(np.int32),
            "create_steps": rows[:, dim + 2].copy().view(np.int32),
        }

    def _load_base(self, manifest):
        for name, coll in self.collections.items():
            arrays = F.read_table(manifest["path"], name)
            _adopt_row_layout(coll, arrays)
            tier = self._tier_arrays(coll, manifest, name)
            n_rows = arrays["keys"].shape[0] + \
                (tier["keys"].shape[0] if tier else 0)
            cap = needed_capacity(n_rows + 8, coll.config.capacity)
            if cap != coll.config.capacity:
                coll.config = dataclasses.replace(coll.config, capacity=cap)
            st = ev.create(coll.config)
            slot = self._noopt.init(st.values)
            # tier rows FIRST, device rows second: when a key exists in
            # both (promotion refused, key later re-created and trained on
            # device), the device copy is the newer one — tier rows are only
            # written at demotion, which removes the key from the device
            # table, so any device copy postdates the tier export.
            if tier is not None:
                st, _ = _scatter_table(st, slot, self._noopt, coll.config,
                                       tier)
            st, _ = _scatter_table(st, slot, self._noopt, coll.config, arrays)
            self.tables[name] = st
        self._load_dense(manifest)
        self._applied_steps.add(manifest["step"])
        self._jit_predict = None

    def _load_dense(self, manifest):
        leaves = [jnp.asarray(x) for x in F.read_dense(manifest["path"])]
        if self.params is None:
            # params are the leading leaves of the saved
            # (params, opt_state, step) flattening; infer the split by
            # initialising the module once with zero-filled inputs.
            self._params_template = None
        self._dense_leaves = leaves
        self.step = int(np.asarray(leaves[-1]))

    def _materialize_params(self, sample_batch):
        """Build the params treedef from a model init, then fill with the
        saved leading dense leaves."""
        dense, cats, _ = self._prepare(sample_batch)
        outputs = {}
        for name, coll in self.collections.items():
            aux, urows = _readonly_lookup(coll, self.tables[name], cats[name])
            outputs[name] = (coll.embeddings(urows, aux),
                             coll.sequence_embeddings(urows, aux))
        fwd = self.forward or _default_forward
        import functools
        template = fwd(functools.partial(self.model.init, jax.random.key(0)),
                       dense, outputs, False)
        tl, treedef = jax.tree_util.tree_flatten(template)
        saved = self._dense_leaves[:len(tl)]
        if [tuple(l.shape) for l in saved] != [tuple(l.shape) for l in tl]:
            raise ValueError("checkpoint dense leaves do not match the "
                             "model's parameter structure")
        self.params = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(s, l.dtype) for s, l in zip(saved, tl)])

    def _apply_save(self, manifest):
        if manifest["step"] in self._applied_steps:
            return
        for name, coll in self.collections.items():
            arrays = F.read_table(manifest["path"], name)
            tier = self._tier_arrays(coll, manifest, name)
            st = self.tables[name]
            n_new = arrays["keys"].shape[0] + \
                (tier["keys"].shape[0] if tier else 0)
            size = int(np.asarray(st.index.size).sum())
            cap = needed_capacity(size + n_new, coll.config.capacity)
            if cap != coll.config.capacity:
                st, _ = ev.grow(st, coll.config, cap)
                coll.config = dataclasses.replace(coll.config, capacity=cap)
                self._jit_predict = None
            slot = self._noopt.init(st.values)
            # tier first, device second (see _load_base ordering rationale)
            if tier is not None:
                st, _ = _scatter_table(st, slot, self._noopt, coll.config,
                                       tier)
            st, _ = _scatter_table(st, slot, self._noopt, coll.config, arrays)
            self.tables[name] = st
        self._load_dense(manifest)
        self.params = None  # re-materialise against the new leaves
        self._applied_steps.add(manifest["step"])

    # -- refresh -------------------------------------------------------------
    def refresh(self) -> bool:
        """Apply any new saves in the directory. A newer FULL save reloads
        the base; newer incrementals replay in order. Returns True if the
        serving state changed."""
        base, incrs = F.restore_plan(self.ckpt_dir)
        changed = False
        if base and base["step"] not in self._applied_steps:
            self.tables.clear()
            self._applied_steps.clear()
            self._load_base(base)
            changed = True
        for m in incrs:
            if m["step"] not in self._applied_steps:
                self._apply_save(m)
                changed = True
        return changed

    # -- inference -------------------------------------------------------------
    def _prepare(self, batch):
        from ..feature_column import pack_dense
        dense = (jnp.asarray(pack_dense(self.numeric_columns, batch))
                 if self.numeric_columns else None)
        cats = {name: coll.pack_ids(batch)
                for name, coll in self.collections.items()}
        labels = batch.get("label")
        return dense, cats, labels

    def _predict_fn(self, params, tables, dense, cats):
        if dense is not None:
            dense = normalize_dense(self.numeric_columns, dense)
        outputs = {}
        for name, coll in self.collections.items():
            aux, urows = _readonly_lookup(coll, tables[name], cats[name])
            outputs[name] = coll.embeddings_readonly(urows, aux)
        fwd = self.forward or _default_forward
        import functools
        out = fwd(functools.partial(self.model.apply, params),
                  dense, outputs, False)
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.sigmoid(logits)

    def predict(self, batch) -> np.ndarray:
        """[B] click probabilities."""
        dense, cats, _ = self._prepare(batch)
        if self.params is None:
            self._materialize_params(batch)
        if self._jit_predict is None:
            self._jit_predict = jax.jit(self._predict_fn)
        return np.asarray(self._jit_predict(self.params, self.tables,
                                            dense, cats))


def _default_forward(apply_fn, dense, outputs, train):
    from ..train.trainer import default_forward
    return default_forward(apply_fn, dense, outputs, train)


class TieredPredictor(Predictor):
    """Serving for models LARGER than device HBM: only the hottest
    ``device_row_budget`` rows per table live in the device table; the
    cold tail stays in a host-DRAM store (``HostKV``) and is consulted
    per request — the reference's CPU-resident EV serving through the
    Triton shim (triton/tensorflow_backend_tf.cc: sessions read EVs
    straight from PS/worker DRAM; cold rows never need accelerator
    residency).

    Request path: ids are packed on host, the (host-known) device-resident
    set is subtracted, misses batch-probe the host store, and the hits
    ride into the jitted predict as a per-request staging buffer — one
    extra [M, dim] transfer, no recompilation (staging is padded to
    power-of-two buckets). Keys in neither store read their deterministic
    init row, exactly like the all-HBM predictor.
    """

    def __init__(self, model, numeric_columns, collections, ckpt_dir,
                 device_row_budget: int, forward=None):
        self.device_row_budget = int(device_row_budget)
        self.host_store: Dict[str, Any] = {}
        self._device_keys: Dict[str, np.ndarray] = {}  # sorted int64
        super().__init__(model, numeric_columns, collections, ckpt_dir,
                         forward=forward)

    # -- loading ----------------------------------------------------------
    @staticmethod
    def _merge_by_key(parts):
        """Concatenate row dicts; on duplicate keys the LAST occurrence
        wins (parts are ordered oldest-first, and within one save tier
        rows precede device rows)."""
        from ..checkpoint.saver import last_wins_sel
        keys = np.concatenate([p["keys"] for p in parts])
        vals = np.concatenate([p["values"] for p in parts])
        freqs = np.concatenate([p["freqs"] for p in parts])
        vers = np.concatenate([p["versions"] for p in parts])
        sel = last_wins_sel(keys)
        return keys[sel], vals[sel], freqs[sel], vers[sel]

    def _split_hot(self, coll, keys, vals, freqs, vers):
        """Hot set = top rows by (freq, version) under the budget."""
        n = len(keys)
        b = self.device_row_budget
        if n <= b:
            hot = np.ones(n, bool)
        else:
            rank = np.lexsort((vers, freqs))  # ascending coldness last
            hot = np.zeros(n, bool)
            hot[rank[n - b:]] = True
        return hot

    def _load_base(self, manifest):
        from ..utils.native import HostKV
        for name, coll in self.collections.items():
            arrays = F.read_table(manifest["path"], name)
            _adopt_row_layout(coll, arrays)
            tier = self._tier_arrays(coll, manifest, name)
            parts = ([tier] if tier else []) + [arrays]
            keys, vals, freqs, vers = self._merge_by_key(parts)
            hot = self._split_hot(coll, keys, vals, freqs, vers)

            cap = needed_capacity(int(hot.sum()) + 8,
                                  min(coll.config.capacity, 256))
            if cap != coll.config.capacity:
                coll.config = dataclasses.replace(coll.config, capacity=cap)
            st = ev.create(coll.config)
            slot = self._noopt.init(st.values)
            st, _ = _scatter_table(st, slot, self._noopt, coll.config, {
                "keys": keys[hot], "values": vals[hot],
                "freqs": freqs[hot], "versions": vers[hot],
                "create_steps": vers[hot],
            })
            self.tables[name] = st
            self._device_keys[name] = np.sort(keys[hot])
            kv = HostKV(vals.shape[1])
            if (~hot).any():
                kv.upsert(keys[~hot], vals[~hot].astype(np.float32))
            self.host_store[name] = kv
        self._load_dense(manifest)
        self._applied_steps.add(manifest["step"])
        self._jit_predict = None

    def _apply_save(self, manifest):
        """Incremental refresh: device-resident keys update in place; all
        other rows upsert the host store (no promotion at refresh — the
        hot set is re-ranked at the next full load)."""
        if manifest["step"] in self._applied_steps:
            return
        for name, coll in self.collections.items():
            arrays = F.read_table(manifest["path"], name)
            tier = self._tier_arrays(coll, manifest, name)
            parts = ([tier] if tier else []) + [arrays]
            keys, vals, freqs, vers = self._merge_by_key(parts)
            dk = self._device_keys[name]
            pos = np.searchsorted(dk, keys)
            pos_safe = np.minimum(pos, max(len(dk) - 1, 0))
            on_dev = (len(dk) > 0) & (pos < len(dk)) & (dk[pos_safe] == keys)
            if on_dev.any():
                st = self.tables[name]
                slot = self._noopt.init(st.values)
                st, _ = _scatter_table(st, slot, self._noopt, coll.config, {
                    "keys": keys[on_dev], "values": vals[on_dev],
                    "freqs": freqs[on_dev], "versions": vers[on_dev],
                    "create_steps": vers[on_dev],
                })
                self.tables[name] = st
            if (~on_dev).any():
                self.host_store[name].upsert(
                    keys[~on_dev], vals[~on_dev].astype(np.float32))
        self._load_dense(manifest)
        self.params = None
        self._applied_steps.add(manifest["step"])

    # -- inference --------------------------------------------------------
    def _stage_for(self, name, coll, flat_ids: np.ndarray):
        """(stage_idx [N] int32, staging [M_pad, dim] f32): host-store rows
        for ids absent from the device table, padded to a pow2 bucket."""
        dim = self.tables[name].values.shape[1]
        uniq, inv = np.unique(flat_ids, return_inverse=True)
        dk = self._device_keys[name]
        pos = np.searchsorted(dk, uniq)
        pos_safe = np.minimum(pos, max(len(dk) - 1, 0))
        on_dev = (len(dk) > 0) & (pos < len(dk)) & (dk[pos_safe] == uniq)
        need = ~on_dev & (uniq != -1)
        sidx_u = np.full(len(uniq), -1, np.int32)
        rows = np.zeros((0, dim), np.float32)
        if need.any():
            ids = uniq[need]
            payload, found = self.host_store[name].lookup(ids)
            m = int(found.sum())
            if m:
                sidx = np.full(len(ids), -1, np.int32)
                sidx[found] = np.arange(m, dtype=np.int32)
                sidx_u[need] = sidx
                rows = payload[found].astype(np.float32)
        m_pad = max(8, 1 << (max(len(rows) - 1, 0)).bit_length())
        pad = np.zeros((m_pad, dim), np.float32)
        pad[:len(rows)] = rows
        return sidx_u[inv].astype(np.int32), pad

    def _predict_fn(self, params, tables, dense, cats, stage_idx, staging):
        if dense is not None:
            dense = normalize_dense(self.numeric_columns, dense)
        outputs = {}
        from ..sparse import keys as K
        for name, coll in self.collections.items():
            aux, urows = _readonly_lookup(coll, tables[name], cats[name])
            a = aux.ev_aux
            rows = urows[a.uniq.inverse]
            valid = (~K.is_empty(a.uniq.ukeys))[a.uniq.inverse]
            si = stage_idx[name]
            srows = staging[name][:, : rows.shape[1]].astype(rows.dtype)
            rows = jnp.where((si >= 0)[:, None],
                             srows[jnp.maximum(si, 0)], rows)
            outputs[name] = (coll.embeddings_from_rows(rows, valid),
                             coll.sequence_embeddings_from_rows(rows, valid))
        fwd = self.forward or _default_forward
        import functools
        out = fwd(functools.partial(self.model.apply, params),
                  dense, outputs, False)
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.sigmoid(logits)

    def predict(self, batch) -> np.ndarray:
        # pack each collection's ids ONCE on host (the hot path) and reuse
        # the array for both the staging probe and the device transfer
        from ..feature_column import pack_dense
        from ..sparse import keys as K
        dense = (jnp.asarray(pack_dense(self.numeric_columns, batch))
                 if self.numeric_columns else None)
        cats, stage_idx, staging = {}, {}, {}
        for name, coll in self.collections.items():
            flat_np = coll.pack_ids_np(batch)
            hi, lo = K.split_np(flat_np)
            cats[name] = K.Keys(jnp.asarray(hi), jnp.asarray(lo))
            si, srows = self._stage_for(name, coll, flat_np.reshape(-1))
            stage_idx[name] = jnp.asarray(si)
            staging[name] = jnp.asarray(srows)
        if self.params is None:
            self._materialize_params(batch)
        if self._jit_predict is None:
            self._jit_predict = jax.jit(self._predict_fn)
        return np.asarray(self._jit_predict(self.params, self.tables,
                                            dense, cats, stage_idx, staging))

    def host_rows(self, name: str) -> int:
        kv = self.host_store.get(name)
        return len(kv) if kv else 0


class ShardedPredictor(Predictor):
    """Serving for tables larger than one chip's HBM: the checkpoint is
    restored ROW-SHARDED over a device mesh (the same owner-hash routing as
    training and reshard-on-restore), and inference runs the read-only
    all_to_all exchange per batch shard — the serving analog of the
    reference's sharded PS serving graph (SURVEY.md §2.6; sessions route
    lookups to the PS holding each partition).

    The request batch is data-parallel over the mesh (padded to a multiple
    of the shard count); ``predict`` returns the [B] probabilities.
    """

    def __init__(self, model, numeric_columns, collections, ckpt_dir,
                 mesh, forward=None, axis: str = "dp",
                 bucket_slack: float = 2.0):
        self.mesh = mesh
        self.axis = axis
        self.S = int(np.prod(mesh.devices.shape))
        self.bucket_slack = bucket_slack
        super().__init__(model, numeric_columns, collections, ckpt_dir,
                         forward=forward)

    # -- sharded (re)loading ------------------------------------------------
    def _stack(self, shard_states):
        from jax.sharding import PartitionSpec as P

        from ..parallel.multihost import host_to_global

        def stack(*leaves):
            l0 = leaves[0]
            if hasattr(l0, "ndim") and l0.ndim >= 1:
                glob = np.concatenate([np.asarray(l) for l in leaves], axis=0)
                return host_to_global(self.mesh, P(self.axis), glob)
            return host_to_global(self.mesh, P(), leaves[0])

        return jax.tree_util.tree_map(stack, *shard_states)

    def _unstack(self, coll, state):
        """Stacked global state -> per-shard host EVStates."""
        from ..parallel.multihost import addressable_blocks
        cap = coll.config.capacity
        cap1 = cap + 1

        def blocks(leaf, per):
            return addressable_blocks(leaf, self.S, per)

        out = []
        idx = state.index
        kh = blocks(idx.key_hi, cap)
        kl = blocks(idx.key_lo, cap)
        sz = blocks(idx.size, idx.size.shape[0] // self.S)
        ov = blocks(idx.overflow, idx.overflow.shape[0] // self.S)
        vals = blocks(state.values, cap1)
        fr = blocks(state.freqs, cap1)
        vr = blocks(state.versions, cap1)
        cs = blocks(state.create_steps, cap1)
        cb = (blocks(state.cbf, state.cbf.shape[0] // self.S)
              if state.cbf is not None else None)
        from ..sparse import hashtable as ht
        for s in range(self.S):
            out.append(ev.EVState(
                index=ht.HashTable(key_hi=jnp.asarray(kh[s]),
                                   key_lo=jnp.asarray(kl[s]),
                                   size=jnp.asarray(sz[s]),
                                   overflow=jnp.asarray(ov[s])),
                values=jnp.asarray(vals[s]), freqs=jnp.asarray(fr[s]),
                versions=jnp.asarray(vr[s]), create_steps=jnp.asarray(cs[s]),
                cbf=jnp.asarray(cb[s]) if cb is not None else None))
        return out

    def _load_base(self, manifest):
        from ..checkpoint.saver import route_to_shards
        for name, coll in self.collections.items():
            arrays = F.read_table(manifest["path"], name)
            _adopt_row_layout(coll, arrays)
            tier = self._tier_arrays(coll, manifest, name)
            n_rows = arrays["keys"].shape[0] + \
                (tier["keys"].shape[0] if tier else 0)
            per_shard = int(np.ceil(n_rows / self.S)) + 8
            cap = needed_capacity(per_shard, coll.config.capacity)
            if cap != coll.config.capacity:
                coll.config = dataclasses.replace(coll.config, capacity=cap)
            routed = route_to_shards(arrays, self.S)
            tier_routed = route_to_shards(tier, self.S) if tier else None
            shards = []
            for s in range(self.S):
                st = ev.create(coll.config)
                slot = self._noopt.init(st.values)
                # tier first, device second (see _load_base ordering)
                if tier_routed is not None:
                    st, _ = _scatter_table(st, slot, self._noopt,
                                           coll.config, tier_routed[s])
                st, _ = _scatter_table(st, slot, self._noopt, coll.config,
                                       routed[s])
                shards.append(st)
            self.tables[name] = self._stack(shards)
        self._load_dense(manifest)
        self._applied_steps.add(manifest["step"])
        self._jit_predict = None

    def _apply_save(self, manifest):
        from ..checkpoint.saver import route_to_shards
        if manifest["step"] in self._applied_steps:
            return
        for name, coll in self.collections.items():
            arrays = F.read_table(manifest["path"], name)
            tier = self._tier_arrays(coll, manifest, name)
            shards = self._unstack(coll, self.tables[name])
            # size the capacity check from device + tier rows (the base
            # loader does); a large tier export must not silently exceed a
            # shard's capacity and drop rows to their default
            n_new = arrays["keys"].shape[0] + \
                (tier["keys"].shape[0] if tier else 0)
            sizes = [int(np.asarray(s.index.size).sum()) for s in shards]
            cap = needed_capacity(max(sizes) + n_new, coll.config.capacity)
            if cap != coll.config.capacity:
                grown = []
                for s in shards:
                    s2, _ = ev.grow(s, coll.config, cap)
                    grown.append(s2)
                shards = grown
                coll.config = dataclasses.replace(coll.config, capacity=cap)
                self._jit_predict = None
            routed = route_to_shards(arrays, self.S)
            tier_routed = route_to_shards(tier, self.S) if tier else None
            out = []
            for s, st in enumerate(shards):
                slot = self._noopt.init(st.values)
                # tier first, device second (see _load_base ordering)
                if tier_routed is not None:
                    st, _ = _scatter_table(st, slot, self._noopt,
                                           coll.config, tier_routed[s])
                st, _ = _scatter_table(st, slot, self._noopt, coll.config,
                                       routed[s])
                out.append(st)
            self.tables[name] = self._stack(out)
        self._load_dense(manifest)
        self.params = None
        self._applied_steps.add(manifest["step"])

    # -- sharded inference ---------------------------------------------------
    def _materialize_params(self, sample_batch):
        """Dense params are replicated; build the treedef from a host-side
        init on zero embeddings (no device exchange needed)."""
        import functools

        from jax.sharding import PartitionSpec as P

        from ..parallel.multihost import host_to_global
        dense, cats, _ = self._prepare_host(sample_batch)
        outputs = {}
        for name, coll in self.collections.items():
            B = next(iter(sample_batch.values())).shape[0]
            rows = jnp.zeros((coll.total_width * B, coll.dim), jnp.float32)
            valid = jnp.ones((coll.total_width * B,), bool)
            outputs[name] = (coll.embeddings_from_rows(rows, valid),
                             coll.sequence_embeddings_from_rows(rows, valid))
        fwd = self.forward or _default_forward
        d = jnp.asarray(dense) if dense is not None else None
        template = fwd(functools.partial(self.model.init, jax.random.key(0)),
                       d, outputs, False)
        tl, treedef = jax.tree_util.tree_flatten(template)
        saved = self._dense_leaves[:len(tl)]
        if [tuple(l.shape) for l in saved] != [tuple(l.shape) for l in tl]:
            raise ValueError("checkpoint dense leaves do not match the "
                             "model's parameter structure")
        put = lambda x: host_to_global(self.mesh, P(), np.asarray(x))
        self.params = jax.tree_util.tree_unflatten(
            treedef, [put(s) for s in saved])

    def _prepare_host(self, batch):
        from ..feature_column import pack_dense
        from ..sparse import keys as K
        dense = (pack_dense(self.numeric_columns, batch)
                 if self.numeric_columns else None)
        cats = {name: K.split_np(coll.pack_ids_np(batch))
                for name, coll in self.collections.items()}
        return dense, cats, batch.get("label")

    def _predict_device(self, params, tables, dense, cats):
        from ..parallel import sharded
        from ..sparse import keys as K
        if dense is not None:
            dense = normalize_dense(self.numeric_columns, dense)
        outputs = {}
        n_dropped = jnp.zeros((), jnp.int32)
        for name, coll in self.collections.items():
            flat = cats[name].reshape(-1)
            U = flat.shape[0]
            cap = max(int(self.bucket_slack * U) // max(self.S, 1), 8)
            cap = 1 << (cap - 1).bit_length()
            rows, valid = sharded.exchange_lookup_readonly(
                coll, tables[name], flat, self.axis, cap)
            # invalid & non-padding == dropped by owner-bucket overflow
            # (unknown-but-routed keys are VALID: they read default rows)
            n_dropped = n_dropped + jnp.sum(
                (~valid & ~K.is_empty(flat)).astype(jnp.int32))
            outputs[name] = (coll.embeddings_from_rows(rows, valid),
                             coll.sequence_embeddings_from_rows(rows, valid))
        fwd = self.forward or _default_forward
        import functools
        out = fwd(functools.partial(self.model.apply, params),
                  dense, outputs, False)
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.sigmoid(logits), jax.lax.psum(n_dropped, self.axis)

    def predict(self, batch) -> np.ndarray:
        from jax.sharding import PartitionSpec as P

        from ..parallel.multihost import globalize
        from ..sparse import keys as K
        dense, cats, _ = self._prepare_host(batch)
        B = next(iter(batch.values())).shape[0]
        pad = (-B) % self.S
        if pad:
            def pad_b(x, fill):
                return np.concatenate(
                    [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
            if dense is not None:
                dense = pad_b(np.asarray(dense), 0)
            cats = {n: (np.concatenate([h, np.full((h.shape[0], pad), -1,
                                                   h.dtype)], axis=1),
                        np.concatenate([l, np.full((l.shape[0], pad), -1,
                                                   l.dtype)], axis=1))
                    for n, (h, l) in cats.items()}
        if self.params is None:
            self._materialize_params(batch)
        if self._jit_predict is None:
            table_specs = {
                n: jax.tree_util.tree_map(lambda _: P(self.axis), t)
                for n, t in self.tables.items()}
            self._jit_predict = jax.jit(jax.shard_map(
                self._predict_device, mesh=self.mesh,
                in_specs=(P(), table_specs,
                          P(self.axis, None) if dense is not None else P(),
                          {n: K.Keys(P(None, self.axis), P(None, self.axis))
                           for n in self.collections}),
                out_specs=(P(self.axis), P()), check_vma=False))
        g = lambda spec, x: globalize(self.mesh, spec, x)
        dense_g = (g(P(self.axis, None), dense) if dense is not None else None)
        cats_g = {n: K.Keys(g(P(None, self.axis), h), g(P(None, self.axis), l))
                  for n, (h, l) in cats.items()}
        out, n_dropped = self._jit_predict(self.params, self.tables,
                                           dense_g, cats_g)
        if int(np.asarray(n_dropped)) > 0:
            # a skewed request overflowed one owner's bucket: widen and
            # redo — training has the same self-heal via raise_bucket_slack
            import warnings
            self.bucket_slack *= 2.0
            warnings.warn(
                f"ShardedPredictor: {int(np.asarray(n_dropped))} ids "
                f"overflowed owner buckets; bucket_slack raised to "
                f"{self.bucket_slack} and the request re-served")
            self._jit_predict = None
            return self.predict(batch)
        return np.asarray(out)[:B]
