"""Host-index embedding fast path: the key->slot index lives on the HOST.

The reference keeps every EmbeddingVariable's key index in CPU hash maps
probed inside its gather/apply kernels (tensorflow/core/framework/
embedding/dense_hash_map.h, lockless_hash_map.h:41; kernels
kv_variable_ops.cc:315-362). The round-1..3 engine moved that index into
HBM (sparse/hashtable.py) so a jitted step is self-contained — but the
on-device dedup sort + bucketed probe cost ~5.6 ms of the 9 ms DLRM step
at B=4096 (docs/BENCH.md budget table).

This module restores the reference's host-resident index *without* its
per-key RPC chatter, by exploiting the one structural advantage a
single-controller TPU program has: **the host is idle while the device
runs**. `HostIndexEmbeddingCollection.pack_ids` resolves step N+1's ids
into (unique keys, dense row slots, inverse permutation, created flags,
multiplicities) in native C++ (native/deeprec_native.cc
HostIndexResolver, ~2.6 ms/batch single-core at Criteo shapes) while the
device executes step N's already-dispatched program. The jitted step then
needs NO on-device dedup and NO hash probe: its sparse path collapses to
row gather -> segment combine -> optimizer scatter.

Semantics are identical to the device-index path (asserted by
tests/test_host_index.py): deterministic key-hashed row init, lazy init,
within-batch-multiplicity freq counting, counter-filter AND
counting-bloom (CBF) admission — the bloom gate lives in the resolver,
where the reference's BloomFilter also lived (embedding_filter.h:28-130)
— version stamps, the 4-array checkpoint format (interchangeable with
device-path checkpoints in BOTH directions, including CBF counters),
capacity growth, the max_unique overflow group, and true touched-key
incremental deltas for light-layout tables (the resolver records touched
slots — the reference's RecordSparseIndices role). Not supported here
(use the device-index collection): mesh sharding beyond one controller
(see parallel/host_sharded.py) and tiered storage.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .feature_column import CollectionAux, EmbeddingCollection
from .ops.unique import UniqueResult
from .sparse import embedding_var as ev
from .sparse import keys as K
from .utils.native import HostIndexResolver


class HostEVState(NamedTuple):
    """Device half of a host-indexed table: row stores only (the key
    index is the collection's :class:`HostIndexResolver`). Same SoA
    layout as :class:`ev.EVState` minus the index planes."""

    values: jax.Array        # [capacity+1, width] (width = dim + fused cols)
    freqs: jax.Array         # [capacity+1] int32
    versions: jax.Array      # [capacity+1] int32
    create_steps: jax.Array  # [capacity+1] int32

    @property
    def capacity(self) -> int:
        return self.values.shape[0] - 1


class ResolvedIds(NamedTuple):
    """One batch's host-resolved lookup, the jitted step's sparse input.
    ``created`` flags rows assigned this batch (train) or keys MISSING
    from the index (readonly)."""

    ukeys: K.Keys          # [U] unique keys, EMPTY-padded
    uslots: jax.Array      # [U] int32 (capacity = null row)
    inverse: jax.Array     # [n] int32 flat position -> unique lane
    created: jax.Array     # [U] bool
    counts: jax.Array      # [U] int32 within-batch multiplicity
    n_unique: jax.Array    # int32 scalar
    n_overflow: jax.Array  # int32 scalar
    readonly: jax.Array    # bool scalar (eval/serving resolve)


class ResolvedWire:
    """The transferred form of :class:`ResolvedIds`: ONE uint8 buffer.

    A tunneled (or merely busy) host pays per-TRANSFER cost — both the
    enqueue round and the CPU that serializes the bytes — and a resolve
    is 6 logical arrays; shipping them as one C++-packed byte buffer
    makes the per-step host->device cost a single enqueue of the minimal
    byte count. Layout (written by native hidx_resolve_wire; U =
    max_unique + 1, n = flat batch width; see utils.native.wire_layout):

    ``[uslots|created<<30 : i32 U][key hi : i32 U][key lo : i32 U]
    [counts : i32 U, only when the config reads freq/version metadata]
    [inverse : i16 n, 4B-padded (i32 when U > 32767)]
    [tail : i32 4 = n_unique, n_overflow, readonly, 0x5EC2]``

    The int16 inverse plane carries the bulk of the wire at half width,
    and light-layout tables skip the counts plane entirely — at Criteo
    shapes the wire drops from 0.72 MB (v1) to 0.44 MB. The layout
    fields are pytree-static (they set the decode slicing); the buffer
    is the single traced leaf. Decoding is bitcast + slice on device
    (VPU-trivial, fused by XLA into the consuming gathers).
    """

    __slots__ = ("buf", "u", "n", "with_counts", "inv16")

    def __init__(self, buf, u: int, n: int, with_counts: bool, inv16: bool):
        self.buf = buf  # uint8 [wire_layout(...)[0]]
        self.u = int(u)
        self.n = int(n)
        self.with_counts = bool(with_counts)
        self.inv16 = bool(inv16)

    def decode(self) -> ResolvedIds:
        from .utils.native import wire_layout
        U, n, buf = self.u, self.n, self.buf
        _, off = wire_layout(U, n, self.with_counts, self.inv16)

        def i32(byte_off, count):
            sl = jax.lax.dynamic_slice_in_dim(buf, byte_off, count * 4)
            return jax.lax.bitcast_convert_type(sl.reshape(count, 4),
                                                jnp.int32)

        sf = i32(off["slots"], U)
        hi = i32(off["hi"], U)
        lo = i32(off["lo"], U)
        ukeys = K.Keys(hi, lo)
        uslots = sf & ((1 << 30) - 1)
        created = (sf >> 30) & 1 == 1
        if self.with_counts:
            counts = i32(off["counts"], U)
        else:
            # no consumer reads true multiplicities under this layout;
            # expose lane-occupancy (1 per materialized key lane) so any
            # (counts > 0) liveness test stays correct
            counts = (~K.is_empty(ukeys)).astype(jnp.int32)
        if self.inv16:
            sl = jax.lax.dynamic_slice_in_dim(buf, off["inverse"], 2 * n)
            inverse = jax.lax.bitcast_convert_type(
                sl.reshape(n, 2), jnp.int16).astype(jnp.int32)
        else:
            inverse = i32(off["inverse"], n)
        tail = i32(off["tail"], 4)
        return ResolvedIds(
            ukeys=ukeys,
            uslots=uslots,
            inverse=inverse,
            created=created,
            counts=counts,
            n_unique=tail[0],
            n_overflow=tail[1],
            readonly=tail[2] == 1,
        )


jax.tree_util.register_pytree_node(
    ResolvedWire,
    lambda w: ((w.buf,), (w.u, w.n, w.with_counts, w.inv16)),
    lambda meta, children: ResolvedWire(children[0], *meta),
)


class HostIndexEmbeddingCollection(EmbeddingCollection):
    """Drop-in `EmbeddingCollection` whose index lives on the host.

    Construction mirrors the base class; the extra ``n_groups`` picks the
    resolver's deterministic key-sharding fan-out (fixed per table — it
    defines slot-assignment order; keep the default).
    """

    def __init__(self, columns, name: str = "emb", capacity: int = 1 << 20,
                 n_groups: int = 16, use_native: Optional[bool] = None,
                 **kwargs):
        super().__init__(columns, name=name, capacity=capacity, **kwargs)
        from .config import StorageType
        if self.config.storage.storage_type is not StorageType.HBM:
            raise NotImplementedError(
                "tiered storage demotes rows on-device; use the "
                "device-index EmbeddingCollection for tiered tables")
        self._resolver = HostIndexResolver(n_groups=n_groups,
                                           use_native=use_native)
        self._resolver.reserve(min(capacity, 1 << 22))
        if self.config.cbf_filter is not None:
            # bloom admission lives IN the resolver (the reference's
            # BloomFilter gated EV insertion from the CPU index,
            # embedding_filter.h:28-130) — same sizing, hash family and
            # bump/estimate order as the device engine, asserted
            # bit-exact in tests/test_host_index.py
            cbf = self.config.cbf_filter
            self._resolver.cbf_enable(cbf.num_counters(), cbf.num_hashes,
                                      cbf.filter_freq)
        if not self.config.version_tracked:
            # light layout: no version stamps to delta against — record
            # touched slots in the resolver instead (the reference's
            # RecordSparseIndices recorder, incr_save_restore_ops.h:329,
            # for one bit-OR per unique per batch). Version-tracked
            # tables keep the version-delta selection.
            self._resolver.track_touched(True)
        self._last_cap_ovf = 0
        self._sat_steps = 0   # train resolves that overflowed max_unique
        self._max_nu = 0      # high-water unique demand

    # -- state ---------------------------------------------------------
    def init(self) -> HostEVState:
        """Fresh device state; RESETS the host index (both halves of the
        table restart together — Trainer.init's sample-batch resolve is
        discarded along with its throwaway lookup)."""
        self._resolver.reset()
        cfg = self.config
        cap = cfg.capacity
        width = cfg.embedding_dim + cfg.fused_slot_columns
        return HostEVState(
            values=jnp.zeros((cap + 1, width), jnp.dtype(cfg.value_dtype)),
            freqs=jnp.zeros((cap + 1,), jnp.int32),
            versions=jnp.full((cap + 1,), -1, jnp.int32),
            create_steps=jnp.full((cap + 1,), -1, jnp.int32),
        )

    # -- host hot path ---------------------------------------------------
    def _wire_params(self, n: int):
        cfg = self.config
        u_out = cfg.max_unique + 1 if cfg.max_unique else n + 1
        with_counts = (cfg.freq_tracked or cfg.version_tracked
                       or cfg.counter_filter is not None)
        return u_out, with_counts, u_out <= 32767

    def _resolve(self, batch, readonly: bool) -> ResolvedWire:
        packed = batch if isinstance(batch, np.ndarray) \
            else self.pack_ids_np(batch)
        cap = self.config.capacity
        n = packed.size
        u_out, with_counts, inv16 = self._wire_params(n)
        buf, nu, nov = self._resolver.resolve_wire(
            packed, u_out, null_slot=cap, row_capacity=cap,
            readonly=readonly, with_counts=with_counts, inv16=inv16)
        if not readonly:
            self._sat_steps += int(nov > 0)
            self._max_nu = max(self._max_nu, int(nu) + int(nov))
        return ResolvedWire(buf=jnp.asarray(buf), u=u_out, n=n,
                            with_counts=with_counts, inv16=inv16)

    def pack_ids(self, batch) -> ResolvedIds:
        """Train-path host resolve (find-or-insert; mutates the index —
        call once per training batch, in step order)."""
        return self._resolve(batch, readonly=False)

    def pack_ids_eval(self, batch) -> ResolvedIds:
        """Eval/serving resolve: find-only, no mutation."""
        return self._resolve(batch, readonly=True)

    # -- jitted step hooks ------------------------------------------------
    def _aux_from_resolved(self, r: ResolvedIds, admitted) -> CollectionAux:
        uniq = UniqueResult(ukeys=r.ukeys, inverse=r.inverse, counts=r.counts,
                            n_unique=r.n_unique, n_overflow=r.n_overflow)
        return CollectionAux(ev_aux=ev.LookupAux(
            uniq=uniq, slots=r.uslots, admitted=admitted, created=r.created))

    def lookup_or_create(self, state, batch, step):
        """Consume a host-resolved batch: metadata scatters + admission
        only — the index work already happened on the host. Parity with
        ev.lookup_or_create_unique minus the ht.lookup_or_insert call."""
        if not isinstance(batch, (ResolvedWire, ResolvedIds)):
            if isinstance(batch, K.Keys):  # resolve here (slow path)
                hi = np.asarray(batch.hi).astype(np.int64)
                lo = np.asarray(batch.lo).astype(np.uint32).astype(np.int64)
                batch = (hi << 32) | lo
            batch = self.pack_ids(batch)
        r = batch.decode() if isinstance(batch, ResolvedWire) else batch
        cfg = self.config
        cap = state.capacity
        gs = jnp.asarray(step, jnp.int32)

        dest = jnp.where(r.created & ~r.readonly, r.uslots, cap + 1)
        values = state.values
        if cfg.filter_freq > 0 or not cfg.lazy_init:
            rows0 = ev.init_rows(cfg, r.ukeys)
            if cfg.fused_slot_columns:
                pad = jnp.full((rows0.shape[0], cfg.fused_slot_columns),
                               cfg.fused_slot_init, rows0.dtype)
                rows0 = jnp.concatenate([rows0, pad], axis=-1)
            values = values.at[dest].set(rows0.astype(values.dtype),
                                         mode="drop", unique_indices=True)

        live = (r.counts > 0) & (r.uslots != cap) & ~r.readonly
        mdest = jnp.where(live, r.uslots, cap + 1)
        if cfg.version_tracked:
            create_steps = state.create_steps.at[dest].set(
                gs, mode="drop", unique_indices=True)
            versions = state.versions.at[mdest].set(gs, mode="drop",
                                                    unique_indices=True)
            versions = versions.at[cap].set(-1)
            create_steps = create_steps.at[cap].set(-1)
        else:
            create_steps = state.create_steps
            versions = state.versions
        if cfg.freq_tracked:
            freqs = state.freqs.at[mdest].add(r.counts, mode="drop",
                                              unique_indices=True)
            freqs = freqs.at[cap].set(0)
        else:
            freqs = state.freqs

        if cfg.counter_filter is not None:
            admitted = ((r.uslots != cap)
                        & (freqs[r.uslots] >= cfg.counter_filter.filter_freq))
        else:
            admitted = r.uslots != cap

        new_state = HostEVState(values=values, freqs=freqs,
                                versions=versions, create_steps=create_steps)
        return new_state, self._aux_from_resolved(r, admitted)

    def readonly_rows(self, state, cats):
        """Eval path: missing keys read their deterministic would-be init
        (KvResourceGather default_value semantics)."""
        if isinstance(state, ev.EVState):  # a Predictor's device-index
            return super().readonly_rows(state, cats)  # state: base path
        if not isinstance(cats, (ResolvedWire, ResolvedIds)):
            cats = self.pack_ids_eval(cats)
        r = cats.decode() if isinstance(cats, ResolvedWire) else cats
        cfg = self.config
        found = ~r.created  # readonly resolve: created == MISSING
        aux = CollectionAux(ev_aux=ev.LookupAux(
            uniq=UniqueResult(ukeys=r.ukeys, inverse=r.inverse,
                              counts=r.counts, n_unique=r.n_unique,
                              n_overflow=r.n_overflow),
            slots=r.uslots, admitted=found,
            created=jnp.zeros_like(found)))
        rows = state.values[r.uslots][:, : cfg.embedding_dim]
        defaults = ev.init_rows(cfg, r.ukeys).astype(rows.dtype)
        valid = ~K.is_empty(r.ukeys)
        rows = jnp.where((found | ~valid)[:, None], rows, defaults)
        return aux, rows

    # -- growth -----------------------------------------------------------
    def load_factor(self, state) -> float:
        return self._resolver.size / self.config.capacity

    def needs_growth(self, state) -> bool:
        _, cap_ovf, _ = self._resolver.stats()
        over = cap_ovf > self._last_cap_ovf
        return self.load_factor(state) >= 0.9 or over

    def grow_state(self, state, slot_state, opt=None):
        """Dense slots never move: growth = pad the row stores (no index
        rebuild, no permutation — cheaper than the device-index grow)."""
        from .optim.sparse import permute_slot_state
        cap = self.config.capacity
        new_cap = cap * 2
        ident = jnp.arange(cap, dtype=jnp.int32)
        new_state = HostEVState(
            values=ev.permute_rows(state.values, ident, new_cap),
            freqs=ev.permute_rows(state.freqs, ident, new_cap),
            versions=ev.permute_rows(state.versions, ident, new_cap, fill=-1),
            create_steps=ev.permute_rows(state.create_steps, ident, new_cap,
                                         fill=-1),
        )
        slot_state = permute_slot_state(slot_state, ident, new_cap,
                                        fills=opt.fills if opt else None)
        self.config = dataclasses.replace(self.config, capacity=new_cap)
        # deliberately NO resolver.reserve() here: prewarm_grow traces
        # growth on a shallow CLONE from a background thread, and the
        # clone SHARES the resolver — a reserve() would race live
        # resolves. The maps grow organically (amortized O(1)).
        self._last_cap_ovf = self._resolver.stats()[1]
        return new_state, slot_state

    def index_view(self, state):
        return None  # no device index; health comes from host_health()

    def device_view(self):
        """A plain device-index `EmbeddingCollection` over the same
        columns/config: what SERVING uses. A predictor rebuilds its table
        from the checkpoint (the formats are interchangeable) and probes
        it on-device — it neither needs nor should share the training
        job's host resolver. `serving.Predictor` unwraps automatically."""
        view = EmbeddingCollection.__new__(EmbeddingCollection)
        view.__dict__.update({k: v for k, v in self.__dict__.items()
                              if not k.startswith("_resolver")
                              and k not in ("_last_cap_ovf", "_sat_steps",
                                            "_max_nu")})
        return view

    def host_health(self) -> Dict[str, int]:
        """Same schema as Trainer.table_health's device rows, so the CLI
        watchdog (auto-raise max_unique, growth alarms) works unchanged."""
        size, cap_ovf, uniq_ovf = self._resolver.stats()
        return {"size": size, "capacity": self.config.capacity,
                "shards": 1,
                "load_factor": size / self.config.capacity,
                "overflow": cap_ovf, "dropped": 0,
                "unique_saturated_steps": self._sat_steps,
                "max_n_unique": self._max_nu,
                "unique_overflow": uniq_ovf,
                "max_unique": self.config.max_unique}

    # -- mesh hooks: unsupported -------------------------------------------
    _MESH_MSG = ("HostIndexEmbeddingCollection is single-controller only; "
                 "the sharded exchange probes owner shards on-device — use "
                 "the device-index EmbeddingCollection under ShardedTrainer")

    def sharded_table_spec(self, *a, **kw):
        raise NotImplementedError(self._MESH_MSG)

    def sharded_init_local(self, *a, **kw):
        raise NotImplementedError(self._MESH_MSG)

    def sharded_lookup_or_create(self, *a, **kw):
        raise NotImplementedError(self._MESH_MSG)

    # -- checkpoint ---------------------------------------------------------
    def ckpt_arrays(self, bundle, num_shards, since, evict, global_step):
        """The standard 4-array compacted format — keys from the host
        index (slot order), rows from the device stores. Interchangeable
        with device-path checkpoints (tests/test_host_index.py)."""
        from .checkpoint import format as F
        if num_shards != 1:
            raise NotImplementedError("host-index tables are unsharded")
        cfg = self.config
        st = bundle.ev
        n = self._resolver.size
        keys = self._resolver.export_keys()
        values = np.asarray(st.values[:n])
        freqs = np.asarray(st.freqs[:n])
        versions = np.asarray(st.versions[:n])
        create_steps = np.asarray(st.create_steps[:n])

        touched = None
        if since is not None and not cfg.version_tracked:
            # light layout: true delta from the resolver's touched-slot
            # recorder (cleared here — this save is the window boundary)
            touched = self._resolver.touched_slots(clear=True)
            touched = touched[touched < n]
            since = None
        live = np.ones((n,), bool)
        if evict and cfg.evict is not None and global_step is not None:
            live &= ~ev.cold_mask_np(cfg, values, versions, live,
                                     global_step)
        if since is not None:
            live &= versions >= since
        if touched is not None:
            sel = np.zeros((n,), bool)
            sel[touched] = True
            live &= sel
        elif since is None and not cfg.version_tracked:
            # full save resets the light-layout recording window too
            self._resolver.touched_slots(clear=True)
        idx = np.nonzero(live)[0]

        out = {"keys": keys[idx], "values": values[idx],
               "freqs": freqs[idx], "versions": versions[idx],
               "create_steps": create_steps[idx]}
        if cfg.cbf_filter is not None:
            # same layout as the device engine's checkpoint (pre-admission
            # counts are training state; restores on either engine resume
            # admission exactly)
            out["cbf"] = self._resolver.cbf_export()
            out["cbf_shards"] = np.asarray(1, np.int32)
        for name, leaf in F.slot_leaf_names(bundle.slot):
            if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == cfg.capacity + 1:
                out[f"slot__{name}"] = np.asarray(leaf[:n])[idx]
            else:
                out[f"scalar__{name}"] = np.asarray(leaf)
        return out

    def ckpt_restore(self, trainer, template, parts, num_shards):
        """Rebuild (host index + device stores) from saved parts — the
        parts may come from a DEVICE-index table's checkpoint (generic
        4-array format); last-written row wins across base+incrementals."""
        from .checkpoint import format as F
        from .checkpoint.saver import last_wins_sel, needed_capacity
        if num_shards != 1:
            raise NotImplementedError("host-index tables are unsharded")
        cfg = self.config
        parts = [p for p in parts if "keys" in p]
        all_keys = np.concatenate([p["keys"] for p in parts])
        sel = last_wins_sel(all_keys)
        n = sel.shape[0]

        cap = needed_capacity(n + 8, cfg.capacity, load=0.9)
        if cap != cfg.capacity:
            self.config = dataclasses.replace(cfg, capacity=cap)
            cfg = self.config
            trainer.rejit()
        width = cfg.embedding_dim + cfg.fused_slot_columns

        def merged(key):
            return np.concatenate([p[key] for p in parts])[sel]

        self._resolver.load_keys(all_keys[sel])
        self._resolver.reserve(min(cap, 1 << 22))
        if cfg.cbf_filter is not None:
            from .checkpoint.saver import _cbf_for_shard
            cbf_parts = [p for p in parts
                         if "cbf" in p or any(k.startswith("cbf__shard")
                                              for k in p)]
            if cbf_parts:  # newest part's counters win (same-shape load;
                # reshard folding handled by _cbf_for_shard)
                counters = _cbf_for_shard(cbf_parts[-1], 0, 1)
                if (counters is not None and counters.shape[0]
                        == self.config.cbf_filter.num_counters()):
                    self._resolver.cbf_load(counters)

        def dense(col, fill, dtype, extra_shape=()):
            out = np.full((cap + 1,) + extra_shape, fill, dtype)
            out[:n] = merged(col)
            return out

        st = HostEVState(
            values=jnp.asarray(dense("values", 0,
                                     np.dtype(cfg.value_dtype), (width,))),
            freqs=jnp.asarray(dense("freqs", 0, np.int32)),
            versions=jnp.asarray(dense("versions", -1, np.int32)),
            create_steps=jnp.asarray(dense("create_steps", -1, np.int32)),
        )
        opt = trainer.sparse_optimizers[
            next(k for k, c in trainer.collections.items() if c is self)]
        slot = opt.init(st.values)
        flat = F.slot_leaf_names(slot)
        treedef = jax.tree_util.tree_structure(slot)
        leaves = []
        # scalars: the newest part that carries the leaf wins
        for name, leaf in flat:
            rk, sk = f"slot__{name}", f"scalar__{name}"
            if all(rk in p for p in parts):
                rows = np.concatenate([p[rk] for p in parts])[sel]
                buf = np.array(leaf)  # writable host copy
                buf[:n] = rows
                leaves.append(jnp.asarray(buf))
            elif any(sk in p for p in parts):
                val = [p[sk] for p in parts if sk in p][-1]
                leaves.append(jnp.asarray(val, leaf.dtype))
            else:
                leaves.append(leaf)
        slot = jax.tree_util.tree_unflatten(treedef, leaves)
        return template._replace(ev=st, slot=slot)
