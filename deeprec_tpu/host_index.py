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
capacity growth, the max_unique overflow group, true touched-key
incremental deltas for light-layout tables (the resolver records touched
slots — the reference's RecordSparseIndices role), and TIERED storage
(HBM_DRAM / HBM_DRAM_SSD): demotion compacts the resolver + row stores
at fence points, and promotion rides the resolve wire — the host probes
the tier at resolve time and ships re-touched rows' payload WITH the
batch, zero extra device dispatches (tests/test_host_tiered.py asserts
key-map equality with the device-engine TieredTrainer). Not supported
here: mesh sharding beyond one controller (see parallel/host_sharded.py)
and CBF admission on a TIERED table (the bloom gate would deny a
returning demoted key its slot; CounterFilter + tier is supported).
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

    Tiered tables add two optional PROMO planes (``promo_lanes`` int32
    [P], padded with U = out-of-bounds; ``promo_payload`` float32
    [P, W] tier_payload rows): keys re-touched after a demotion, looked
    up in the host tier AT RESOLVE TIME — the payload travels with the
    batch and is scattered back into the stores inside the SAME jitted
    step (``apply_promo``), so promotion costs zero extra device
    dispatches (the device-index engine pays one promote-insert dispatch
    per hit batch; reference analog: the CPU ValuePtr tiers behind
    embedding_var.h:221 where promotion is a host pointer move).
    `decode` clears ``created`` on promo lanes so lazy/eager init never
    overwrites a promoted row — and readonly (eval) resolves patch the
    gathered rows directly, mutating nothing.
    """

    __slots__ = ("buf", "u", "n", "with_counts", "inv16", "promo")

    def __init__(self, buf, u: int, n: int, with_counts: bool, inv16: bool,
                 promo=None):
        self.buf = buf  # uint8 [wire_layout(...)[0]]
        self.u = int(u)
        self.n = int(n)
        self.with_counts = bool(with_counts)
        self.inv16 = bool(inv16)
        self.promo = promo  # None | (lanes i32 [P], payload f32 [P, W])

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
        if self.promo is not None:
            # a promoted row is RESTORED training state, not a fresh key:
            # init paths (lazy gather-add / eager row write) must skip it
            created = created.at[self.promo[0]].set(False, mode="drop")
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


def _wire_flatten(w):
    if w.promo is None:
        return (w.buf,), (w.u, w.n, w.with_counts, w.inv16, False)
    return ((w.buf,) + tuple(w.promo),
            (w.u, w.n, w.with_counts, w.inv16, True))


def _wire_unflatten(meta, children):
    u, n, wc, inv16, has_promo = meta
    promo = tuple(children[1:]) if has_promo else None
    return ResolvedWire(children[0], u, n, wc, inv16, promo=promo)


jax.tree_util.register_pytree_node(ResolvedWire, _wire_flatten,
                                   _wire_unflatten)


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
        self.tier_store = None   # host tier (HostKV/TierStack), lazy
        self._tier_since_save = set()  # keys demoted since the last save
        self._tiered = self.config.storage.storage_type is not StorageType.HBM
        if self._tiered and self.config.cbf_filter is not None:
            # the resolver's bloom gate would deny a slot to a returning
            # demoted key until its estimate re-crosses filter_freq,
            # diverging from the device engine (whose promote-insert
            # bypasses admission for once-admitted rows). Justified
            # rejection until the resolver grows a force-insert API.
            raise NotImplementedError(
                "host-index tiered storage with CBF admission: use "
                "CounterFilter, or the device-index EmbeddingCollection")
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
        self.tier_store = None
        self._tier_since_save = set()
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

    def _resolve(self, batch, readonly: bool,
                 to_device: bool = True) -> ResolvedWire:
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
        promo = self._tier_promo(buf, u_out, readonly) if self._tiered \
            else None
        if to_device:
            buf = jnp.asarray(buf)
            if promo is not None:
                promo = (jnp.asarray(promo[0]), jnp.asarray(promo[1]))
        return ResolvedWire(buf=buf, u=u_out, n=n,
                            with_counts=with_counts, inv16=inv16,
                            promo=promo)

    def _tier_promo(self, buf: np.ndarray, u_out: int, readonly: bool):
        """Host half of tier promotion, run AT RESOLVE TIME (stage R of
        the pipeline): created (train) / missing (readonly) lanes probe
        the host tier; hits become the wire's promo planes and — train
        only — leave the tier (their payload is now in flight to HBM).
        Zero device round-trips: the reference's CPU tiers did promotion
        as a host pointer move (embedding/storage.h), and the resolver
        is exactly that host."""
        if self.tier_store is None or len(self.tier_store) == 0:
            return None
        p32 = buf[:12 * u_out].view(np.int32)
        sf = p32[:u_out]
        lanes = np.nonzero((sf >> 30) & 1)[0].astype(np.int32)
        if not lanes.size:
            return None
        hi = p32[u_out:2 * u_out][lanes].astype(np.int64)
        lo = p32[2 * u_out:3 * u_out][lanes].astype(np.uint32)
        keys = (hi << 32) | lo.astype(np.int64)
        rows, found = self.tier_store.lookup(keys)
        if not found.any():
            return None
        lanes = lanes[found]
        rows = rows[found]
        if not readonly:
            hit_keys = keys[found]
            self.tier_store.erase(hit_keys)
            self._tier_since_save.difference_update(
                int(k) for k in hit_keys)
        m = lanes.shape[0]
        P = max(8, 1 << (m - 1).bit_length())  # pow2 pad bounds retraces
        pl = np.full((P,), u_out, np.int32)    # pad = U -> OOB, dropped
        pl[:m] = lanes
        pp = np.zeros((P, rows.shape[1]), np.float32)
        pp[:m] = rows
        return pl, pp

    def pack_ids(self, batch) -> ResolvedIds:
        """Train-path host resolve (find-or-insert; mutates the index —
        call once per training batch, in step order)."""
        return self._resolve(batch, readonly=False)

    def pack_ids_host(self, batch) -> ResolvedWire:
        """Train resolve with a HOST (numpy) wire buffer: the resolve
        stage of train.pipeline.HostStepPipeline — its transfer thread
        device_puts the wire, so the blocking H2D never runs on the
        dispatch thread. Same index mutation/step-order rules as
        :meth:`pack_ids`."""
        return self._resolve(batch, readonly=False, to_device=False)

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

    # -- tiered storage (HBM + host DRAM/SSD) ------------------------------
    def apply_promo(self, state: HostEVState, slot_state, wire):
        """Traced promotion: scatter the wire's tier-promoted payload rows
        (values + exact-bit meta + optimizer slot rows, tier_payload
        layout) into the stores, INSIDE the train step — the host already
        did the tier lookup at resolve time (`_tier_promo`), so promotion
        costs zero extra device dispatches. Pytree-static no-op when the
        wire carries no promo planes. Runs BEFORE lookup_or_create so the
        batch's freq/version scatters land on top of the restored row
        (device-engine promote-then-lookup order,
        train/tiered_trainer.py:114-117)."""
        if not isinstance(wire, ResolvedWire) or wire.promo is None:
            return state, slot_state
        from .sparse import tier_payload as TP
        lanes, payload = wire.promo
        cfg = self.config
        cap = cfg.capacity
        U = wire.u
        # slots of the promo lanes, from the wire's slots plane
        sl = jax.lax.dynamic_slice_in_dim(wire.buf, 0, U * 4)
        sf = jax.lax.bitcast_convert_type(sl.reshape(U, 4), jnp.int32)
        slots = (sf & ((1 << 30) - 1))[jnp.minimum(lanes, U - 1)]
        valid = (lanes < U) & (slots != cap)
        dest = jnp.where(valid, slots, cap + 1)  # OOB -> dropped
        spec = TP.spec(state.values.shape[1], slot_state, cap + 1)
        dim = spec.dim
        values = state.values.at[dest].set(
            payload[:, :dim].astype(state.values.dtype), mode="drop",
            unique_indices=True)
        freqs = state.freqs.at[dest].set(
            TP._from_f32_bits(payload[:, dim], jnp.int32), mode="drop",
            unique_indices=True)
        versions = state.versions.at[dest].set(
            TP._from_f32_bits(payload[:, dim + 1], jnp.int32), mode="drop",
            unique_indices=True)
        create_steps = state.create_steps.at[dest].set(
            TP._from_f32_bits(payload[:, dim + 2], jnp.int32), mode="drop",
            unique_indices=True)
        o = dim + 3
        leaves = list(jax.tree_util.tree_leaves(slot_state))
        treedef = jax.tree_util.tree_structure(slot_state)
        P = lanes.shape[0]
        for s in spec.slot_rows:
            part = TP._from_f32_bits(payload[:, o:o + s.width],
                                     s.dtype).reshape((P,) + s.shape)
            leaves[s.index] = leaves[s.index].at[dest].set(
                part, mode="drop", unique_indices=True)
            o += s.width
        slot_state = jax.tree_util.tree_unflatten(treedef, leaves)
        return HostEVState(values=values, freqs=freqs, versions=versions,
                           create_steps=create_steps), slot_state

    def _make_tier(self, width: int):
        st = self.config.storage
        from .config import StorageType
        if st.storage_type is StorageType.HBM_DRAM_SSD:
            import os
            import tempfile
            from .utils.native import TierStack
            path = st.ssd_path or os.path.join(
                tempfile.gettempdir(),
                f"deeprec_hidx_ssd_{self.config.name}_{os.getpid()}.arena")
            # version col inside the payload: values block, freq, THEN
            # version (tier_payload layout)
            vcol = self.config.embedding_dim \
                + self.config.fused_slot_columns + 1
            return TierStack(width, vcol, st.dram_row_budget, path)
        from .utils.native import HostKV
        return HostKV(width, 1 << 16)

    def demote_cold(self, state: HostEVState, slot_state, global_step: int,
                    opt=None):
        """Move policy-cold (and HBM-budget-excess) rows to the host tier
        and compact the resolver + row stores. Call at FENCE points only
        (pipeline drained — in-flight resolves hold slot numbers this
        renumbers). Returns (state, slot_state, n_demoted).

        Predicates are the shared host definitions (ev.cold_mask_np /
        ev.budget_cold_np — same as the device engine and the checkpoint
        saver, so the three can never diverge). D2H cost: the [size]
        version/freq planes + only the DEMOTED rows' payload (the device
        engine's sweep pulls the full value store; here values transfer
        only under an L2 policy, which needs norms)."""
        from .config import L2WeightEvict
        from .optim.sparse import permute_slot_state
        from .sparse import tier_payload as TP
        cfg = self.config
        budget = cfg.storage.hbm_capacity
        if cfg.evict is None and budget <= 0:
            return state, slot_state, 0
        n = self._resolver.size
        if n == 0:
            return state, slot_state, 0
        # pow2-padded device reads: each DISTINCT shape is a fresh XLA
        # compile — unpadded sweeps compiled per live-row/cold count and
        # stalled fences for minutes on a slow-compile link
        np2 = min(1 << (max(n, 8) - 1).bit_length(), state.capacity)
        versions = np.asarray(state.versions[:np2])[:n]
        freqs = np.asarray(state.freqs[:np2])[:n]
        occupied = np.ones((n,), bool)
        values_np = (np.asarray(state.values[:np2])[:n]
                     if isinstance(cfg.evict, L2WeightEvict)
                     else np.zeros((n, 1), np.float32))
        cold = ev.cold_mask_np(cfg, values_np, versions, occupied,
                               int(global_step))
        cold = ev.budget_cold_np(cfg, versions, freqs, occupied, cold,
                                 budget)
        if not cold.any():
            return state, slot_state, 0
        idx = np.nonzero(cold)[0]
        keys = self._resolver.export_keys()
        keys_cold = keys[idx]

        # payload: gather ONLY the cold rows on device, then one D2H
        # (cold index pow2-padded with the null row for the same reason)
        spec = TP.spec(state.values.shape[1], slot_state, cfg.capacity + 1)
        m = idx.shape[0]
        mp2 = 1 << (max(m, 8) - 1).bit_length()
        didx = np.full((mp2,), state.capacity, np.int32)
        didx[:m] = idx
        didx = jnp.asarray(didx)
        vals_cold = np.asarray(state.values[didx])[:m]
        cs_cold = np.asarray(state.create_steps[didx])[:m]
        leaves = list(jax.tree_util.tree_leaves(slot_state))
        leaves_cold = list(leaves)
        for s in spec.slot_rows:
            leaves_cold[s.index] = np.asarray(leaves[s.index][didx])[:m]
        payload = TP.pack_np(spec, np.arange(m), vals_cold,
                             freqs[idx], versions[idx], cs_cold,
                             leaves_cold)
        if self.tier_store is None:
            self.tier_store = self._make_tier(spec.width)
        assert self.tier_store.dim == spec.width, \
            "payload width changed under the tier (optimizer swap?)"
        self.tier_store.upsert(keys_cold, payload)
        self._tier_since_save.update(int(k) for k in keys_cold)

        # compact: resolver renumbers kept slots densely; device stores
        # follow with one scatter-permute (dropped rows -> cap+1 = drop)
        keep = ~cold
        old_to_new = self._resolver.compact(keep.astype(np.uint8))
        cap = cfg.capacity
        o2n = np.full((cap,), cap + 1, np.int32)
        o2n[:n] = np.where(old_to_new >= 0, old_to_new, cap + 1)
        perm = jnp.asarray(o2n)
        new_state = HostEVState(
            values=ev.permute_rows(state.values, perm, cap),
            freqs=ev.permute_rows(state.freqs, perm, cap),
            versions=ev.permute_rows(state.versions, perm, cap, fill=-1),
            create_steps=ev.permute_rows(state.create_steps, perm, cap,
                                         fill=-1),
        )
        slot_state = permute_slot_state(slot_state, perm, cap,
                                        fills=opt.fills if opt else None)
        return new_state, slot_state, int(idx.shape[0])

    def export_tier(self, since=None):
        """(keys, payload rows) for the checkpoint saver's __tier__ table.
        ``since`` (incremental save) filters to rows demoted since the
        last save — tracked as an exact key set, so light-layout tiered
        tables get true deltas too. Clears the window (this save is its
        boundary)."""
        if self.tier_store is None or len(self.tier_store) == 0:
            self._tier_since_save.clear()
            return None
        keys, rows = self.tier_store.export()
        if since is not None:
            if self._tier_since_save:
                sel = np.isin(keys, np.fromiter(self._tier_since_save,
                                                np.int64,
                                                len(self._tier_since_save)))
                keys, rows = keys[sel], rows[sel]
            else:
                keys = keys[:0]
                rows = rows[:0]
        self._tier_since_save.clear()
        if not len(keys):
            return None
        return keys, rows

    def import_tier(self, keys: np.ndarray, rows: np.ndarray):
        """Restore demoted rows into the host tier (lazily created at the
        restored payload width)."""
        if self.tier_store is None:
            self.tier_store = self._make_tier(rows.shape[1])
        self.tier_store.upsert(keys, rows)

    def host_tier_rows(self) -> int:
        return len(self.tier_store) if self.tier_store is not None else 0

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
        if isinstance(cats, ResolvedWire) and cats.promo is not None:
            # tier-demoted keys read their SAVED rows (readonly resolve:
            # no mutation — the payload patches the gathered rows only;
            # decode already marked these lanes found)
            lanes, payload = cats.promo
            rows = rows.at[lanes].set(
                payload[:, : cfg.embedding_dim].astype(rows.dtype),
                mode="drop")
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
                                            "_max_nu", "tier_store",
                                            "_tier_since_save", "_tiered")})
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
        # pow2-padded reads: distinct slice shapes are distinct compiles
        np2 = min(1 << (max(n, 8) - 1).bit_length(), st.capacity)
        values = np.asarray(st.values[:np2])[:n]
        freqs = np.asarray(st.freqs[:np2])[:n]
        versions = np.asarray(st.versions[:np2])[:n]
        create_steps = np.asarray(st.create_steps[:np2])[:n]

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
                out[f"slot__{name}"] = np.asarray(leaf[:np2])[:n][idx]
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
        self.tier_store = None          # tier rebuilt by the saver's
        self._tier_since_save = set()   # import_tier pass after this
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
