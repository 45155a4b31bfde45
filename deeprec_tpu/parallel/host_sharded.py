"""Host-sharded embedding: the host-index fast path on a device mesh.

Single-controller multi-chip pods (e.g. one host driving a v5e-8) are the
most common training/serving cell, and there the controller host sees
EVERY device's batch shard. This module exploits that the same way
``host_index.py`` does on one chip: the host resolves the WHOLE sharded
lookup — per-requester dedup, owner routing, per-owner dedup and dense
slot assignment (one :class:`HostIndexResolver` per shard) — while the
devices execute the previous step. The per-device program keeps only the
irreducible mesh work:

    owner gather (rows at host-assigned slots) -> all_to_all rows back ->
    unbucket -> pool -> [autodiff reverse exchange] -> segment-sum ->
    optimizer scatter

i.e. NO dedup sorts, NO bucket-position sort, NO owner-side recv dedup,
NO hash probe, and NO id all_to_all at all (ids never travel — the host
already knows each owner's recv set; only rows ride the interconnect,
halving the collective count of the device-index exchange).

Semantics match the device-index sharded engine: owner-side admission /
freq / version bookkeeping (global counts), per-requester multiplicity
freq increments, bucket-overflow drops counted in health, the 4-array
checkpoint format routed by the same owner hash (OWNER_SEED) so saves
reshard into any engine at any shard count.

Multi-process meshes (round 5): each process's resolvers own the table
shards of its LOCAL devices, and the requester buckets routed to remote
shards ride a host-to-host all-to-all (`parallel/host_exchange.py`, one
TCP frame per peer per step over the cluster the job already stands on)
— ids travel HOST-side, one step ahead, and the device program stays
identical (gathers + the rows all_to_all). A soft one-step-ahead
deadline is tracked as ``exchange_late_steps`` in host_health; late
frames still complete the step correctly (correctness over the
deadline; the CLI watchdog surfaces the misses).

Reference lineage: this is the PS architecture with the PS update
*pre-computed*: DeepRec's workers RPC ids to parameter servers whose CPU
hash maps resolve them mid-step (dense_hash_map.h; star_server pull/push
— star_worker_service.h:60-61) — here every process is the
parameter-server CPU for its own shards, one step ahead of the devices.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..feature_column import CollectionAux
from ..host_index import HostEVState, HostIndexEmbeddingCollection, ResolvedIds
from ..ops.unique import UniqueResult
from ..sparse import embedding_var as ev
from ..sparse import keys as K
from ..utils.native import HostIndexResolver

OWNER_SEED = 13  # == parallel/sharded.OWNER_SEED == checkpoint/saver


class HostShardedWire:
    """One int32 buffer per device, stacked [S, K] and row-sharded over
    the mesh axis (ONE transfer per step). Per-device layout:

    ``[inv_local(Nl) | u_idx_signed(Uc) | hi(Ur) | lo(Ur) | uslots(Ur) |
    counts|created<<30 (Ur) | inv_recv(S*C) | n_dropped, sat, readonly, 0]``

    where ``u_idx_signed[u] = owner*C + pos`` of local unique u in the
    rows-back exchange, or -1 for EMPTY/dropped uniques. The size fields
    are pytree-static (they set the decode slicing)."""

    __slots__ = ("buf", "n_local", "u_cap", "ur", "sc")

    def __init__(self, buf, n_local: int, u_cap: int, ur: int, sc: int):
        self.buf = buf
        self.n_local = int(n_local)
        self.u_cap = int(u_cap)
        self.ur = int(ur)
        self.sc = int(sc)

    @property
    def shape(self):  # duck-typing for trainer shape probes
        return self.buf.shape

    def decode_local(self):
        """Decode THE LOCAL device's row (call inside shard_map on the
        [1, K] view). Returns (inv_local, u_idx_signed, owner ResolvedIds,
        n_dropped, sat, readonly)."""
        b = self.buf.reshape(-1)
        Nl, Uc, Ur, SC = self.n_local, self.u_cap, self.ur, self.sc
        o = 0
        inv_local = b[o:o + Nl]; o += Nl
        u_idx = b[o:o + Uc]; o += Uc
        hi = b[o:o + Ur]; o += Ur
        lo = b[o:o + Ur]; o += Ur
        uslots = b[o:o + Ur]; o += Ur
        pc = b[o:o + Ur]; o += Ur
        inv_recv = b[o:o + SC]; o += SC
        tail = b[o:]
        owner = ResolvedIds(
            ukeys=K.Keys(hi, lo), uslots=uslots, inverse=inv_recv,
            created=(pc >> 30) & 1 == 1, counts=pc & ((1 << 30) - 1),
            n_unique=jnp.sum(pc > 0), n_overflow=tail[1],
            readonly=tail[2] == 1)
        return inv_local, u_idx, owner, tail[0], tail[1], tail[2] == 1


jax.tree_util.register_pytree_node(
    HostShardedWire,
    lambda w: ((w.buf,), (w.n_local, w.u_cap, w.ur, w.sc)),
    lambda aux, ch: HostShardedWire(ch[0], *aux),
)


class HSAux(NamedTuple):
    """Per-device aux of one host-sharded exchange."""

    owner_aux: CollectionAux  # owner-side lookup aux (recv lanes)
    inv_local: jax.Array      # [Nl] flat position -> local unique
    u_idx: jax.Array          # [Uc] signed rows-back index (-1 = invalid)
    n_dropped: jax.Array      # int32 scalar (bucket overflow, this step)
    sat: jax.Array            # int32 scalar (unique-width overflow flag)


def _positions_by_owner(owner: np.ndarray, S: int) -> np.ndarray:
    """Rank of each element among same-owner elements (numpy, O(n))."""
    pos = np.empty_like(owner)
    seen = np.zeros((S + 1,), np.int64)
    # vectorized counting sort: order by owner (stable), rank within runs
    order = np.argsort(owner, kind="stable")
    so = owner[order]
    starts = np.r_[0, np.flatnonzero(so[1:] != so[:-1]) + 1]
    run_id = np.zeros(len(so), np.int64)
    run_id[starts[1:]] = 1
    run_id = np.cumsum(run_id)
    rank_in_run = np.arange(len(so)) - starts[run_id]
    pos[order] = rank_in_run
    return pos.astype(np.int32)


class HostShardedCollection(HostIndexEmbeddingCollection):
    """Drop-in collection for ``ShardedTrainer``: the host(s) resolve
    every shard's lookup one step ahead — single-controller meshes
    locally, multi-process meshes via the host bucket exchange (module
    docstring)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self._tiered:
            raise NotImplementedError(
                "tiered storage on the host-SHARDED engine: use the "
                "single-chip HostIndexEmbeddingCollection (tiering rides "
                "its resolve wire) or TieredShardedTrainer with the "
                "device-index EmbeddingCollection on meshes")
        self._shard_resolvers: Optional[List[HostIndexResolver]] = None
        self._dedup_resolvers: Optional[List[HostIndexResolver]] = None
        self._S = None
        self._S_local = None   # shards/devices owned by THIS process
        self._lo = 0           # first global shard id owned here
        self._nproc = 1
        self._pid = 0
        self._hx = None        # HostBucketExchange on multi-process meshes
        self._hs_dropped = 0   # cumulative host-side health counters
        self._hs_sat = 0       # (per-PROCESS on multi-process meshes)
        self._hs_cap_ovf_seen = 0

    # -- host side ---------------------------------------------------------
    def _ensure_shards(self, S: int, mesh=None, axis=None):
        if self._S not in (None, S):
            raise ValueError(f"mesh size changed {self._S} -> {S}")
        if self._shard_resolvers is None:
            self._S = S
            self._nproc = jax.process_count()
            self._pid = jax.process_index()
            if self._nproc > 1:
                # per-process resolvers own the LOCAL shards; requester
                # buckets for remote shards ride the host exchange one
                # step ahead (the StarServer pull/push role,
                # star_worker_service.h:60-61)
                from .multihost import local_shard_range
                assert mesh is not None, "first pack must pass the mesh"
                self._lo, hi = local_shard_range(mesh, axis, S)
                self._S_local = hi - self._lo
                from .host_exchange import HostBucketExchange
                # soft one-step-ahead deadline: a sharded train step is
                # single-digit-ms on chip; 50 ms of host exchange means
                # the resolve can no longer hide under it — count it
                # (host_health "exchange_late_steps"; the CLI watchdog
                # alarms), but always complete the step
                self._hx = HostBucketExchange(tag=f"hs-{self.config.name}",
                                              deadline_ms=50.0)
            else:
                self._S_local = S
            ng = self._resolver.n_groups
            SL = self._S_local
            self._shard_resolvers = [HostIndexResolver(n_groups=ng)
                                     for _ in range(SL)]
            # requester-side pure dedupers: row_capacity=0 keeps every key
            # PENDING forever — we use only the batch-local lanes/inverse
            self._dedup_resolvers = [HostIndexResolver(n_groups=ng)
                                     for _ in range(SL)]

    def sharded_pack(self, batch, S: int, bucket_cap: int, mesh, axis,
                     train: bool = True) -> HostShardedWire:
        """The whole exchange, resolved on host: returns the stacked
        per-device wire (row-sharded over the mesh axis).

        Single-controller meshes resolve everything locally. On a
        multi-process mesh each process packs only its LOCAL devices'
        batch slice, ships the buckets routed to remote shards over the
        host exchange (one frame per peer), resolves its OWN shards'
        receive sets, and contributes its local rows of the global wire
        (multihost.globalize) — devices still see the identical program.
        """
        from .multihost import globalize
        from jax.sharding import PartitionSpec as P2
        self._ensure_shards(S, mesh, axis)
        SL = self._S_local
        lo = self._lo
        packed = batch if isinstance(batch, np.ndarray) \
            else self.pack_ids_np(batch)            # [W, B_local]
        W, B = packed.shape
        Bl = B // SL
        Nl = W * Bl
        cap = self.config.capacity
        Uc = (self.config.max_unique + 1 if self.config.max_unique
              else Nl + 1)
        Ur = Uc
        C = int(bucket_cap)
        SC = S * C

        send_keys = np.full((SL, S, C), -1, np.int64)
        send_counts = np.zeros((SL, S, C), np.int32)
        req_inv = np.empty((SL, Nl), np.int32)
        req_uidx = np.full((SL, Uc), -1, np.int32)
        dropped = np.zeros((SL,), np.int32)
        sat = np.zeros((SL,), np.int32)

        for d in range(SL):
            ids_d = packed[:, d * Bl:(d + 1) * Bl].reshape(-1)
            uk, _us, inv, _cr, ct, nu, nov = self._dedup_resolvers[d].resolve(
                ids_d, Uc, 0, 0)  # row_capacity=0: dedup only
            req_inv[d] = inv
            sat[d] = int(nov > 0)
            valid = uk != -1
            own = np.where(
                valid,
                (K.hash32_np(uk, seed=OWNER_SEED) % np.uint32(S))
                .astype(np.int32),
                S)
            pos = _positions_by_owner(own, S)
            routed = valid & (own < S) & (pos < C)
            dropped[d] = int((valid & (pos >= C) & (own < S)).sum())
            ro, rp = own[routed], pos[routed]
            send_keys[d, ro, rp] = uk[routed]
            send_counts[d, ro, rp] = ct[routed]
            req_uidx[d] = np.where(routed, own * C + pos, -1)

        # receive sets for the LOCAL shards: [SL owners, S requesters, C],
        # requester rows in GLOBAL device order (bit-parity with the
        # single-controller resolve order)
        if self._nproc > 1:
            blobs = []
            for q in range(self._nproc):
                if q == self._pid:
                    blobs.append(b"")
                    continue
                kq = np.ascontiguousarray(
                    send_keys[:, q * SL:(q + 1) * SL, :])
                cq = np.ascontiguousarray(
                    send_counts[:, q * SL:(q + 1) * SL, :])
                blobs.append(kq.tobytes() + cq.tobytes())
            recvs = self._hx.all_to_all(blobs)
            recv_keys = np.full((SL, S, C), -1, np.int64)
            recv_counts = np.zeros((SL, S, C), np.int32)
            recv_keys[:, lo:lo + SL] = \
                send_keys[:, lo:lo + SL].transpose(1, 0, 2)
            recv_counts[:, lo:lo + SL] = \
                send_counts[:, lo:lo + SL].transpose(1, 0, 2)
            nk = SL * SL * C * 8
            for q in range(self._nproc):
                if q == self._pid:
                    continue
                kq = np.frombuffer(recvs[q][:nk],
                                   np.int64).reshape(SL, SL, C)
                cq = np.frombuffer(recvs[q][nk:],
                                   np.int32).reshape(SL, SL, C)
                recv_keys[:, q * SL:(q + 1) * SL] = kq.transpose(1, 0, 2)
                recv_counts[:, q * SL:(q + 1) * SL] = cq.transpose(1, 0, 2)
        else:
            recv_keys = send_keys.transpose(1, 0, 2)
            recv_counts = send_counts.transpose(1, 0, 2)

        owner_hi = np.empty((SL, Ur), np.int32)
        owner_lo = np.empty((SL, Ur), np.int32)
        owner_slots = np.empty((SL, Ur), np.int32)
        owner_pc = np.empty((SL, Ur), np.int32)
        owner_inv = np.empty((SL, SC), np.int32)
        owner_nov = np.zeros((SL,), np.int32)
        for o in range(SL):
            recv = recv_keys[o].reshape(-1)                # [S*C]
            rc = recv_counts[o].reshape(-1)
            uk, us, inv, cr, _ct, nu, nov = self._shard_resolvers[o].resolve(
                recv, Ur, cap, cap, readonly=not train)
            # freq increments = per-requester multiplicities summed per
            # owner lane (reference AddFreq(count) semantics)
            freq = np.bincount(inv, weights=rc,
                               minlength=Ur)[:Ur].astype(np.int32)
            hi, lo32 = K.split_np(uk)
            owner_hi[o], owner_lo[o] = hi, lo32
            owner_slots[o] = us
            owner_pc[o] = freq | (cr.astype(np.int32) << 30)
            owner_inv[o] = inv
            owner_nov[o] = nov
        if train:
            self._hs_dropped += int(dropped.sum())
            self._hs_sat += int(sat.max())

        Ktot = Nl + Uc + 4 * Ur + SC + 4
        wire = np.empty((SL, Ktot), np.int32)
        o = 0
        wire[:, o:o + Nl] = req_inv; o += Nl
        wire[:, o:o + Uc] = req_uidx; o += Uc
        wire[:, o:o + Ur] = owner_hi; o += Ur
        wire[:, o:o + Ur] = owner_lo; o += Ur
        wire[:, o:o + Ur] = owner_slots; o += Ur
        wire[:, o:o + Ur] = owner_pc; o += Ur
        wire[:, o:o + SC] = owner_inv; o += SC
        wire[:, o] = dropped
        wire[:, o + 1] = owner_nov
        wire[:, o + 2] = 0 if train else 1
        wire[:, o + 3] = 0
        buf = globalize(mesh, P2(axis, None), wire)
        return HostShardedWire(buf, Nl, Uc, Ur, SC)

    # -- device side (inside shard_map) -------------------------------------
    def sharded_cats_spec(self, axis):
        # a PREFIX spec: applies to the wire's single leaf (the [S, K]
        # buffer), row-sharded over the mesh axis
        from jax.sharding import PartitionSpec as P
        return P(axis, None)

    def sharded_table_spec(self, axis, slot_example):
        from ..train.trainer import TableBundle
        from jax.sharding import PartitionSpec as P
        st = HostEVState(values=P(axis), freqs=P(axis), versions=P(axis),
                         create_steps=P(axis))
        return TableBundle(ev=st, slot=self._ev_slot_spec(axis, slot_example),
                           health=P(axis, None))

    def sharded_init_local(self, opt):
        from ..train.trainer import TableBundle
        st = HostIndexEmbeddingCollection.init(self)  # also resets resolvers
        if self._shard_resolvers is not None:
            for r in self._shard_resolvers:
                r.reset()
            for r in self._dedup_resolvers:
                r.reset()
        return TableBundle(ev=st, slot=self.init_slot(opt, st),
                           health=jnp.zeros((1, 3), jnp.int32))

    def sharded_lookup_or_create(self, state, wire: HostShardedWire, step,
                                 axis, bucket_cap):
        inv_local, u_idx, owner_r, n_dropped, sat, _ro = wire.decode_local()
        # owner-side metadata/init/admission: the single-chip host path's
        # lookup body, applied to THIS shard's local state
        state, owner_aux = HostIndexEmbeddingCollection.lookup_or_create(
            self, state, owner_r, step)
        return state, HSAux(owner_aux=owner_aux, inv_local=inv_local,
                            u_idx=u_idx, n_dropped=n_dropped, sat=sat)

    def sharded_rows(self, state, aux: HSAux):
        """Owner-side rows per received bucket position [S*C, dim] — the
        differentiable leaf (lazy-init created rows read their init)."""
        a = aux.owner_aux.ev_aux
        urows = ev.gather(state.values, a, self.config)
        return urows[a.uniq.inverse]

    def sharded_rows_back(self, urows, aux: HSAux, axis, bucket_cap):
        from . import sharded as _sh
        S = jax.lax.axis_size(axis)
        C = aux.owner_aux.ev_aux.uniq.inverse.shape[0] // S
        d = urows.shape[-1]
        send, out_dtype = _sh._wire(urows, self.config.exchange_dtype)
        back = jax.lax.all_to_all(send.reshape(S, C, d), axis, 0, 0,
                                  tiled=False).astype(out_dtype)
        routed = aux.u_idx >= 0
        idx = jnp.maximum(aux.u_idx, 0)
        row_u = back.reshape(S * C, d)[idx]
        row_u = jnp.where(routed[:, None], row_u, 0.0)
        rows_flat = row_u[aux.inv_local]
        valid_flat = routed[aux.inv_local]
        return rows_flat, valid_flat

    def sharded_apply_gradients(self, state, opt, slot_state, aux: HSAux,
                                d_urows, step, axis, num_shards):
        a = aux.owner_aux.ev_aux
        n = a.uniq.ukeys.shape[0]
        grads_u = jax.ops.segment_sum(d_urows, a.uniq.inverse, n)
        cur = ev.gather(state.values, a, self.config)
        values, slot_state = opt.apply(state.values, slot_state, a.slots,
                                       grads_u, a.admitted, step,
                                       cur_rows=cur, created=a.created)
        return state._replace(values=values), slot_state

    def sharded_readonly(self, state, wire: HostShardedWire, axis,
                         bucket_cap):
        inv_local, u_idx, owner_r, _nd, _sat, _ro = wire.decode_local()
        found = ~owner_r.created  # readonly resolve: created == MISSING
        rows = state.values[owner_r.uslots][:, : self.config.embedding_dim]
        defaults = ev.init_rows(self.config, owner_r.ukeys).astype(rows.dtype)
        valid = ~K.is_empty(owner_r.ukeys)
        urows = jnp.where((found | ~valid)[:, None], rows, defaults)
        aux = HSAux(
            owner_aux=CollectionAux(ev_aux=ev.LookupAux(
                uniq=UniqueResult(ukeys=owner_r.ukeys,
                                  inverse=owner_r.inverse,
                                  counts=owner_r.counts,
                                  n_unique=owner_r.n_unique,
                                  n_overflow=owner_r.n_overflow),
                slots=owner_r.uslots, admitted=found,
                created=jnp.zeros_like(found))),
            inv_local=inv_local, u_idx=u_idx,
            n_dropped=jnp.zeros((), jnp.int32), sat=jnp.zeros((), jnp.int32))
        expanded = urows[owner_r.inverse]
        return self.sharded_rows_back(expanded, aux, axis, bucket_cap)

    def sharded_health(self, health, aux):
        if health is None or not isinstance(aux, HSAux):
            return health
        a = aux.owner_aux.ev_aux
        nu = a.uniq.n_unique.astype(jnp.int32) + a.uniq.n_overflow
        return jnp.stack([health[:, 0] + aux.n_dropped,
                          health[:, 1] + aux.sat,
                          jnp.maximum(health[:, 2], nu)], axis=-1)

    def index_view(self, state):
        return None

    def host_health(self) -> Dict[str, int]:
        if self._shard_resolvers is None:
            return super().host_health()
        sizes = [r.size for r in self._shard_resolvers]
        cap_ovf = sum(r.stats()[1] for r in self._shard_resolvers)
        uniq_ovf = sum(r.stats()[2] for r in self._shard_resolvers)
        out = {"size": int(sum(sizes)), "capacity": self.config.capacity,
               "shards": len(sizes),
               "load_factor": max(sizes) / self.config.capacity,
               "overflow": cap_ovf, "dropped": self._hs_dropped,
               "unique_saturated_steps": self._hs_sat,
               "max_n_unique": 0, "unique_overflow": uniq_ovf,
               "max_unique": self.config.max_unique}
        if self._hx is not None:
            # one-step-ahead deadline misses of the host bucket exchange
            # (soft: the step still completed correctly, just late)
            out["exchange_late_steps"] = self._hx.late_steps
        return out

    # -- growth --------------------------------------------------------------
    def sharded_needs_growth(self, threshold: float = 0.9) -> bool:
        if self._shard_resolvers is None:
            return False
        cap_ovf = sum(r.stats()[1] for r in self._shard_resolvers)
        over = cap_ovf > self._hs_cap_ovf_seen
        lf = max(r.size for r in self._shard_resolvers) / self.config.capacity
        return lf >= threshold or over

    def sharded_grow_local(self, bundle, new_cap, fills):
        """Dense slots never move: pad this shard's row stores."""
        from ..optim.sparse import permute_slot_state
        st = bundle.ev
        cap = st.capacity
        ident = jnp.arange(cap, dtype=jnp.int32)
        new_ev = HostEVState(
            values=ev.permute_rows(st.values, ident, new_cap),
            freqs=ev.permute_rows(st.freqs, ident, new_cap),
            versions=ev.permute_rows(st.versions, ident, new_cap, fill=-1),
            create_steps=ev.permute_rows(st.create_steps, ident, new_cap,
                                         fill=-1))
        slot = permute_slot_state(bundle.slot, ident, new_cap, fills=fills)
        return bundle._replace(ev=new_ev, slot=slot)

    def note_grown(self):
        self._hs_cap_ovf_seen = sum(r.stats()[1]
                                    for r in self._shard_resolvers or [])

    # -- checkpoint ----------------------------------------------------------
    def ckpt_arrays(self, bundle, num_shards, since, evict, global_step):
        from ..checkpoint import format as F
        from .multihost import addressable_blocks
        if self._shard_resolvers is None or num_shards == 1:
            return super().ckpt_arrays(bundle, 1, since, evict, global_step)
        S = num_shards
        cfg = self.config
        cap1 = cfg.capacity + 1
        # host views per GLOBAL shard id — every shard single-process,
        # only this process's shards on a multi-process mesh (each
        # process writes its own checkpoint parts, saver._mp)
        vals = addressable_blocks(bundle.ev.values, S, cap1)
        freqs = addressable_blocks(bundle.ev.freqs, S, cap1)
        vers = addressable_blocks(bundle.ev.versions, S, cap1)
        cs = addressable_blocks(bundle.ev.create_steps, S, cap1)
        slot_leaves = list(F.slot_leaf_names(bundle.slot))

        if since is not None and not cfg.version_tracked:
            import warnings
            warnings.warn(
                f"table {cfg.name!r} has no version tracking: incremental "
                "save falls back to all live rows for it", stacklevel=2)
            since = None

        out_parts = {k: [] for k in ("keys", "values", "freqs", "versions",
                                     "create_steps")}
        slot_parts: Dict[str, list] = {}
        scalars = {}
        for s in sorted(vals):
            r = self._shard_resolvers[s - self._lo]
            n = r.size
            keys = r.export_keys()
            v = vals[s][:n]
            f = freqs[s][:n]
            ve = vers[s][:n]
            c = cs[s][:n]
            live = np.ones((n,), bool)
            if evict and cfg.evict is not None and global_step is not None:
                live &= ~ev.cold_mask_np(cfg, v, ve, live, global_step)
            if since is not None:
                live &= ve >= since
            idx = np.nonzero(live)[0]
            out_parts["keys"].append(keys[idx])
            out_parts["values"].append(v[idx])
            out_parts["freqs"].append(f[idx])
            out_parts["versions"].append(ve[idx])
            out_parts["create_steps"].append(c[idx])
            for name, leaf in slot_leaves:
                if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == S * cap1:
                    blocks = addressable_blocks(leaf, S, cap1)
                    slot_parts.setdefault(f"slot__{name}", []).append(
                        blocks[s][:n][idx])
                else:
                    scalars[f"scalar__{name}"] = np.asarray(leaf)
        out = {k: np.concatenate(v) for k, v in out_parts.items()}
        out.update({k: np.concatenate(v) for k, v in slot_parts.items()})
        out.update(scalars)
        return out

    def ckpt_restore(self, trainer, template, parts, num_shards):
        from ..checkpoint import format as F
        from ..checkpoint.saver import last_wins_sel, needed_capacity
        from .multihost import stack_rowsharded
        S = num_shards
        if S == 1:
            return super().ckpt_restore(trainer, template, parts, 1)
        self._ensure_shards(S, getattr(trainer, "mesh", None),
                            getattr(trainer, "axis", None))
        cfg = self.config
        parts = [p for p in parts if "keys" in p]
        all_keys = np.concatenate([p["keys"] for p in parts])
        sel = last_wins_sel(all_keys)
        keys = all_keys[sel]
        own = (K.hash32_np(keys, seed=OWNER_SEED)
               % np.uint32(S)).astype(np.int32)
        per = int(np.bincount(own, minlength=S).max()) if len(own) else 0
        cap = needed_capacity(per + 8, cfg.capacity, load=0.9)
        if cap != cfg.capacity:
            self.config = dataclasses.replace(cfg, capacity=cap)
            cfg = self.config
            trainer.rejit()
        width = cfg.embedding_dim + cfg.fused_slot_columns

        def merged(key):
            return np.concatenate([p[key] for p in parts])[sel]

        m_vals = merged("values")
        m_freq = merged("freqs")
        m_vers = merged("versions")
        m_cs = merged("create_steps")
        opt = trainer.sparse_optimizers[
            next(k for k, c in trainer.collections.items() if c is self)]
        flat_names = [n for n, _ in F.slot_leaf_names(
            opt.init(jnp.zeros((cap + 1, width), jnp.dtype(cfg.value_dtype))))]
        m_slots = {}
        for name in flat_names:
            rk = f"slot__{name}"
            if all(rk in p for p in parts):
                m_slots[name] = np.concatenate([p[rk] for p in parts])[sel]

        shard_states, shard_slots = [], []
        for s in range(S):
            idx = np.nonzero(own == s)[0]
            n = idx.shape[0]
            if self._lo <= s < self._lo + self._S_local:
                # every process computes every shard's host state (the
                # stacking rule materialises only addressable shards);
                # each loads keys only into the resolvers it OWNS
                self._shard_resolvers[s - self._lo].load_keys(keys[idx])

            def dense(src, fill, dtype, extra=()):
                out = np.full((cap + 1,) + extra, fill, dtype)
                if n:
                    out[:n] = src[idx]
                return out

            st = HostEVState(
                values=jnp.asarray(dense(m_vals, 0,
                                         np.dtype(cfg.value_dtype),
                                         (width,))),
                freqs=jnp.asarray(dense(m_freq, 0, np.int32)),
                versions=jnp.asarray(dense(m_vers, -1, np.int32)),
                create_steps=jnp.asarray(dense(m_cs, -1, np.int32)))
            slot = opt.init(st.values)
            treedef = jax.tree_util.tree_structure(slot)
            leaves = []
            for name, leaf in F.slot_leaf_names(slot):
                rk, sk2 = name, f"scalar__{name}"
                if name in m_slots:
                    buf = np.array(leaf)
                    if n:
                        buf[:n] = m_slots[name][idx]
                    leaves.append(jnp.asarray(buf))
                elif any(sk2 in p for p in parts):
                    val = [p[sk2] for p in parts if sk2 in p][-1]
                    leaves.append(jnp.asarray(val, leaf.dtype))
                else:
                    leaves.append(leaf)
            shard_slots.append(jax.tree_util.tree_unflatten(treedef, leaves))
            shard_states.append(st)
        ev_g = stack_rowsharded(trainer.mesh, trainer.axis, shard_states)
        slot_g = stack_rowsharded(trainer.mesh, trainer.axis, shard_slots)
        return template._replace(ev=ev_g, slot=slot_g)
