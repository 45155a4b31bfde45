"""Feature columns: declarative mapping from raw feature batches to dense
inputs and embedding lookups.

TPU-native rebuild of the reference's feature-column layer
(tensorflow/python/feature_column/feature_column_v2.py:2043
``categorical_column_with_embedding``, contrib variant
feature_column.py:732, and the **coalesced columns** optimization of
coalesced_utils.py:45 — many small embedding columns merged into one
coalesced table and a single lookup).

Structure:
  * :class:`NumericColumn` — float features, passed through (optionally
    log-normalised, the Criteo recipe).
  * :class:`EmbeddingColumn` — categorical feature -> pooled [B, dim]
    embedding from a dynamic EmbeddingVariable. ``hash_bucket_size`` set
    gives static-vocab semantics (ids are pre-modded — the stock-TF
    baseline); ``None`` keeps raw 64-bit ids (the EV semantics).
  * :class:`SequenceEmbeddingColumn` — multivalent feature -> unpooled
    [B, L, dim] + mask (DIN/DIEN behaviour sequences).
  * :class:`EmbeddingCollection` — groups embedding columns of equal dim
    that share an optimizer into ONE coalesced EmbeddingVariable; feature
    ids are salted with the column index before hashing so distinct columns
    never share rows. One unique+lookup+segment-sum per collection per step
    instead of one per column — the lookup count is what dominated the
    reference's PS round-trips, and on TPU it dominates kernel-launch and
    dedup cost.

Raw batches are dicts ``name -> np.int64 [B] / [B, L]`` for categorical
(``-1`` = padding) and ``name -> float [B, k]`` for numeric.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import EmbeddingVariableConfig, Initializer
from .ops.unique import unique, unique_cols
from .sparse import embedding_var as ev
from .sparse import keys as K


@dataclasses.dataclass(frozen=True)
class NumericColumn:
    name: str
    shape: int = 1
    log_normalize: bool = False  # log(1+max(x,0)) — the Criteo dense recipe


@dataclasses.dataclass(frozen=True)
class CategoricalColumn:
    """Id source. ``hash_bucket_size``: pre-mod ids into a fixed space
    (categorical_column_with_hash_bucket semantics); None = raw 64-bit ids
    (categorical_column_with_embedding semantics). ``shared_embedding``:
    columns with the same group name share table rows — the
    shared_embedding_columns semantics (needed e.g. for DIN/DIEN where the
    candidate item and the behaviour history embed in one item space)."""

    name: str
    hash_bucket_size: Optional[int] = None
    max_length: int = 1  # ids per example (multivalent width, -1 padded)
    shared_embedding: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class EmbeddingColumn:
    categorical: CategoricalColumn
    dimension: int
    combiner: str = "mean"

    @property
    def name(self) -> str:
        return self.categorical.name


@dataclasses.dataclass(frozen=True)
class SequenceEmbeddingColumn:
    """Unpooled: emits [B, L, dim] and a validity mask."""

    categorical: CategoricalColumn
    dimension: int

    @property
    def name(self) -> str:
        return self.categorical.name


def _salt(ids: K.Keys, column_index: int) -> K.Keys:
    """Mix the column index into the key so coalesced columns never share
    rows (the coalesced-table id-spacing trick, coalesced_utils.py:45).
    Preserves the EMPTY sentinel so padding stays padding."""
    if column_index == 0:
        return ids
    empty = K.is_empty(ids)
    c1 = np.int32((column_index * 0x9E3779B1) & 0x7FFFFFFF)
    c2 = np.int32((column_index * 0x85EBCA77) & 0x7FFFFFFF)
    salted = K.Keys(ids.hi ^ c1, ids.lo ^ c2)
    return K.where(empty, ids, salted)


class CollectionAux(NamedTuple):
    ev_aux: ev.LookupAux


class EmbeddingCollection:
    """One coalesced dynamic table serving many embedding columns.

    Usage per step (functional):
        state, aux = coll.lookup_or_create(state, batch, step)
        # inside the differentiated loss:
        feats = coll.embeddings(state.values, aux)   # dict name -> [B, dim]
        seqs  = coll.sequence_embeddings(state.values, aux)  # name -> ([B,L,dim], mask)
        # after grad wrt state.values' gathered rows:
        values, slot = coll.apply_gradients(...)
    """

    def __init__(
        self,
        columns: Sequence[EmbeddingColumn | SequenceEmbeddingColumn],
        name: str = "emb",
        capacity: int = 1 << 20,
        initializer: Initializer = Initializer(),
        **ev_kwargs,
    ):
        dims = {c.dimension for c in columns}
        if len(dims) != 1:
            raise ValueError("columns in one collection must share a dimension; "
                             "use several collections for mixed dims")
        self.columns = list(columns)
        self.dim = dims.pop()
        self.config = EmbeddingVariableConfig(
            name=name, embedding_dim=self.dim, capacity=capacity,
            initializer=initializer, **ev_kwargs)
        # static layout: flat id vector is the concat over columns of
        # [B, max_length] blocks.
        self._widths = [c.categorical.max_length for c in self.columns]
        self._offsets = np.cumsum([0] + self._widths).tolist()
        self.total_width = self._offsets[-1]
        # per-column salt group: shared_embedding columns get one salt so
        # the same raw id hits the same row across them
        groups: Dict[str, int] = {}
        self._salts = []
        for c in self.columns:
            g = c.categorical.shared_embedding or c.categorical.name
            self._salts.append(groups.setdefault(g, len(groups)))
        # column-parallel dedup (ops.unique.unique_cols) needs every key
        # confined to ONE row of the [W, B] layout: width-1 columns with
        # pairwise-distinct salt groups (no shared embeddings / sequences)
        self._column_dedup_ok = (
            all(w == 1 for w in self._widths)
            and len(set(self._salts)) == len(self._salts))

    # -- state ---------------------------------------------------------
    def init(self) -> ev.EVState:
        return ev.create(self.config)

    # -- host-side fast path --------------------------------------------
    def pack_ids(self, batch: Dict[str, np.ndarray]) -> K.Keys:
        """Pure-numpy packing of a raw batch into the flat [total_width*B]
        key vector (salting + hash-bucket mod included), transferred to
        device as TWO int32 arrays. This is the host hot path — one packed
        transfer instead of one per column (the eager per-column path costs
        ~50x more in dispatch/transfer overhead)."""
        flat = self.pack_ids_np(batch)
        hi, lo = K.split_np(flat)
        # kept 2-D [total_width, B] so a data-parallel step can shard the
        # batch axis; consumers flatten feature-major (matching the
        # _flatten_ids layout).
        return K.Keys(jnp.asarray(hi), jnp.asarray(lo))

    def transform_raw_keys(self, column_name: str,
                           raw: np.ndarray) -> np.ndarray:
        """Map one column's RAW feature ids into this collection's table key
        space (hash-bucket mod + per-column-group salt) — exactly what
        :meth:`pack_ids_np` does to a batch. Used by checkpoint migration:
        a reference checkpoint stores one EV per feature column keyed by
        raw ids (kv_variable_ops.cc DumpEmbeddingValues), while this
        coalesced table keys each column's ids through its salt group."""
        for ci, col in enumerate(self.columns):
            if col.categorical.name != column_name:
                continue
            cc = col.categorical
            ids = np.asarray(raw, np.int64)
            empty = ids == -1
            if cc.hash_bucket_size:
                ids = np.where(empty, ids, ids % cc.hash_bucket_size)
            si = self._salts[ci]
            if si:
                c1 = np.int64((si * 0x9E3779B1) & 0x7FFFFFFF) << 32
                c2 = np.int64((si * 0x85EBCA77) & 0x7FFFFFFF)
                ids = np.where(empty, ids, ids ^ c1 ^ c2)
            return ids
        raise KeyError(f"no column {column_name!r} in collection "
                       f"{self.config.name!r}")

    def pack_ids_np(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """The numpy stage of :meth:`pack_ids`: int64 [total_width, B] with
        salting/bucketing applied (host consumers — e.g. the host-DRAM tier
        probe — reuse this without a device round-trip)."""
        blocks = []
        for ci, col in enumerate(self.columns):
            cc = col.categorical
            raw = np.asarray(batch[cc.name], dtype=np.int64)
            if raw.ndim == 1:
                raw = raw[:, None]
            B, w = raw.shape
            empty = raw == -1
            ids = raw
            if cc.hash_bucket_size:
                ids = np.where(empty, ids, ids % cc.hash_bucket_size)
            si = self._salts[ci]
            if si:
                c1 = np.int64((si * 0x9E3779B1) & 0x7FFFFFFF) << 32
                c2 = np.int64((si * 0x85EBCA77) & 0x7FFFFFFF)
                ids = np.where(empty, ids, ids ^ c1 ^ c2)
            blocks.append(ids.T)  # [w, B]
        return np.concatenate(blocks, axis=0)  # [total_width, B]

    # -- forward -------------------------------------------------------
    def _flatten_ids(self, batch: Dict[str, jax.Array]) -> Tuple[K.Keys, int]:
        parts = []
        B = None
        for ci, col in enumerate(self.columns):
            cc = col.categorical
            raw = batch[cc.name]
            ids = raw if isinstance(raw, K.Keys) else K.from_numpy(raw)
            if len(ids.shape) == 1:
                ids = ids.reshape(ids.shape[0], 1)
            B = ids.shape[0]
            if cc.hash_bucket_size:
                bucket = K.mod(ids, cc.hash_bucket_size)
                ids = K.where(K.is_empty(ids), ids, K.Keys(jnp.zeros_like(bucket), bucket))
            ids = _salt(ids, self._salts[ci])
            # transpose to [w, B] so the global flat layout is
            # [total_width, B] (see layout note at the bottom of the file)
            parts.append(K.Keys(ids.hi.T.reshape(-1), ids.lo.T.reshape(-1)))
        flat = K.concat(parts)
        return flat, B

    def lookup_or_create(
        self, state: ev.EVState, batch, step: jax.Array
    ) -> Tuple[ev.EVState, CollectionAux]:
        """``batch``: either a raw per-column dict or a pre-packed flat
        :class:`K.Keys` from :meth:`pack_ids` (the fast host path)."""
        if isinstance(batch, K.Keys) and len(batch.shape) == 2 \
                and self._column_dedup_ok:
            # batched per-column sort: the cheapest dedup on TPU (the sort
            # is the step's most expensive op; see ops.unique.unique_cols)
            uniq = unique_cols(batch, self.config.max_unique)
            state, aux = ev.lookup_or_create_unique(state, self.config,
                                                    uniq, step)
            return state, CollectionAux(ev_aux=aux)
        if isinstance(batch, K.Keys):
            flat = batch.reshape(-1) if len(batch.shape) > 1 else batch
        else:
            flat, _ = self._flatten_ids(batch)
        state, aux = ev.lookup_or_create(state, self.config, flat, step)
        return state, CollectionAux(ev_aux=aux)

    def gather_unique(self, values: jax.Array, aux: CollectionAux) -> jax.Array:
        """[n_unique, dim] rows — the differentiable leaf."""
        return ev.gather(values, aux.ev_aux, self.config)

    def rows_for_training(self, state, aux: CollectionAux) -> jax.Array:
        """Trainer hook: unique rows from full table state (variant
        collections override — e.g. frequency-masked widths)."""
        return self.gather_unique(state.values, aux)

    def _per_column_rows(self, urows: jax.Array, aux: CollectionAux):
        """[N, dim] rows in flat layout order."""
        return urows[aux.ev_aux.uniq.inverse]

    def embeddings(self, urows: jax.Array, aux: CollectionAux,
                   batch: Dict[str, jax.Array] | None = None) -> Dict[str, jax.Array]:
        """Pooled per-column embeddings: name -> [B, dim]. Padding ids
        contribute nothing (null row + excluded from mean denominators)."""
        rows = self._per_column_rows(urows, aux)
        # validity from the key planes: padding == EMPTY -> null slot
        valid = (aux.ev_aux.slots != self.config.capacity)[aux.ev_aux.uniq.inverse]
        return self.embeddings_from_rows(rows, valid)

    def embeddings_from_rows(self, rows: jax.Array, valid: jax.Array) -> Dict[str, jax.Array]:
        """Pool flat-layout rows [total_width*B, dim] (+validity) into
        per-column [B, dim]. Shared by the local and sharded lookup paths."""
        B = rows.shape[0] // self.total_width
        out = {}
        for ci, col in enumerate(self.columns):
            if isinstance(col, SequenceEmbeddingColumn):
                continue
            w = self._widths[ci]
            o = self._offsets[ci]
            blk = jax.lax.dynamic_slice_in_dim(
                rows.reshape(self.total_width, B, self.dim), o, w, 0)
            vblk = jax.lax.dynamic_slice_in_dim(
                valid.reshape(self.total_width, B), o, w, 0)
            blk = jnp.swapaxes(blk, 0, 1)          # [B, w, dim]
            vblk = jnp.swapaxes(vblk, 0, 1)        # [B, w]
            if col.combiner == "sum" or w == 1:
                pooled = jnp.sum(blk * vblk[..., None], axis=1)
            elif col.combiner == "mean":
                denom = jnp.maximum(jnp.sum(vblk, axis=1, keepdims=True), 1)
                pooled = jnp.sum(blk * vblk[..., None], axis=1) / denom
            elif col.combiner == "sqrtn":
                denom = jnp.sqrt(jnp.maximum(jnp.sum(vblk, axis=1, keepdims=True), 1).astype(blk.dtype))
                pooled = jnp.sum(blk * vblk[..., None], axis=1) / denom
            else:
                raise ValueError(col.combiner)
            out[col.name] = pooled
        return out

    def sequence_embeddings(self, urows: jax.Array, aux: CollectionAux):
        """name -> ([B, L, dim], mask [B, L]) for SequenceEmbeddingColumns."""
        rows = self._per_column_rows(urows, aux)
        valid = (aux.ev_aux.slots != self.config.capacity)[aux.ev_aux.uniq.inverse]
        return self.sequence_embeddings_from_rows(rows, valid)

    def sequence_embeddings_from_rows(self, rows: jax.Array, valid: jax.Array):
        B = rows.shape[0] // self.total_width
        out = {}
        for ci, col in enumerate(self.columns):
            if not isinstance(col, SequenceEmbeddingColumn):
                continue
            w = self._widths[ci]
            o = self._offsets[ci]
            blk = jax.lax.dynamic_slice_in_dim(
                rows.reshape(self.total_width, B, self.dim), o, w, 0)
            vblk = jax.lax.dynamic_slice_in_dim(
                valid.reshape(self.total_width, B), o, w, 0)
            out[col.name] = (jnp.swapaxes(blk, 0, 1), jnp.swapaxes(vblk, 0, 1))
        return out

    # -- backward ------------------------------------------------------
    def apply_gradients(self, state: ev.EVState, opt, slot_state,
                        aux: CollectionAux, urow_grads: jax.Array,
                        step: jax.Array, urows: jax.Array | None = None):
        """Sparse-apply the cotangent of :meth:`gather_unique`'s output.

        ``urows`` are the effective current rows (the forward pass already
        gathered them); required under lazy init so created rows update
        from their logical init, not the store's zeros."""
        a = aux.ev_aux
        if urows is None:
            urows = ev.gather(state.values, a, self.config)
        values, slot_state = opt.apply(state.values, slot_state, a.slots,
                                       urow_grads, a.admitted, step,
                                       cur_rows=urows, created=a.created)
        return state._replace(values=values), slot_state

    # -- trainer hooks (table-type polymorphism: variant collections
    #    override these; the Trainer never assumes EVState directly) -----
    def init_slot(self, opt, state) -> object:
        return opt.init(state.values)

    def embeddings_readonly(self, urows, aux):
        """(pooled dict, sequence dict) for the EVAL/SERVING path: every
        non-padding key participates — unknown keys were already given
        their deterministic default row by :meth:`readonly_rows`
        (KvResourceGather returns default_value for missing keys; the
        reference pools them like any other id). The sharded eval exchange
        has these semantics too, so local and mesh eval agree."""
        a = aux.ev_aux
        if not hasattr(a, "uniq"):  # variant collections (flat-aux types)
            return (self.embeddings(urows, aux),
                    self.sequence_embeddings(urows, aux))
        rows = urows[a.uniq.inverse]
        valid = (~K.is_empty(a.uniq.ukeys))[a.uniq.inverse]
        return (self.embeddings_from_rows(rows, valid),
                self.sequence_embeddings_from_rows(rows, valid))

    def readonly_rows(self, state, cats):
        """(aux, unique rows) without mutation — the eval/serving path."""
        from .sparse import hashtable as ht  # local: avoid cycle at import
        if isinstance(cats, K.Keys):
            flat = cats.reshape(-1) if len(cats.shape) > 1 else cats
        else:
            flat, _ = self._flatten_ids(cats)
        uniq = unique(flat, self.config.max_unique)
        slots, found = ht.lookup(state.index, uniq.ukeys, self.config.max_probes)
        aux = CollectionAux(ev_aux=ev.LookupAux(
            uniq=uniq, slots=slots, admitted=found,
            created=jnp.zeros_like(found)))
        rows = state.values[slots][:, : self.config.embedding_dim]
        defaults = ev.init_rows(self.config, uniq.ukeys).astype(rows.dtype)
        valid = ~K.is_empty(uniq.ukeys)
        rows = jnp.where((found | ~valid)[:, None], rows, defaults)
        return aux, rows

    def load_factor(self, state) -> float:
        return float(ev.load_factor(state)) if hasattr(state, "index") else 0.0

    def needs_growth(self, state) -> bool:
        return (self.load_factor(state) >= 0.7
                or int(jnp.sum(state.index.overflow)) > 0)

    def grow_state(self, state, slot_state, opt=None):
        """Double the capacity; returns (state, slot_state). Mutates
        ``self.config`` (static shapes re-jit upstream). Pass ``opt`` (the
        table's SparseOptimizer) so vacated slot rows are re-filled with the
        optimizer's init values, not zeros."""
        import dataclasses
        from .optim.sparse import permute_slot_state
        new_cap = self.config.capacity * 2
        new_state, perm = ev.grow(state, self.config, new_cap)
        slot_state = permute_slot_state(slot_state, perm, new_cap,
                                        fills=opt.fills if opt else None)
        self.config = dataclasses.replace(self.config, capacity=new_cap)
        return new_state, slot_state

    # ------------------------------------------------------------------
    # Sharded-trainer hooks (mesh polymorphism). The ShardedTrainer never
    # assumes EVState either: each collection type declares how its state
    # shards over the mesh axis and how a per-device step looks up /
    # differentiates / applies gradients. The base implementation is the
    # row-sharded owner-hash exchange (parallel/sharded.py) — the mesh
    # analog of the reference's `partitioner=` EV sharding across PS tasks
    # (variable_scope.py:2141, modelzoo/WDL/train.py:470-478). Variant
    # collections (multi-hash / adaptive / dynamic-dim / hash-table)
    # override the subset that differs.

    def sharded_slot_example(self, opt):
        """Abstract (shape-only) slot pytree for spec construction."""
        return jax.eval_shape(lambda: self.init_slot(opt, self.init()))

    def sharded_cats_spec(self, axis):
        """PartitionSpec pytree (or prefix) of this collection's packed
        cats input to the sharded step. Base: feature-major [W, B] key
        planes, batch axis sharded."""
        from jax.sharding import PartitionSpec as P
        return K.Keys(P(None, axis), P(None, axis))

    def sharded_pack(self, batch, S, bucket_cap, mesh, axis, train=True):
        """Host-side packing of one raw (process-local) batch into the
        sharded step's cats input. Base: pack + globalize the key planes
        (host-sharded collections resolve the whole exchange here)."""
        from .parallel.multihost import globalize
        from jax.sharding import PartitionSpec as P
        hi, lo = K.split_np(self.pack_ids_np(batch))
        return K.Keys(globalize(mesh, P(None, axis), hi),
                      globalize(mesh, P(None, axis), lo))

    def _ev_index_spec(self, axis):
        from .sparse import hashtable as ht_mod
        from jax.sharding import PartitionSpec as P
        return ht_mod.HashTable(key_hi=P(axis), key_lo=P(axis),
                                size=P(axis), overflow=P(axis))

    def _ev_state_spec(self, axis):
        from jax.sharding import PartitionSpec as P
        return ev.EVState(
            index=self._ev_index_spec(axis),
            values=P(axis), freqs=P(axis), versions=P(axis),
            create_steps=P(axis),
            cbf=P(axis) if self.config.cbf_filter else None,
        )

    def _ev_slot_spec(self, axis, slot_example):
        from jax.sharding import PartitionSpec as P
        cap1 = self.config.capacity + 1

        def leaf_spec(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap1:
                return P(axis)
            return P()
        return jax.tree_util.tree_map(leaf_spec, slot_example)

    def sharded_table_spec(self, axis, slot_example):
        """TableBundle of PartitionSpecs for this collection's state."""
        from .train.trainer import TableBundle
        from jax.sharding import PartitionSpec as P
        return TableBundle(ev=self._ev_state_spec(axis),
                           slot=self._ev_slot_spec(axis, slot_example),
                           health=P(axis, None))

    def sharded_init_local(self, opt):
        """Per-device fresh state (called inside shard_map; every leaf must
        be deterministic so replicated (P()) outputs agree across devices).
        Returns a TableBundle whose leaves are the LOCAL shard."""
        from .train.trainer import TableBundle
        st = ev.create(self.config)
        return TableBundle(ev=st, slot=self.init_slot(opt, st),
                           health=jnp.zeros((1, 3), jnp.int32))

    def sharded_lookup_or_create(self, state, ids2d, step, axis, bucket_cap):
        """Per-device lookup-or-create over the mesh (inside shard_map):
        ``ids2d`` is the LOCAL [W, B_local] id batch; ``state`` the local
        table shard. Returns (state, aux)."""
        from .parallel import sharded
        return sharded.exchange_lookup_or_create(self, state, ids2d, step,
                                                 axis, bucket_cap)

    def table_index(self, state):
        """The hash index the owner-side readonly lookup probes."""
        return state.index

    def sharded_owner_lookup(self, state, uniq, step, freq_counts):
        """Owner-side lookup-or-create over received (deduped) keys."""
        return ev.lookup_or_create_unique(state, self.config, uniq, step,
                                          freq_counts=freq_counts)

    def owner_readonly_rows(self, state, slots, found, keys):
        """Owner-side eval rows for received keys: unknown keys read their
        deterministic would-be init (KvResourceGather default_value)."""
        rows = state.values[slots][:, : self.config.embedding_dim]
        defaults = ev.init_rows(self.config, keys).astype(rows.dtype)
        rvalid = ~K.is_empty(keys)
        return jnp.where((found | ~rvalid)[:, None], rows, defaults)

    def sharded_rows(self, state, aux):
        """Differentiable leaf of the sharded lookup: owner-side rows per
        received bucket position [S*C, dim]."""
        from .parallel import sharded
        return sharded.gather_owner_rows(state.values, aux, self.config)

    def sharded_rows_back(self, urows, aux, axis, bucket_cap):
        """(rows_flat [N_local, dim], valid_flat [N_local]) in the local
        flat-id layout; linear in ``urows`` so autodiff emits the reverse
        exchange (bf16 on the wire when config.exchange_dtype says so)."""
        from .parallel import sharded
        return sharded.rows_back(urows, aux, axis, bucket_cap,
                                 wire_dtype=self.config.exchange_dtype)

    def sharded_apply_gradients(self, state, opt, slot_state, aux,
                                d_urows, step, axis, num_shards):
        """Owner-side sparse apply of the cotangent of sharded_rows."""
        from .parallel import sharded
        return sharded.apply_gradients_sharded(self, state, opt, slot_state,
                                               aux, d_urows, step)

    def sharded_readonly(self, state, ids2d, axis, bucket_cap):
        """Eval-path exchange: (rows_flat, valid_flat), no mutation."""
        from .parallel import sharded
        return sharded.exchange_lookup_readonly(
            self, state, ids2d, axis, bucket_cap,
            wire_dtype=self.config.exchange_dtype)

    def sharded_health(self, health, aux):
        """Per-device health accumulation from one exchange's aux."""
        if health is None:
            return None
        from .parallel import sharded as _sh
        if not isinstance(aux, _sh.ShardedAux):
            return health
        ov_l = aux.local_uniq.n_overflow
        ov_r = aux.recv_uniq.n_overflow
        nu = jnp.maximum(aux.local_uniq.n_unique.astype(jnp.int32) + ov_l,
                         aux.recv_uniq.n_unique.astype(jnp.int32) + ov_r)
        sat = ((ov_l > 0) | (ov_r > 0)).astype(jnp.int32)
        return jnp.stack([health[:, 0] + aux.n_dropped,
                          health[:, 1] + sat,
                          jnp.maximum(health[:, 2], nu)], axis=-1)

    def index_view(self, state):
        """The EVState-shaped view growth/health watch, or None when the
        collection has no dynamic index (multi-hash)."""
        return state if isinstance(state, ev.EVState) else None

    def sharded_grow_local(self, bundle, new_cap, fills):
        """Per-shard growth body (inside shard_map): rebuild the index at
        ``new_cap`` and permute optimizer slot rows along."""
        from .optim.sparse import permute_slot_state
        new_ev, perm = ev.grow(bundle.ev, self.config, new_cap)
        slot = permute_slot_state(bundle.slot, perm, new_cap, fills=fills)
        return bundle._replace(ev=new_ev, slot=slot)

    # ------------------------------------------------------------------
    # Checkpoint hooks (full + incremental, reshard-safe).

    def ckpt_arrays(self, bundle, num_shards, since, evict, global_step):
        """Compact this collection's state into flat numpy arrays (the
        per-save unit). Base EV = the 4-array {keys, values, versions,
        freqs} format + slot rows (saveable_object_util.py:169-172)."""
        from .checkpoint.saver import table_snapshot_host
        return table_snapshot_host(self.config, bundle.ev, bundle.slot,
                                   num_shards=num_shards, since_step=since,
                                   evict=evict, global_step=global_step)

    def ckpt_restore(self, trainer, template, parts, num_shards):
        """Rebuild a TableBundle from saved parts (base + incremental
        replays, oldest first). Return None to use the saver's generic
        EV flow (owner-hash routed, reshard-safe)."""
        return None


def dense_features(columns: Sequence[NumericColumn], batch: Dict[str, jax.Array]) -> jax.Array:
    """Concatenate numeric columns -> [B, sum(shape)] float32."""
    parts = []
    for col in columns:
        x = jnp.asarray(batch[col.name], jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        if col.log_normalize:
            x = jnp.log1p(jnp.maximum(x, 0.0))
        parts.append(x)
    return jnp.concatenate(parts, axis=-1)


def pack_dense(columns: Sequence[NumericColumn], batch: Dict[str, np.ndarray]) -> np.ndarray:
    """Host fast path: raw numeric columns -> one float32 [B, D] numpy array
    (normalisation deferred to :func:`normalize_dense` inside the jit)."""
    parts = []
    for col in columns:
        x = np.asarray(batch[col.name], np.float32)
        if x.ndim == 1:
            x = x[:, None]
        parts.append(x)
    return np.concatenate(parts, axis=-1)


def normalize_dense(columns: Sequence[NumericColumn], raw: jax.Array) -> jax.Array:
    """Apply per-column normalisation in-graph. Column layout must match
    :func:`pack_dense`."""
    mask = np.concatenate([
        np.full(col.shape, col.log_normalize, bool) for col in columns])
    if not mask.any():
        return raw
    logged = jnp.log1p(jnp.maximum(raw, 0.0))
    return jnp.where(jnp.asarray(mask)[None, :], logged, raw)


# Layout note: _flatten_ids transposes each column's [B, w] id block to
# [w, B] before flattening, so the global flat vector has layout
# [total_width, B] (feature-major). ``rows.reshape(total_width, B, dim)``
# and the dynamic_slice per column in embeddings()/sequence_embeddings()
# rely on exactly this order.
