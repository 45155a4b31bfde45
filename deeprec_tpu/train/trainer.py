"""Training core: jitted end-to-end step over dynamic tables + dense model.

Replaces the reference's session train loop (modelzoo/WDL/train.py:508-560
``sess.run([train_op])``) and its graph-level features:

  * **AutoMicroBatch** (PipelineGraph, graph_execution_state.cc:627): here a
    ``lax.scan`` over microbatch slices accumulating dense gradients —
    sparse updates apply per microbatch (per-key touch order matches the
    reference's accumulated IndexedSlices up to adaptive-optimizer
    curvature).
  * **SmartStage / tf.staged**: subsumed by the host-side prefetch iterator
    (data/prefetch.py) + XLA async dispatch — steps are enqueued while the
    host prepares the next batch.

The step is one jitted function: sparse lookup-or-create (non-diff) ->
differentiable loss over gathered unique rows + dense params -> optax
update + per-table sparse apply. Donation keeps table state in-place in
HBM.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..feature_column import (EmbeddingCollection, NumericColumn,
                              normalize_dense, pack_dense)
from ..optim.sparse import SparseOptimizer
from ..sparse import embedding_var as ev
from . import metrics as metrics_lib


class TableBundle(NamedTuple):
    ev: ev.EVState
    slot: Any
    # operational health counters (int32; None for variant tables):
    # [0] cumulative exchange-bucket drops (sharded runs; 0 locally)
    # [1] cumulative steps whose dedup saturated max_unique (those uniques
    #     read the null row for the step — silent quality loss if ignored)
    # [2] high-water n_unique
    # Local shape (3,); sharded shape (S, 3) (row-sharded like the tables).
    health: Any = None


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    tables: Dict[str, TableBundle]
    metrics: metrics_lib.MetricState
    step: jax.Array


def bce_loss(logits, labels):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels.astype(jnp.float32)))


def _merge_batch_stats(params, bs_updates):
    """Fold the train pass's mutable-collection snapshot (Dice/BatchNorm
    running averages) back into the variables dict. No-op for models
    without a batch_stats collection."""
    if not bs_updates or "batch_stats" not in bs_updates:
        return params
    merged = dict(params)
    merged["batch_stats"] = bs_updates["batch_stats"]
    return type(params)(merged) if not isinstance(params, dict) else merged


def _np_global(arr) -> np.ndarray:
    """Full host value of a possibly process-spanning array (tiny arrays
    only: sizes/overflow/health counters)."""
    from ..parallel.multihost import np_global
    return np_global(arr)


def _bump_health(health, coll, aux):
    """Accumulate TableBundle.health from one local lookup's aux.
    Saturation is detected from the dedup's own overflow count (distinct
    valid keys routed to the null group) — NOT from n_unique reaching the
    cap, which never happens when EMPTY padding groups occupy capped
    slots (sequence models / ragged batches)."""
    if health is None:
        return None
    ev_aux = getattr(aux, "ev_aux", aux)
    uniq = getattr(ev_aux, "uniq", None)
    if uniq is None:
        return health
    nu = uniq.n_unique.astype(jnp.int32) + uniq.n_overflow  # true demand
    sat = (uniq.n_overflow > 0).astype(jnp.int32)
    return jnp.stack([health[..., 0],
                      health[..., 1] + sat,
                      jnp.maximum(health[..., 2], nu)], axis=-1)


class Trainer:
    """Bundles model, feature columns, and optimizers into jitted
    train/eval steps.

    ``forward(model, params, dense, outputs, train)`` consumes
    ``outputs[collection_name] = (emb_dict, seq_dict)`` and returns logits
    or ``(logits, aux_loss)``.
    """

    def __init__(
        self,
        model,
        numeric_columns: Sequence[NumericColumn],
        collections: Dict[str, EmbeddingCollection],
        sparse_optimizers: Dict[str, SparseOptimizer],
        dense_optimizer: optax.GradientTransformation,
        forward: Optional[Callable] = None,
        aux_loss_weight: float = 1.0,
        microbatches: int = 1,
    ):
        self.model = model
        self.numeric_columns = list(numeric_columns)
        self.collections = collections
        self.sparse_optimizers = sparse_optimizers
        self.dense_optimizer = dense_optimizer
        self.forward = forward or default_forward
        self.aux_loss_weight = aux_loss_weight
        self.microbatches = microbatches
        self._jit_train = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_eval = jax.jit(self._eval_step, donate_argnums=(1,))

    # -- init ------------------------------------------------------------
    def init(self, rng, sample_batch) -> TrainState:
        dense, cats, labels = self.prepare_batch(sample_batch)
        tables = {}
        outputs = {}
        for name, coll in self.collections.items():
            st = coll.init()
            st, aux = coll.lookup_or_create(st, cats[name], jnp.zeros((), jnp.int32))
            urows = coll.rows_for_training(st, aux)
            outputs[name] = (coll.embeddings(urows, aux),
                            coll.sequence_embeddings(urows, aux))
            slot = coll.init_slot(self.sparse_optimizers[name], st)
            health = (jnp.zeros((3,), jnp.int32)
                      if isinstance(st, ev.EVState) else None)
            tables[name] = TableBundle(ev=coll.init(), slot=slot,
                                       health=health)
        params = self.forward(functools.partial(self.model.init, rng),
                              dense, outputs, True)
        opt_state = self.dense_optimizer.init(params)
        return TrainState(params=params, opt_state=opt_state, tables=tables,
                          metrics=metrics_lib.create(), step=jnp.zeros((), jnp.int32))

    # -- batch plumbing ----------------------------------------------------
    def prepare_batch(self, batch: Dict[str, np.ndarray], train: bool = True):
        """Host-side fast path: pure numpy packing, one transfer for dense,
        two int32 transfers per collection, one for labels. Everything else
        (normalisation, salting arithmetic) runs inside the jitted step —
        eager per-column ops cost ~50x more in dispatch overhead.

        ``train=False`` routes collections with a read-only host stage
        (``pack_ids_eval`` — host-index tables, whose train-path packing
        mutates the host index) through it; plain collections ignore it."""
        dense = (jnp.asarray(pack_dense(self.numeric_columns, batch))
                 if self.numeric_columns else None)
        cats = {}
        for name, coll in self.collections.items():
            ro = None if train else getattr(coll, "pack_ids_eval", None)
            cats[name] = coll.pack_ids(batch) if ro is None else ro(batch)
        labels = jnp.asarray(batch["label"], jnp.float32) if "label" in batch else None
        return dense, cats, labels

    # -- the inner (micro)step --------------------------------------------
    def _sparse_forward(self, tables, cats, step):
        new_tables = {}
        auxs = {}
        for name, coll in self.collections.items():
            bundle = tables[name]
            promo = getattr(coll, "apply_promo", None)
            if promo is not None:
                # host-index tiered tables: scatter tier-promoted rows
                # (resolved host-side one step ahead) before the lookup's
                # metadata writes — zero extra dispatches (host_index.py)
                ev_state, slot = promo(bundle.ev, bundle.slot, cats[name])
                bundle = bundle._replace(ev=ev_state, slot=slot)
            ev_state, aux = coll.lookup_or_create(bundle.ev, cats[name], step)
            health = _bump_health(bundle.health, coll, aux)
            new_tables[name] = bundle._replace(ev=ev_state, health=health)
            auxs[name] = aux
        return new_tables, auxs

    def _loss_and_grads(self, params, tables, auxs, dense, labels, train=True):
        urows = {name: coll.rows_for_training(tables[name].ev, auxs[name])
                 for name, coll in self.collections.items()}

        def loss_fn(params, urows):
            outputs = {}
            for name, coll in self.collections.items():
                outputs[name] = (coll.embeddings(urows[name], auxs[name]),
                                 coll.sequence_embeddings(urows[name], auxs[name]))
            # train applies with batch_stats mutable (Dice running averages
            # etc.); the updates escape the grad via the aux output and are
            # merged into params by the caller
            box = {}

            def apply_fn(*a, **kw):
                out, upd = self.model.apply(params, *a,
                                            mutable=["batch_stats"], **kw)
                box["updates"] = upd
                return out

            out = self.forward(apply_fn, dense, outputs, train)
            if isinstance(out, tuple):
                logits, aux_loss = out
            else:
                logits, aux_loss = out, 0.0
            loss = bce_loss(logits, labels) + self.aux_loss_weight * aux_loss
            return loss, (logits, box.get("updates", {}))

        (loss, (logits, bs_updates)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, urows)
        return loss, logits, grads, urows, bs_updates

    def _apply_sparse(self, tables, auxs, urow_grads, step, urows=None):
        out = {}
        for name, coll in self.collections.items():
            bundle = tables[name]
            ev_state, slot = coll.apply_gradients(
                bundle.ev, self.sparse_optimizers[name], bundle.slot,
                auxs[name], urow_grads[name], step,
                urows=urows[name] if urows else None)
            out[name] = bundle._replace(ev=ev_state, slot=slot)
        return out

    # -- full steps ---------------------------------------------------------
    def _train_step(self, state: TrainState, dense, cats, labels):
        step = state.step
        if dense is not None:
            dense = normalize_dense(self.numeric_columns, dense)

        if self.microbatches == 1:
            tables, auxs = self._sparse_forward(state.tables, cats, step)
            loss, logits, (gp, gu), urows, bs_updates = self._loss_and_grads(
                state.params, tables, auxs, dense, labels)
            tables = self._apply_sparse(tables, auxs, gu, step, urows)
        else:
            k = self.microbatches
            mb_dense = _mb_split(dense, k)
            mb_labels = _mb_split(labels, k)
            # cat ids are [W, B]: split the batch axis, keep feature-major
            # layout per microbatch -> [k, W, B/k]
            mb_cats = jax.tree_util.tree_map(
                lambda x: x.reshape(x.shape[0], k, x.shape[1] // k).transpose(1, 0, 2),
                cats)

            def body(carry, mb):
                tables, gp_acc, loss_acc = carry
                d, c, l = mb
                tables, auxs = self._sparse_forward(tables, c, step)
                loss, logits, (gp, gu), urows, bs_up = self._loss_and_grads(
                    state.params, tables, auxs, d, l)
                tables = self._apply_sparse(tables, auxs, gu, step, urows)
                gp_acc = jax.tree_util.tree_map(jnp.add, gp_acc, gp)
                return (tables, gp_acc, loss_acc + loss), (logits, bs_up)

            gp0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (tables, gp, loss_sum), (logits_mb, bs_mb) = jax.lax.scan(
                body, (state.tables, gp0, jnp.zeros(())),
                (mb_dense, mb_cats, mb_labels))
            gp = jax.tree_util.tree_map(lambda g: g / k, gp)
            loss = loss_sum / k
            logits = logits_mb.reshape(-1)
            # running stats: the LAST microbatch's snapshot wins
            bs_updates = jax.tree_util.tree_map(lambda x: x[-1], bs_mb)
            labels = labels  # original layout matches reshape of mb split

        updates, opt_state = self.dense_optimizer.update(gp, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _merge_batch_stats(params, bs_updates)
        m = metrics_lib.update(state.metrics, logits, labels.reshape(logits.shape), loss)
        return TrainState(params=params, opt_state=opt_state, tables=tables,
                          metrics=m, step=step + 1)

    def _eval_step(self, state: TrainState, mstate, dense, cats, labels):
        """Read-only: missing keys fall back to their deterministic init."""
        if dense is not None:
            dense = normalize_dense(self.numeric_columns, dense)
        auxs = {}
        urows = {}
        for name, coll in self.collections.items():
            aux, rows = _readonly_lookup(coll, state.tables[name].ev, cats[name])
            auxs[name] = aux
            urows[name] = rows
        outputs = {}
        for name, coll in self.collections.items():
            outputs[name] = coll.embeddings_readonly(urows[name], auxs[name])
        out = self.forward(functools.partial(self.model.apply, state.params),
                           dense, outputs, False)
        logits = out[0] if isinstance(out, tuple) else out
        loss = bce_loss(logits, labels)
        return metrics_lib.update(mstate, logits, labels, loss)

    # -- public API --------------------------------------------------------
    def train_step(self, state: TrainState, batch) -> TrainState:
        dense, cats, labels = self.prepare_batch(batch)
        return self._jit_train(state, dense, cats, labels)

    def eval_step(self, state: TrainState, mstate, batch):
        dense, cats, labels = self.prepare_batch(batch, train=False)
        return self._jit_eval(state, mstate, dense, cats, labels)

    def maybe_grow(self, state: TrainState, threshold: float = 0.7) -> TrainState:
        """Host-side growth check between steps (the DenseHashMap resize
        analog): any table past ``threshold`` load factor is rebuilt at 2×
        capacity, optimizer slot rows permuted along."""
        tables = dict(state.tables)
        changed = False
        for name, coll in self.collections.items():
            b = tables[name]
            if coll.needs_growth(b.ev):
                new_ev, slot = coll.grow_state(
                    b.ev, b.slot, opt=self.sparse_optimizers.get(name))
                tables[name] = b._replace(ev=new_ev, slot=slot)
                changed = True
        if not changed:
            return state
        self.rejit()
        return state._replace(tables=tables)

    def rejit(self):
        """Rebuild the jitted steps after a static-shape change (table
        capacity growth at runtime or at checkpoint restore)."""
        self._jit_train = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_eval = jax.jit(self._eval_step, donate_argnums=(1,))

    # -- host-index tiered tables (collection-owned tiers) -----------------
    # TieredTrainer (device-index engine) overrides all of these with its
    # trainer-owned tier stores; here they delegate to collections that
    # manage their own host tier (host_index.HostIndexEmbeddingCollection
    # with a non-HBM StorageOption), so the CLI/soak/saver drive both
    # engines through one surface.
    @property
    def tiers(self):
        if getattr(self, "_tiers_override", None) is not None:
            return self._tiers_override
        return {n: getattr(c, "tier_store", None)
                for n, c in self.collections.items()
                if getattr(c, "_tiered", False)}

    @tiers.setter
    def tiers(self, value):
        self._tiers_override = value

    def maybe_demote(self, state: TrainState) -> TrainState:
        """Demotion sweep for collection-owned tiers. Call at FENCE points
        only (with any HostStepPipeline drained — demotion renumbers
        slots)."""
        tables = dict(state.tables)
        changed = False
        gs = int(state.step)
        for name, coll in self.collections.items():
            fn = getattr(coll, "demote_cold", None)
            if fn is None or not getattr(coll, "_tiered", False):
                continue
            b = tables[name]
            new_ev, slot, nd = fn(b.ev, b.slot, gs,
                                  opt=self.sparse_optimizers.get(name))
            if nd:
                tables[name] = b._replace(ev=new_ev, slot=slot)
                changed = True
        return state._replace(tables=tables) if changed else state

    def export_tiers(self, state, since=None):
        out = {}
        for name, coll in self.collections.items():
            fn = getattr(coll, "export_tier", None)
            if fn is not None:
                r = fn(since=since)
                if r is not None:
                    out[name] = r
        return out

    def import_tier(self, name: str, keys, rows):
        fn = getattr(self.collections.get(name), "import_tier", None)
        if fn is not None:
            fn(keys, rows)

    def host_tier_rows(self, name: str) -> int:
        fn = getattr(self.collections.get(name), "host_tier_rows", None)
        return fn() if fn is not None else 0

    def prewarm_grow(self, state: TrainState, packed_args,
                     threshold: float = 0.5,
                     cache_dir: str = "/tmp/deeprec_jit_cache") -> list:
        """Compile-ahead for capacity growth: background-compile the train
        step at 2x capacity for every table whose load factor has crossed
        ``threshold`` but that ``maybe_grow`` (0.7) has not yet grown.

        Growth is a static-shape change, so the post-growth step is a full
        XLA recompile — the one unavoidable stall of this design (the
        48-min soak's 0.6-1.4 s/step growth fences, docs/BENCH.md). This
        warms the persistent compilation cache with the exact grown-shape
        program while training continues: the warm compile and the
        post-growth ``rejit`` lower identical HLO, so the stall collapses
        to tracing + cache deserialize. Fire-and-forget (daemon thread);
        returns the table names being warmed. Single-controller trainers
        only — the sharded trainer's per-shard growth compiles are
        proportionally smaller.

        ``packed_args`` is a prepared batch tuple (what ``_jit_train``
        takes after ``state``); only its shapes/dtypes are read.
        """
        import copy
        import threading

        names = []
        for n, c in self.collections.items():
            b = state.tables[n]
            try:
                lf = float(c.load_factor(b.ev))
            except (AttributeError, TypeError):
                continue
            if lf >= threshold and not c.needs_growth(b.ev):
                names.append(n)
        if not names:
            return []
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        aval = lambda t: jax.tree_util.tree_map(
            lambda x: (getattr(x, "shape", ()), str(getattr(x, "dtype", ""))), t)
        key = (tuple((n, self.collections[n].config.capacity) for n in names),
               str(aval(packed_args)))
        warmed = getattr(self, "_prewarmed", None)
        if warmed is None:
            warmed = self._prewarmed = set()
        if key in warmed:
            return []
        warmed.add(key)

        # a config-cloned trainer: its grow_state mutates the CLONE's
        # configs to 2x (exactly what the real growth will do to the live
        # ones), so tracing clone._train_step lowers the identical program
        clone = copy.copy(self)
        clone.collections = {n: copy.copy(c)
                             for n, c in self.collections.items()}

        def grown(st):
            tables = dict(st.tables)
            for n in names:
                b = tables[n]
                ev2, slot2 = clone.collections[n].grow_state(
                    b.ev, b.slot, opt=self.sparse_optimizers.get(n))
                tables[n] = b._replace(ev=ev2, slot=slot2)
            return st._replace(tables=tables)

        grown_avals = jax.eval_shape(grown, state)
        packed_avals = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), packed_args)

        def work():
            try:
                fn = jax.jit(clone._train_step, donate_argnums=(0,))
                fn.lower(grown_avals, *packed_avals).compile()
            except Exception as e:  # record, never kill the training loop
                errs = getattr(self, "_prewarm_errors", None)
                if errs is None:
                    errs = self._prewarm_errors = []
                errs.append(repr(e))
        t = threading.Thread(target=work, daemon=True,
                             name=f"prewarm-grow-{'-'.join(names)}")
        # keep the handle so tests/operators can join instead of polling
        threads = getattr(self, "_prewarm_threads", None)
        if threads is None:
            threads = self._prewarm_threads = []
        threads.append(t)
        t.start()
        return names

    def reset_metrics(self, state: TrainState) -> TrainState:
        return state._replace(metrics=metrics_lib.create())

    def table_health(self, state: TrainState) -> Dict[str, dict]:
        """Host-side operational health per dynamic table — the watchdog for
        the three silent degradation modes a month-long run must alarm on:
        index overflow (failed inserts read the null row), exchange-bucket
        drops (sharded runs), and dedup-cap saturation (uniques beyond
        max_unique read the null row and take no update that step). The
        reference's analog is the WorkQueue water-level summary idiom
        (python/ops/work_queue.py add_summary)."""
        out = {}
        for name, coll in self.collections.items():
            b = state.tables[name]
            idx_view = coll.index_view(b.ev)
            if idx_view is None:
                host = getattr(coll, "host_health", None)
                if host is not None:
                    out[name] = host()
                continue
            sizes = _np_global(idx_view.index.size).reshape(-1)
            cap = coll.config.capacity
            h = (_np_global(b.health).reshape(-1, 3)
                 if b.health is not None else np.zeros((1, 3), np.int64))
            out[name] = {
                "size": int(sizes.sum()),
                "capacity": cap,
                "shards": int(sizes.shape[0]),
                "load_factor": float(sizes.max()) / cap,
                "overflow": int(_np_global(idx_view.index.overflow).sum()),
                "dropped": int(h[:, 0].sum()),
                "unique_saturated_steps": int(h[:, 1].max()),
                "max_n_unique": int(h[:, 2].max()),
                "max_unique": coll.config.max_unique,
            }
        return out


def _with_capacity(cfg, new_cap):
    import dataclasses
    return dataclasses.replace(cfg, capacity=new_cap)


def _mb_split(x, k):
    if x is None:
        return None
    return jax.tree_util.tree_map(
        lambda a: a.reshape(k, a.shape[0] // k, *a.shape[1:]), x)


def _readonly_lookup(coll: EmbeddingCollection, state, cats):
    """Lookup without mutation: unknown keys read their would-be init row.
    (Thin alias of the collection hook; kept for external callers.)"""
    return coll.readonly_rows(state, cats)


def default_forward(apply_fn, dense, outputs, train):
    """Convention: collection "emb" -> pooled dict + sequence dict; optional
    collection "wide" -> wide dict. Models accept (dense, emb, wide=..,
    seq=.., train=..) subsets. ``apply_fn`` is ``model.apply(params, ...)``
    during training and ``model.init(rng, ...)`` at initialisation."""
    emb, seq = outputs.get("emb", ({}, {}))
    kwargs = {}
    if "wide" in outputs:
        kwargs["wide"] = outputs["wide"][0]
    if seq:
        kwargs["seq"] = seq
    return apply_fn(dense, emb, train=train, **kwargs)
