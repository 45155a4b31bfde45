"""Multi-chip training: data-parallel dense stack + row-sharded tables.

The distributed counterpart of train.trainer.Trainer — one ``shard_map``
over a 1-D device mesh replaces the reference's whole PS/worker deployment
(`tf.train.replica_device_setter` + partitioned EVs +
grpc/grpc++/star_server, SURVEY.md §2.4):

  * dense params/optimizer replicated; gradients ``psum`` over the axis
    (sync DP — the SyncReplicasOptimizer semantics, minus staleness);
  * every table row-sharded by key hash; lookups/updates ride two
    ``all_to_all``s per step (parallel/sharded.py);
  * metrics accumulated with a ``psum`` of per-device deltas.

Scale-out to multiple hosts is the same code over a multi-host mesh
(jax.distributed.initialize + the same named axis spanning DCN).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..feature_column import EmbeddingCollection, NumericColumn, normalize_dense
from ..optim.sparse import SparseOptimizer
from ..sparse import embedding_var as ev
from ..sparse import hashtable as ht
from ..sparse import keys as K
from ..train import metrics as metrics_lib
from ..train.trainer import (TableBundle, Trainer, TrainState, bce_loss,
                             default_forward)
from . import sharded


def make_mesh(num_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


class ShardedTrainer:
    """Same API surface as Trainer, executing over a device mesh."""

    def __init__(
        self,
        model,
        numeric_columns: Sequence[NumericColumn],
        collections: Dict[str, EmbeddingCollection],
        sparse_optimizers: Dict[str, SparseOptimizer],
        dense_optimizer: optax.GradientTransformation,
        mesh: Optional[Mesh] = None,
        axis: str = "dp",
        forward: Optional[Callable] = None,
        bucket_slack: float = 2.0,
        aux_loss_weight: float = 1.0,
        microbatches: int = 1,
    ):
        self.model = model
        self.numeric_columns = list(numeric_columns)
        self.collections = collections
        self.sparse_optimizers = sparse_optimizers
        self.dense_optimizer = dense_optimizer
        self.mesh = mesh or make_mesh()
        self.axis = axis
        self.S = self.mesh.shape[axis]
        self.forward = forward or default_forward
        self.bucket_slack = bucket_slack
        self.aux_loss_weight = aux_loss_weight
        self.microbatches = microbatches
        if microbatches > 1 and any(
                hasattr(c, "sharded_needs_growth") for c in collections.values()):
            raise NotImplementedError(
                "host-sharded collections pack one resolved wire per step; "
                "microbatch slicing of the wire is not supported — use the "
                "device-index EmbeddingCollection with microbatches>1")

        self.rejit()

    def rejit(self):
        """(Re)build the jitted sharded steps (after capacity changes)."""
        axis = self.axis
        state_spec = self._state_spec()
        batch_specs = (
            P(axis, None),                                # dense [B, D]
            {n: coll.sharded_cats_spec(axis)              # cat ids / wire
             for n, coll in self.collections.items()},
            P(axis),                                      # labels [B]
        )
        self._jit_train = jax.jit(
            jax.shard_map(self._train_step, mesh=self.mesh,
                          in_specs=(state_spec,) + batch_specs,
                          out_specs=state_spec, check_vma=False),
            donate_argnums=(0,))
        self._jit_eval = jax.jit(
            jax.shard_map(self._eval_step, mesh=self.mesh,
                          in_specs=(state_spec, P()) + batch_specs,
                          out_specs=P(), check_vma=False),
            donate_argnums=(1,))

    # -- sharding specs ---------------------------------------------------
    def _table_spec(self, coll, slot_example) -> TableBundle:
        return coll.sharded_table_spec(self.axis, slot_example)

    def _state_spec(self):
        self._slot_examples = {
            name: coll.sharded_slot_example(self.sparse_optimizers[name])
            for name, coll in self.collections.items()
        }
        tables = {name: self._table_spec(coll, self._slot_examples[name])
                  for name, coll in self.collections.items()}
        return TrainState(
            params=P(), opt_state=P(), tables=tables,
            metrics=metrics_lib.MetricState(P(), P(), P(), P(), P()),
            step=P(),
        )

    # -- init ---------------------------------------------------------------
    _PARAMS_INIT_CAP = 4096  # throwaway-table capacity for params init

    def init(self, rng, sample_batch) -> TrainState:
        """Params/opt_state come from a single-device init over SMALL
        throwaway tables (capacity clamped — model parameters depend only
        on embedding dims, not table capacity); table state is created
        directly on the mesh by one no-input shard_map (no full-capacity
        host tiling, no S*cap*dim transient — the round-2 init allocated
        and threw away full tables, then np.tile'd S copies on the host)."""
        import dataclasses as _dc
        from ..train.trainer import Trainer
        saved = {n: c.config for n, c in self.collections.items()}
        try:
            for n, c in self.collections.items():
                if c.config.capacity > self._PARAMS_INIT_CAP:
                    c.config = _dc.replace(c.config,
                                           capacity=self._PARAMS_INIT_CAP)
            base = Trainer(self.model, self.numeric_columns, self.collections,
                           self.sparse_optimizers, self.dense_optimizer,
                           forward=self.forward)
            st = base.init(rng, sample_batch)
        finally:
            for n, c in self.collections.items():
                c.config = saved[n]
        from .multihost import host_to_global
        put_repl = lambda x: host_to_global(self.mesh, P(), x)
        return TrainState(
            params=jax.tree_util.tree_map(put_repl, st.params),
            opt_state=jax.tree_util.tree_map(put_repl, st.opt_state),
            tables=self._init_tables(),
            metrics=jax.tree_util.tree_map(put_repl, metrics_lib.create()),
            step=put_repl(st.step),
        )

    def _init_tables(self) -> Dict[str, TableBundle]:
        """Fresh sharded table state, created per shard on its own device
        (deterministic bodies, so replicated leaves agree)."""
        specs = {name: self._table_spec(coll, self._slot_examples[name])
                 for name, coll in self.collections.items()}

        def body():
            return {name: coll.sharded_init_local(self.sparse_optimizers[name])
                    for name, coll in self.collections.items()}

        fn = jax.jit(jax.shard_map(body, mesh=self.mesh, in_specs=(),
                                   out_specs=specs, check_vma=False))
        return fn()

    def sparse_optimizers_of(self, coll):
        for name, c in self.collections.items():
            if c is coll:
                return self.sparse_optimizers[name]
        raise KeyError(coll)

    # -- batch plumbing -------------------------------------------------------
    def prepare_batch(self, batch, train: bool = True):
        """Pack a (process-local) raw batch. On multi-host runs each
        process passes its own batch shard; the shards are assembled into
        global arrays with the step's input sharding (multihost.globalize).
        Collections declare their own packing (sharded_pack) — host-sharded
        collections resolve the whole exchange here, on the host.
        """
        from ..feature_column import pack_dense
        from .multihost import globalize
        from jax.sharding import PartitionSpec as P
        axis = self.axis
        dense = None
        if self.numeric_columns:
            dense = globalize(self.mesh, P(axis, None),
                              pack_dense(self.numeric_columns, batch))
        cats = {}
        for name, coll in self.collections.items():
            w = coll.total_width
            b_local = len(np.asarray(batch["label"]).reshape(-1)) \
                if "label" in batch else None
            if b_local is None:  # infer from any categorical column
                first = coll.columns[0].categorical.name
                b_local = np.asarray(batch[first]).shape[0]
            # per-DEVICE flat width (matches _sparse_forward's in-shard
            # computation: ids2d is [W, B/S] inside shard_map). b_local is
            # this PROCESS's batch slice, so divide by the LOCAL device
            # count — identical per-device width (and so identical bucket
            # cap) on every process and on the single-controller run.
            s_local = max(1, self.S // jax.process_count())
            cap = self._bucket_cap(coll, w * max(1, b_local // s_local))
            cats[name] = coll.sharded_pack(batch, self.S, cap, self.mesh,
                                           axis, train=train)
        labels = (globalize(self.mesh, P(axis),
                            np.asarray(batch["label"], np.float32))
                  if "label" in batch else None)
        return dense, cats, labels

    def _bucket_cap(self, coll, n_flat_local: int) -> int:
        """Per-destination bucket width: sized from the DEDUP width (the
        number of uniques a device can send), not the flat width — with a
        max_unique cap the uniques are bounded far below the flat batch,
        and the owner-side sort runs at S * bucket_cap."""
        u = n_flat_local
        if coll.config.max_unique is not None:
            u = min(u, coll.config.max_unique + 1)
        c = int(np.ceil(u * self.bucket_slack / self.S / 8.0) * 8)
        return max(c, 8)

    # -- per-device step bodies (inside shard_map) ---------------------------
    def _sparse_forward(self, tables, cats, step):
        new_tables, auxs, caps = {}, {}, {}
        for name, coll in self.collections.items():
            ids2d = cats[name]
            cap = self._bucket_cap(coll, ids2d.shape[0] * ids2d.shape[1])
            caps[name] = cap
            ev_state, aux = coll.sharded_lookup_or_create(
                tables[name].ev, ids2d, step, self.axis, cap)
            health = coll.sharded_health(tables[name].health, aux)
            new_tables[name] = tables[name]._replace(ev=ev_state,
                                                     health=health)
            auxs[name] = aux
        return new_tables, auxs, caps

    def _microstep(self, params, tables, dense, cats, labels, step):
        """One (micro)batch through the full sharded exchange: lookup ->
        loss/grads -> owner-side sparse apply. Returns per-device dense
        grads (pmean deferred to the caller so k microbatches cost one
        collective, not k)."""
        tables, auxs, caps = self._sparse_forward(tables, cats, step)
        urows = {name: self.collections[name].sharded_rows(
                     tables[name].ev, auxs[name])
                 for name in self.collections}

        def loss_fn(params, urows):
            outputs = {}
            for name, coll in self.collections.items():
                rows, valid = coll.sharded_rows_back(urows[name], auxs[name],
                                                     self.axis, caps[name])
                outputs[name] = (coll.embeddings_from_rows(rows, valid),
                                 coll.sequence_embeddings_from_rows(rows, valid))
            box = {}

            def apply_fn(*a, **kw):
                out, upd = self.model.apply(params, *a,
                                            mutable=["batch_stats"], **kw)
                box["updates"] = upd
                return out

            out = self.forward(apply_fn, dense, outputs, True)
            logits, aux_loss = out if isinstance(out, tuple) else (out, 0.0)
            loss = bce_loss(logits, labels) + self.aux_loss_weight * aux_loss
            return loss, (logits, box.get("updates", {}))

        (loss, (logits, bs_updates)), (gp, gu) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, urows)

        # sparse: owner-side apply of the summed cotangents scaled to the
        # global batch mean
        inv_s = 1.0 / self.S
        new_tables = {}
        for name, coll in self.collections.items():
            bundle = tables[name]
            ev_state, slot = coll.sharded_apply_gradients(
                bundle.ev, self.sparse_optimizers[name], bundle.slot,
                auxs[name], gu[name] * inv_s, step, self.axis, self.S)
            new_tables[name] = bundle._replace(ev=ev_state, slot=slot)
        return new_tables, gp, loss, logits, bs_updates

    def _train_step(self, state: TrainState, dense, cats, labels):
        step = state.step
        if dense is not None:
            dense = normalize_dense(self.numeric_columns, dense)

        if self.microbatches == 1:
            tables, gp, loss, logits, bs_updates = self._microstep(
                state.params, state.tables, dense, cats, labels, step)
        else:
            # AutoMicroBatch on the mesh (PipelineGraph analog,
            # graph_execution_state.cc:627): lax.scan over local microbatch
            # slices; sparse updates apply per microbatch, dense grads
            # accumulate. Collectives (all_to_all / psum at the end) ride
            # inside/after the loop exactly as in the single step.
            k = self.microbatches
            mb_dense = (None if dense is None else
                        dense.reshape(k, dense.shape[0] // k, *dense.shape[1:]))
            mb_labels = labels.reshape(k, labels.shape[0] // k)
            mb_cats = jax.tree_util.tree_map(
                lambda x: x.reshape(x.shape[0], k, x.shape[1] // k)
                           .transpose(1, 0, 2),
                cats)

            def body(carry, mb):
                tables, gp_acc, loss_acc = carry
                d, c, l = mb
                tables, gp, loss, logits, bs_up = self._microstep(
                    state.params, tables, d, c, l, step)
                gp_acc = jax.tree_util.tree_map(jnp.add, gp_acc, gp)
                return (tables, gp_acc, loss_acc + loss), (logits, bs_up)

            gp0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (tables, gp, loss_sum), (logits_mb, bs_mb) = jax.lax.scan(
                body, (state.tables, gp0, jnp.zeros(())),
                (mb_dense, mb_cats, mb_labels))
            gp = jax.tree_util.tree_map(lambda g: g / k, gp)
            loss = loss_sum / k
            logits = logits_mb.reshape(-1)
            bs_updates = jax.tree_util.tree_map(lambda x: x[-1], bs_mb)

        # dense: sync DP (psum-mean) once per step
        gp = jax.lax.pmean(gp, self.axis)
        updates, opt_state = self.dense_optimizer.update(gp, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        from ..train.trainer import _merge_batch_stats
        # batch_stats (Dice/BatchNorm running averages) were computed from
        # each device's local batch shard, but params are replicated (P());
        # pmean them so the merged running stats are identical on every
        # device — cross-replica-averaged BN semantics, and the checkpoint
        # no longer captures an arbitrary device's copy.
        bs_updates = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, self.axis), bs_updates)
        params = _merge_batch_stats(params, bs_updates)

        delta = metrics_lib.update(metrics_lib.create(state.metrics.pos_hist.shape[0]),
                                   logits, labels.reshape(logits.shape), loss)
        delta = jax.lax.psum(delta, self.axis)
        m = jax.tree_util.tree_map(jnp.add, state.metrics, delta)
        return TrainState(params=params, opt_state=opt_state, tables=tables,
                          metrics=m, step=step + 1)

    def _eval_step(self, state: TrainState, mstate, dense, cats, labels):
        if dense is not None:
            dense = normalize_dense(self.numeric_columns, dense)
        outputs = {}
        for name, coll in self.collections.items():
            ids2d = cats[name]
            cap = self._bucket_cap(coll, ids2d.shape[0] * ids2d.shape[1])
            rows, valid = coll.sharded_readonly(
                state.tables[name].ev, ids2d, self.axis, cap)
            outputs[name] = (coll.embeddings_from_rows(rows, valid),
                             coll.sequence_embeddings_from_rows(rows, valid))
        out = self.forward(functools.partial(self.model.apply, state.params),
                           dense, outputs, False)
        logits = out[0] if isinstance(out, tuple) else out
        loss = bce_loss(logits, labels)
        delta = metrics_lib.update(
            metrics_lib.create(mstate.pos_hist.shape[0]), logits, labels, loss)
        delta = jax.lax.psum(delta, self.axis)
        return jax.tree_util.tree_map(jnp.add, mstate, delta)

    # -- public ---------------------------------------------------------------
    def train_step(self, state: TrainState, batch) -> TrainState:
        dense, cats, labels = self.prepare_batch(batch)
        return self._jit_train(state, dense, cats, labels)

    def eval_step(self, state: TrainState, mstate, batch):
        dense, cats, labels = self.prepare_batch(batch, train=False)
        return self._jit_eval(state, mstate, dense, cats, labels)

    def reset_metrics(self, state: TrainState) -> TrainState:
        from .multihost import host_to_global
        return state._replace(metrics=jax.tree_util.tree_map(
            lambda x: host_to_global(self.mesh, P(), x), metrics_lib.create()))

    # -- operational controls ------------------------------------------------
    table_health = Trainer.table_health

    def maybe_grow(self, state: TrainState, threshold: float = 0.7) -> TrainState:
        """Host-side growth check between steps, sharded: any table whose
        fullest shard passes ``threshold`` load factor (or that has failed
        inserts) is rebuilt per-shard at 2x capacity inside one shard_map,
        optimizer slot rows permuted along with the optimizer's init fills.
        The single-device Trainer has had this since round 1; without it a
        mesh run saturates silently (new keys read the null row)."""
        import dataclasses as _dc

        tables = dict(state.tables)
        changed = False
        for name, coll in self.collections.items():
            b = tables[name]
            idx_view = coll.index_view(b.ev)
            if idx_view is None:
                # host-sharded collections: growth pressure comes from the
                # per-shard HOST resolvers (dense slots, grow near full)
                need = getattr(coll, "sharded_needs_growth", None)
                if need is None or not need():
                    continue
                cfg = coll.config
            else:
                from .multihost import np_global
                sizes = np_global(idx_view.index.size).reshape(-1)
                over = int(np_global(idx_view.index.overflow).sum())
                cfg = coll.config
                if sizes.max() / cfg.capacity < threshold and over == 0:
                    continue
            new_cap = cfg.capacity * 2
            fills = self.sparse_optimizers[name].fills
            spec = self._table_spec(coll, self._slot_examples[name])

            def per_shard(bundle, coll=coll, new_cap=new_cap, fills=fills):
                return coll.sharded_grow_local(bundle, new_cap, fills)

            grow_fn = jax.jit(jax.shard_map(
                per_shard, mesh=self.mesh, in_specs=(spec,), out_specs=spec,
                check_vma=False))
            tables[name] = grow_fn(b)
            coll.config = _dc.replace(cfg, capacity=new_cap)
            if hasattr(coll, "note_grown"):
                coll.note_grown()  # clear host-side overflow trigger
            changed = True
        if not changed:
            return state
        self.rejit()
        return state._replace(tables=tables)

    def raise_bucket_slack(self, factor: float = 1.5) -> float:
        """Widen the exchange buckets after observed drops (health[0]) and
        re-jit; returns the new slack."""
        self.bucket_slack *= factor
        self.rejit()
        return self.bucket_slack
