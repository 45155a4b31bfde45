"""Estimator: the reference's high-level train/evaluate/predict workflow.

DeepRec users drive training through ``tf.estimator.Estimator`` (or a bare
MonitoredTrainingSession loop); this is the same workflow shape over the
native Trainer stack: periodic+incremental checkpointing, restore-on-
construct, metric summaries, and a serving handoff — without the graph
machinery underneath.
"""
from __future__ import annotations

import itertools
from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np


class Estimator:
    """train / evaluate / predict over a model directory.

    Args mirror the Trainer; ``model_dir`` adds checkpoint management
    (restore latest on first use, periodic full + incremental saves).
    """

    def __init__(self, model, numeric_columns, collections,
                 sparse_optimizers, dense_optimizer, model_dir: str,
                 forward: Optional[Callable] = None,
                 save_secs: Optional[float] = 600.0,
                 incr_save_secs: Optional[float] = None,
                 mesh=None, log_steps: int = 100):
        from ..checkpoint import CheckpointManager
        from .trainer import Trainer
        from ..parallel.trainer import ShardedTrainer

        kw = dict(model=model, numeric_columns=numeric_columns,
                  collections=collections,
                  sparse_optimizers=sparse_optimizers,
                  dense_optimizer=dense_optimizer, forward=forward)
        self.trainer = (ShardedTrainer(mesh=mesh, **kw) if mesh is not None
                        else Trainer(**kw))
        self.model_dir = model_dir
        self.mgr = CheckpointManager(model_dir, full_secs=save_secs,
                                     incr_secs=incr_save_secs)
        self.log_steps = log_steps
        self._state = None

    # -- state -------------------------------------------------------------
    def _ensure_state(self, sample_batch):
        if self._state is None:
            st = self.trainer.init(jax.random.key(0), sample_batch)
            st, restored = self.mgr.restore(self.trainer, st)
            self._state = st
        return self._state

    @property
    def global_step(self) -> int:
        return int(self._state.step) if self._state is not None else 0

    # -- workflow ------------------------------------------------------------
    def train(self, input_fn, steps: Optional[int] = None) -> dict:
        """``input_fn() -> batch iterator``; trains ``steps`` steps (or the
        whole stream), checkpointing on the managers' cadence."""
        from ..data.prefetch import staged
        from . import metrics as M

        it = iter(input_fn())
        first = next(it)
        state = self._ensure_state(first)
        stream = itertools.chain([first], it)
        if steps is not None:
            stream = itertools.islice(stream, steps)
        done = 0
        with staged(stream, prepare=self.trainer.prepare_batch) as pf:
            for packed in pf:
                state = self.trainer._jit_train(state, *packed)
                done += 1
                if done % self.log_steps == 0:
                    m = M.summarize(state.metrics)  # device fence
                    self.mgr.maybe_save(self.trainer, state)
                    if hasattr(self.trainer, "maybe_grow"):
                        state = self.trainer.maybe_grow(state)
        self._state = state
        self.mgr.save(self.trainer, state)
        return M.summarize(state.metrics)

    def evaluate(self, input_fn, steps: Optional[int] = None) -> dict:
        from . import metrics as M
        it = iter(input_fn())
        if steps is not None:
            it = itertools.islice(it, steps)
        first = next(it)
        state = self._ensure_state(first)
        ms = M.create()
        if hasattr(self.trainer, "mesh"):
            from jax.sharding import NamedSharding, PartitionSpec as P
            ms = jax.device_put(ms, NamedSharding(self.trainer.mesh, P()))
        for batch in itertools.chain([first], it):
            ms = self.trainer.eval_step(state, ms, batch)
        return M.summarize(ms)

    def predict(self, input_fn):
        """Yields [B] probability arrays per input batch (read-only)."""
        from .trainer import _readonly_lookup
        from ..feature_column import normalize_dense
        import functools
        import jax.numpy as jnp

        for batch in input_fn():
            state = self._ensure_state(batch)
            # read-only packing: predict must not mutate a host-index
            # collection's key index (train=False routes through
            # pack_ids_eval; plain collections are unaffected)
            dense, cats, _ = self.trainer.prepare_batch(batch, train=False)
            tr = self.trainer
            if dense is not None:
                dense = normalize_dense(tr.numeric_columns, dense)
            outputs = {}
            for name, coll in tr.collections.items():
                aux, urows = coll.readonly_rows(state.tables[name].ev,
                                                cats[name])
                outputs[name] = (coll.embeddings(urows, aux),
                                 coll.sequence_embeddings(urows, aux))
            out = tr.forward(functools.partial(tr.model.apply, state.params),
                             dense, outputs, False)
            logits = out[0] if isinstance(out, tuple) else out
            yield np.asarray(jax.nn.sigmoid(logits))

    def export_saved_model(self) -> str:
        """Serving handoff: final full save; serve with
        ``serving.Predictor(model, ..., self.model_dir)``."""
        if self._state is not None:
            self.mgr.save(self.trainer, self._state)
        return self.model_dir
