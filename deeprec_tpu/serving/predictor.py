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
        self.collections = collections
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
    def _load_base(self, manifest):
        for name, coll in self.collections.items():
            arrays = F.read_table(manifest["path"], name)
            cap = needed_capacity(arrays["keys"].shape[0] + 8,
                                  coll.config.capacity)
            if cap != coll.config.capacity:
                coll.config = dataclasses.replace(coll.config, capacity=cap)
            st = ev.create(coll.config)
            slot = self._noopt.init(st.values)
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
            st = self.tables[name]
            n_new = arrays["keys"].shape[0]
            size = int(np.asarray(st.index.size).sum())
            cap = needed_capacity(size + n_new, coll.config.capacity)
            if cap != coll.config.capacity:
                st, _ = ev.grow(st, coll.config, cap)
                coll.config = dataclasses.replace(coll.config, capacity=cap)
                self._jit_predict = None
            slot = self._noopt.init(st.values)
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
            outputs[name] = (coll.embeddings(urows, aux),
                             coll.sequence_embeddings(urows, aux))
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
