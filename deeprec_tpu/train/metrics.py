"""Streaming training/eval metrics.

The reference trainers report ``tf.metrics.auc`` / ``accuracy``
(modelzoo/WDL/train.py:216-218). Here AUC is a device-resident streaming
histogram (pos/neg counts over fixed probability bins) finalised by
trapezoidal integration — equivalent to tf.metrics.auc's thresholded
estimator with num_thresholds = nbins+1 (default 1024 bins: 5x the
reference's num_thresholds=200, at a quarter of the one-hot matmul cost),
and update is a pure function that composes with jit/donation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MetricState(NamedTuple):
    pos_hist: jax.Array  # [nbins] float32
    neg_hist: jax.Array
    loss_sum: jax.Array  # f32 scalar
    correct: jax.Array   # f32 scalar
    count: jax.Array     # f32 scalar


def create(nbins: int = 1024) -> MetricState:
    # distinct buffers per field: shared buffers break donation (the same
    # buffer must not be donated twice in one call)
    return MetricState(
        pos_hist=jnp.zeros((nbins,), jnp.float32),
        neg_hist=jnp.zeros((nbins,), jnp.float32),
        loss_sum=jnp.zeros((), jnp.float32),
        correct=jnp.zeros((), jnp.float32),
        count=jnp.zeros((), jnp.float32),
    )


def update(state: MetricState, logits: jax.Array, labels: jax.Array,
           loss: jax.Array | None = None) -> MetricState:
    nbins = state.pos_hist.shape[0]
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    labels = labels.astype(jnp.float32)
    idx = jnp.clip((p * nbins).astype(jnp.int32), 0, nbins - 1)
    # histogram as a one-hot matmul: a duplicate-index scatter-add would
    # serialize on TPU (~1us/element); the MXU does this in microseconds
    onehot = jax.nn.one_hot(idx, nbins, dtype=jnp.float32)
    pos = state.pos_hist + labels @ onehot
    neg = state.neg_hist + (1.0 - labels) @ onehot
    correct = state.correct + jnp.sum((p >= 0.5) == (labels >= 0.5))
    n = jnp.asarray(logits.shape[0], jnp.float32)
    loss_sum = state.loss_sum + (loss * n if loss is not None else 0.0)
    return MetricState(pos, neg, loss_sum, correct, state.count + n)


def auc(state: MetricState) -> jax.Array:
    """Trapezoidal AUC over the ROC curve induced by the bin thresholds."""
    # cumulative from the high-probability end: TP/FP at each threshold
    tp = jnp.cumsum(state.pos_hist[::-1])
    fp = jnp.cumsum(state.neg_hist[::-1])
    P = jnp.maximum(tp[-1], 1e-12)
    N = jnp.maximum(fp[-1], 1e-12)
    tpr = jnp.concatenate([jnp.zeros((1,)), tp / P])
    fpr = jnp.concatenate([jnp.zeros((1,)), fp / N])
    return jnp.sum((fpr[1:] - fpr[:-1]) * 0.5 * (tpr[1:] + tpr[:-1]))


@jax.jit
def _summary_vec(state: MetricState) -> jax.Array:
    """[auc, correct, loss_sum, count] as ONE array: a summary is then a
    single D2H read. Separate float() reads each pay a full host<->device
    round trip (~25 ms on a tunneled chip; 4 reads per fence was a
    measurable per-step tax in the production loop)."""
    return jnp.stack([auc(state), state.correct, state.loss_sum,
                      state.count])


def summarize(state: MetricState) -> dict:
    a, correct, loss_sum, count = np.asarray(_summary_vec(state))
    c = max(float(count), 1e-12)
    return {
        "auc": float(a),
        "accuracy": float(correct) / c,
        "loss": float(loss_sum) / c,
        "examples": int(count),
    }
