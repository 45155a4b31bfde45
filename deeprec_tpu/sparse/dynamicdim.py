"""Dynamic-dimension embedding: frequency-adaptive row width.

TPU-native rebuild of DeepRec's ``DynamicEmbeddingVariable``
(reference: tensorflow/python/ops/kv_variable_ops.py:782,
``get_dynamic_dimension_embedding_variable`` variable_scope.py:2348, and
the block_num layout of embedding/value_ptr.h): a row is ``block_num``
blocks of ``dim`` floats; low-frequency ids effectively use only their
first block(s), high-frequency ids the full width — tail features don't
pay full-dim memory bandwidth or curvature.

TPU-first design: storage stays a single ``[capacity+1, block_num*dim]``
array (static shape, vector-friendly); *dimensionality* is a per-key
**block mask** derived from the freq metadata the table already maintains:
block ``b`` activates once ``freq >= freq_thresholds[b]``. Masked blocks
read/write zeros, so the gather, the model, and the optimizer all keep
static shapes — the adaptive part is one multiply.

The lookup composes with the base :mod:`embedding_var` engine: this module
only adds the mask derivation and masked gather/apply wrappers.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import EmbeddingVariableConfig
from . import embedding_var as ev


@dataclasses.dataclass(frozen=True)
class DynamicDimConfig:
    """``block_num`` blocks of ``block_dim``; block b requires
    ``freq_thresholds[b]`` observations (threshold[0] must be 0)."""

    block_num: int
    block_dim: int
    freq_thresholds: Tuple[int, ...]

    def __post_init__(self):
        if len(self.freq_thresholds) != self.block_num:
            raise ValueError("one freq threshold per block")
        if self.freq_thresholds[0] != 0:
            raise ValueError("first block must always be active")
        if list(self.freq_thresholds) != sorted(self.freq_thresholds):
            raise ValueError("thresholds must be non-decreasing")

    @property
    def full_dim(self) -> int:
        return self.block_num * self.block_dim


def ev_config(name: str, dd: DynamicDimConfig, **kwargs) -> EmbeddingVariableConfig:
    """Base EV config with the full (all-blocks) row width. Frequency
    tracking is forced on: block widths gate on the freq metadata, which
    the light layout would otherwise skip writing."""
    kwargs.setdefault("track_freq", True)
    return EmbeddingVariableConfig(name=name, embedding_dim=dd.full_dim, **kwargs)


def block_mask(dd: DynamicDimConfig, freqs: jax.Array) -> jax.Array:
    """[n, block_num*dim] 0/1 mask from per-key frequencies [n]."""
    thr = jnp.asarray(dd.freq_thresholds, jnp.int32)        # [B]
    active = freqs[:, None] >= thr[None, :]                  # [n, B]
    return jnp.repeat(active.astype(jnp.float32), dd.block_dim, axis=-1)


def gather(state: ev.EVState, dd: DynamicDimConfig, aux: ev.LookupAux,
           config: EmbeddingVariableConfig | None = None) -> jax.Array:
    """[n_unique, full_dim] rows with inactive blocks zeroed. The zeroing is
    part of the differentiable graph, so cotangents of inactive blocks
    vanish and the optimizer never updates them — matching the reference's
    semantics that a row only trains the width it has reached. Pass the EV
    ``config`` so lazily-initialised created rows read their init."""
    if config is not None:
        rows = ev.gather(state.values, aux, config)
    else:
        rows = state.values[aux.slots]
    freqs = state.freqs[aux.slots]
    return rows * block_mask(dd, freqs)


def effective_dims(state: ev.EVState, dd: DynamicDimConfig, aux: ev.LookupAux) -> jax.Array:
    """Per-unique-key active width (debug/metrics: the reference exposes
    blocks through DynamicEmbeddingVariable.blocknum_list)."""
    thr = jnp.asarray(dd.freq_thresholds, jnp.int32)
    freqs = state.freqs[aux.slots]
    return jnp.sum((freqs[:, None] >= thr[None, :]).astype(jnp.int32), -1) * dd.block_dim
