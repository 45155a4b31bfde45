"""User-facing API facade with the reference's entry-point names.

Maps DeepRec's public surface (reference: tensorflow/python/ops/
variable_scope.py:2141 ``tf.get_embedding_variable``, :2292
``get_multihash_variable``, :2348
``get_dynamic_dimension_embedding_variable``; feature_column_v2.py:2043
``categorical_column_with_embedding``, :2051
``categorical_column_with_adaptive_embedding``;
contrib/layers feature_column.py:732/1460) onto this framework's
functional equivalents, so reference users find the same names.

The semantics differ in exactly one way everywhere: these return
*(config/state, functions)* instead of registering graph resources —
JAX has no graph to register into.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

from .config import (CBFFilter, CounterFilter, EmbeddingVariableConfig,
                     GlobalStepEvict, Initializer, L2WeightEvict,
                     StorageOption, StorageType)
from .feature_column import (CategoricalColumn, EmbeddingColumn,
                             EmbeddingCollection, NumericColumn,
                             SequenceEmbeddingColumn)
from .sparse import adaptive, dynamicdim, embedding_var, hash_table_api
from .sparse import multihash as _mh


def get_embedding_variable(
    name: str,
    embedding_dim: int,
    key_dtype: str = "int64",
    initializer: Optional[Initializer] = None,
    ev_option=None,
    capacity: int = 1 << 16,
    **kwargs,
) -> Tuple[EmbeddingVariableConfig, "embedding_var.EVState"]:
    """tf.get_embedding_variable analog: returns (config, fresh state).

    Filters/eviction/storage come in as config kwargs (counter_filter=,
    cbf_filter=, evict=, storage=) instead of the EmbeddingVariableOption
    bundle; :class:`deeprec_tpu.config` holds the option classes.
    """
    cfg = EmbeddingVariableConfig(
        name=name, embedding_dim=embedding_dim, capacity=capacity,
        initializer=initializer or Initializer(), **kwargs)
    return cfg, embedding_var.create(cfg)


def get_multihash_variable(
    name: str,
    dims: Sequence[int],
    complementary_strategy: str = "Q-R",
    operation: str = "add",
    embedding_dim: Optional[int] = None,
    **kwargs,
) -> Tuple[_mh.MultiHashConfig, _mh.MultiHashState]:
    """get_multihash_variable analog (variable_scope.py:2292): ``dims`` are
    the sub-table sizes (Q, R, ...); ``operation`` in add|mult|concat."""
    if complementary_strategy != "Q-R":
        raise ValueError("only the Q-R complementary strategy is supported")
    cfg = _mh.MultiHashConfig(
        name=name, embedding_dim=embedding_dim or kwargs.pop("dim", 16),
        table_sizes=tuple(dims), combiner=operation)
    return cfg, _mh.create(cfg)


def get_dynamic_dimension_embedding_variable(
    name: str,
    embedding_block_dimension: int,
    embedding_block_num: int,
    freq_thresholds: Optional[Sequence[int]] = None,
    **kwargs,
):
    """get_dynamic_dimension_embedding_variable analog
    (variable_scope.py:2348): block_num blocks of block_dimension, widths
    gated by frequency."""
    thr = tuple(freq_thresholds) if freq_thresholds else tuple(
        0 if i == 0 else 10 ** i for i in range(embedding_block_num))
    dd = dynamicdim.DynamicDimConfig(
        block_num=embedding_block_num, block_dim=embedding_block_dimension,
        freq_thresholds=thr)
    cfg = dynamicdim.ev_config(name, dd, **kwargs)
    return (cfg, dd), embedding_var.create(cfg)


def get_hash_table(capacity: int, admit: Optional[CBFFilter] = None):
    """get_hash_table analog (the second KV stack,
    python/ops/hash_table/hash_table.py:142)."""
    return hash_table_api.create(capacity, admit)


def categorical_column_with_embedding(key: str, dtype: str = "int64",
                                      **kwargs) -> CategoricalColumn:
    """feature_column_v2.py:2043 analog: raw 64-bit ids, dynamic table."""
    return CategoricalColumn(name=key, hash_bucket_size=None, **kwargs)


def categorical_column_with_hash_bucket(key: str, hash_bucket_size: int,
                                        **kwargs) -> CategoricalColumn:
    return CategoricalColumn(name=key, hash_bucket_size=hash_bucket_size,
                             **kwargs)


def categorical_column_with_adaptive_embedding(key: str, hash_bucket_size: int,
                                               **kwargs):
    """feature_column_v2.py:2051 analog. Adaptive routing lives in
    sparse.adaptive (static bucket table + EV by admission); at the column
    level this is a CategoricalColumn consumed by an adaptive table."""
    return CategoricalColumn(name=key, hash_bucket_size=None, **kwargs), \
        hash_bucket_size


def embedding_column(categorical: CategoricalColumn, dimension: int,
                     combiner: str = "mean", **kwargs) -> EmbeddingColumn:
    """contrib embedding_column analog (do_fusion is implicit: collections
    always coalesce lookups, coalesced_utils.py:45 semantics)."""
    return EmbeddingColumn(categorical=categorical, dimension=dimension,
                           combiner=combiner)


def shared_embedding_columns(keys: Sequence[str], dimension: int,
                             shared_name: str, combiner: str = "mean",
                             max_lengths: Optional[Sequence[int]] = None
                             ) -> list:
    """shared_embedding_columns analog: same rows across several columns."""
    out = []
    for i, k in enumerate(keys):
        ml = max_lengths[i] if max_lengths else 1
        out.append(EmbeddingColumn(
            CategoricalColumn(name=k, shared_embedding=shared_name,
                              max_length=ml),
            dimension=dimension, combiner=combiner))
    return out
