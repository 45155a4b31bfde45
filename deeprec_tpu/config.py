"""Configuration objects for embedding tables and training.

Mirrors DeepRec's Python option family (reference:
tensorflow/python/ops/variables.py:178-266 — EmbeddingVariableOption,
GlobalStepEvict, L2WeightEvict, CounterFilter, CBFFilter, StorageOption) as
plain dataclasses; no proto layer. These are *static* (hashable) configs —
they parameterize jitted code, they are not pytree state.
"""
from __future__ import annotations

import dataclasses
import enum
import math
from typing import Optional, Tuple


class StorageType(enum.Enum):
    """Where long-tail rows live (reference embedding/config.proto:5
    StorageType{DRAM,PMEM,SSD} -> TPU tiers)."""

    HBM = "hbm"              # all rows in device HBM (default)
    HBM_DRAM = "hbm_dram"    # hot rows in HBM, overflow tier in host DRAM
    HBM_DRAM_SSD = "hbm_dram_ssd"  # + coldest host rows spill to disk


@dataclasses.dataclass(frozen=True)
class GlobalStepEvict:
    """Evict rows untouched for ``steps_to_live`` steps, applied at
    checkpoint time (reference embedding_var.h:289-313)."""

    steps_to_live: int = 0


@dataclasses.dataclass(frozen=True)
class L2WeightEvict:
    """Evict rows whose squared L2 norm falls below the threshold
    (reference embedding_var.h:264-287)."""

    l2_weight_threshold: float = -1.0


@dataclasses.dataclass(frozen=True)
class CounterFilter:
    """Admit a feature once its accumulated occurrence count reaches
    ``filter_freq`` (reference embedding_filter.h:289 CounterFilter).
    Counts accumulate by within-batch MULTIPLICITY: with a filter set the
    reference's lookup uses unique_with_counts and AddFreq(count)
    (embedding_ops.py:592-596, embedding_filter.h:307-317), so an id seen
    N times in one batch advances N. The semantic is identical on the
    local and sharded trainers (the exchange routes the counts)."""

    filter_freq: int = 0


@dataclasses.dataclass(frozen=True)
class CBFFilter:
    """Counting-Bloom-filter admission: pre-admission counts live in a small
    counter array instead of a table slot, so the never-admitted tail costs
    O(bits) not O(row) (reference embedding_filter.h:28-130 BloomFilter).
    """

    filter_freq: int = 0
    max_element_size: int = 0
    false_positive_probability: float = 0.01
    num_hashes: int = 4

    def num_counters(self) -> int:
        """Sizing rule matching the reference (embedding_config.h
        calc_num_counter:59): m = -n·ln(p)/ln(2)², rounded up to pow2."""
        if self.max_element_size <= 0:
            return 1 << 20
        m = -self.max_element_size * math.log(self.false_positive_probability) / (math.log(2) ** 2)
        return 1 << max(10, math.ceil(math.log2(max(m, 1))))


@dataclasses.dataclass(frozen=True)
class StorageOption:
    storage_type: StorageType = StorageType.HBM
    # HBM-resident capacity (rows) when tiering; host tier is unbounded.
    hbm_capacity: int = 0
    # HBM_DRAM_SSD: max rows held in host DRAM before the coldest spill to
    # the file-backed store (0 = unbounded DRAM, never spills).
    dram_row_budget: int = 0
    # backing file for the SSD tier; empty = "<tmpdir>/deeprec_ssd_<name>"
    ssd_path: str = ""


@dataclasses.dataclass(frozen=True)
class Initializer:
    """Key-deterministic row initializer.

    kind: 'zeros' | 'constant' | 'uniform' | 'normal' | 'truncated_normal'.
    Determinism per key means restores and shard-count changes reproduce the
    exact same init values (the EV default-value-matrix semantics,
    docs/Embedding-Variable.md: default row = matrix[id % default_value_dim]
    — here the matrix is implicit in the key-hash).
    """

    kind: str = "truncated_normal"
    scale: float = 0.05
    constant: float = 0.0
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class EmbeddingVariableConfig:
    """Static config of one dynamic embedding table (the
    ``tf.get_embedding_variable``/EmbeddingVariableOption analog,
    reference variable_scope.py:2141)."""

    name: str
    embedding_dim: int
    capacity: int = 1 << 16          # power of two; grows by rebuild
    initializer: Initializer = Initializer()
    counter_filter: Optional[CounterFilter] = None
    cbf_filter: Optional[CBFFilter] = None
    evict: Optional[GlobalStepEvict | L2WeightEvict] = None
    storage: StorageOption = StorageOption()
    combiner: str = "mean"
    max_probes: int = 32
    value_dtype: str = "float32"
    # Static cap on per-step unique keys (None = exact, width n). All
    # sparse-path ops run at width max_unique+1; uniques beyond the cap
    # read the null row for one step (see ops.unique). Typically n/4 for
    # heavy-tailed id streams.
    max_unique: Optional[int] = None
    # Fused slot storage (the ValuePtr row layout of the reference): the
    # values array carries this many extra trailing columns holding the
    # sparse optimizer's per-row state, so one scatter persists
    # value+slot updates together (scatters are issue-bound per row —
    # this halves the optimizer's write cost). Pair with a *_fused
    # optimizer whose slot_columns(dim) matches.
    fused_slot_columns: int = 0
    # Initial value of fused slot columns (e.g. adagrad's
    # initial_accumulator_value); must match the paired fused optimizer.
    fused_slot_init: float = 0.0
    # Lazy row initialisation (filter-less tables only): created rows read
    # their deterministic init at gather time and materialise on their
    # first optimizer update — removing a [U -> capacity] row scatter per
    # step (~15% of a CTR train step). Every trainer path writes created
    # rows in the same step, so semantics match eager init there; raw
    # lookup-then-export *without* an update would export zeros — set
    # lazy_init=False for that usage.
    lazy_init: bool = True
    # Per-row metadata tracking — the reference's layout selection
    # (kv_variable_ops.py:282-285: "light" ValuePtr with NO freq/version
    # cells when steps_to_live==0, filter_freq==0 and no L2 threshold,
    # else "normal"). None = auto: freq tracks iff an admission filter is
    # configured; version/create_step track iff an eviction policy is.
    # Set track_version=True explicitly to use version-delta INCREMENTAL
    # checkpoints on a table with no eviction policy (the reference's
    # recorder-op equivalent); tables without version tracking fall back
    # to full-row incremental sections. The metadata scatters cost ~15%
    # of a plain CTR train step — the light layout skips them.
    track_freq: Optional[bool] = None
    track_version: Optional[bool] = None
    # Wire dtype of the sharded row/gradient exchange (the rows-back
    # all_to_all and its autodiff transpose, parallel/sharded.py). On a
    # multi-chip mesh the returned rows and the reverse gradient exchange
    # dominate ICI bytes at S*bucket_cap*dim*4B per step each direction;
    # "bfloat16" halves both. Values are rounded per position ON THE WIRE
    # only — every gather, segment-sum and optimizer accumulation stays in
    # the table dtype (the lossy-compression recipe of DLRM comm papers,
    # e.g. arxiv 2407.04272, with error confined to one rounding). Ids and
    # metadata planes stay exact. None/"float32" = exact exchange.
    exchange_dtype: Optional[str] = None
    # Multi-hash (Q-R trick) / dynamic-dim variants are separate table types
    # built on top of this config (sparse/multihash.py, sparse/dynamicdim.py).

    def __post_init__(self):
        if self.capacity & (self.capacity - 1):
            raise ValueError("capacity must be a power of two")
        if self.counter_filter and self.cbf_filter:
            raise ValueError("choose at most one admission filter")

    @property
    def filter_freq(self) -> int:
        if self.counter_filter:
            return self.counter_filter.filter_freq
        if self.cbf_filter:
            return self.cbf_filter.filter_freq
        return 0

    @property
    def freq_tracked(self) -> bool:
        if self.track_freq is not None:
            return self.track_freq
        return (self.counter_filter is not None
                or self.cbf_filter is not None)

    @property
    def version_tracked(self) -> bool:
        if self.track_version is not None:
            return self.track_version
        # tiered storage ranks demotion coldness by the version (last-touch
        # step) plane and reconciles tier rows against device rows by
        # version on restore — a tiered table must stamp versions even
        # with no eviction policy configured
        return (self.evict is not None
                or self.storage.storage_type is not StorageType.HBM)
