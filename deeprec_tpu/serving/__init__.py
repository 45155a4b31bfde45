"""Serving: checkpoint-backed read-only predictors with incremental refresh
(the Triton-shim + incremental-serving-ops role of the reference).
``ShardedPredictor`` serves tables larger than one chip's HBM row-sharded
over a device mesh; ``TieredPredictor`` serves models larger than device
HBM entirely from one chip by keeping the cold tail in host DRAM (the
reference's CPU-resident EV serving)."""
from .predictor import Predictor, ShardedPredictor, TieredPredictor

__all__ = ["Predictor", "ShardedPredictor", "TieredPredictor"]
