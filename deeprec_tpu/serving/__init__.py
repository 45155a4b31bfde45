"""Serving: checkpoint-backed read-only predictors with incremental refresh
(the Triton-shim + incremental-serving-ops role of the reference).
``ShardedPredictor`` serves tables larger than one chip's HBM row-sharded
over a device mesh."""
from .predictor import Predictor, ShardedPredictor

__all__ = ["Predictor", "ShardedPredictor"]
