"""Serving: checkpoint-backed read-only predictor with incremental refresh
(the Triton-shim + incremental-serving-ops role of the reference)."""
from .predictor import Predictor

__all__ = ["Predictor"]
