"""Serving: checkpoint-backed read-only predictors with incremental refresh
(the Triton-shim + incremental-serving-ops role of the reference).
``ShardedPredictor`` serves tables larger than one chip's HBM row-sharded
over a device mesh; ``TieredPredictor`` serves models larger than device
HBM entirely from one chip by keeping the cold tail in host DRAM (the
reference's CPU-resident EV serving)."""
from .predictor import Predictor, ShardedPredictor, TieredPredictor


def make_server(predictor, host="127.0.0.1", port=8500, refresh_secs=0.0):
    """HTTP front end over a predictor — see :mod:`deeprec_tpu.serving.server`
    (lazy import: the predictors stay importable without the server)."""
    from .server import make_server as _mk
    return _mk(predictor, host=host, port=port, refresh_secs=refresh_secs)


__all__ = ["Predictor", "ShardedPredictor", "TieredPredictor", "make_server"]
