"""deeprec_tpu — a TPU-native framework for large-scale sparse
recommendation models, built from scratch in JAX/XLA/Pallas with the
capabilities of DeepRec (dynamic hash-keyed embedding tables, feature
admission/eviction, sparse optimizers, incremental checkpointing, sharded
all-to-all embedding exchange, and a CTR model zoo)."""

from . import config
from .config import (CBFFilter, CounterFilter, EmbeddingVariableConfig,
                     GlobalStepEvict, Initializer, L2WeightEvict,
                     StorageOption, StorageType)
from .sparse import embedding_var, hashtable, keys

__version__ = "0.1.0"
