"""Shared model/stream definition for the multi-process tests: the worker
subprocesses (mp_worker.py) and the in-test single-process baseline must
build EXACTLY the same trainer and consume exactly the same global batch
stream for the equality assertions to be meaningful."""
import numpy as np

GLOBAL_BATCH = 64
STEPS = 6
CATS = ["C1", "C2"]


def make_common(tiered=False, host_index=False):
    import optax

    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.models import ctr
    from deeprec_tpu.optim import sparse as sopt

    ev_kw = {}
    if tiered:
        from deeprec_tpu.config import StorageOption, StorageType
        # CBF admission included so multi-part checkpoints carry per-shard
        # sketch blocks (admission behavior must survive restore at any
        # process count)
        ev_kw = dict(evict=dr.GlobalStepEvict(steps_to_live=3),
                     storage=StorageOption(storage_type=StorageType.HBM_DRAM),
                     cbf_filter=dr.CBFFilter(filter_freq=2,
                                             max_element_size=2048))
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    if host_index:
        # the host-resolved engine: per-process resolvers own the local
        # shards; cross-process id buckets ride the host exchange
        from deeprec_tpu.parallel.host_sharded import HostShardedCollection
        coll = HostShardedCollection(
            cols, name="emb", capacity=256, max_unique=64,
            initializer=dr.Initializer("normal", scale=0.1), **ev_kw)
    else:
        coll = fc.EmbeddingCollection(
            cols, name="emb", capacity=256,
            initializer=dr.Initializer("normal", scale=0.1), **ev_kw)
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    return dict(model=model, numeric_columns=[fc.NumericColumn("I1")],
                collections={"emb": coll},
                sparse_optimizers={"emb": sopt.sparse_adagrad(0.1)},
                dense_optimizer=optax.adagrad(0.05))


def global_batch(i: int, bs: int = GLOBAL_BATCH):
    """Deterministic global batch ``i`` (same on every process)."""
    rng = np.random.default_rng(1000 + i)
    b = {"label": rng.integers(0, 2, bs).astype(np.float32),
         "I1": rng.normal(size=bs).astype(np.float32)}
    for n in CATS:
        b[n] = rng.integers(0, 400, bs).astype(np.int64)
    return b
