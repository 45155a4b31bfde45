"""Fused slot storage under the row-sharded trainer (mesh + all_to_all)."""
import numpy as np
import optax

import jax

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.parallel.trainer import ShardedTrainer, make_mesh
from deeprec_tpu.train import metrics as M

DIM = 8


def make(fused: bool, n_dev=4):
    numeric = [fc.NumericColumn(n, log_normalize=True) for n in DENSE_NAMES[:3]]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), DIM)
            for n in CAT_NAMES[:4]]
    kw = dict(name="emb", capacity=512,
              initializer=dr.Initializer("normal", scale=0.1))
    if fused:
        kw.update(fused_slot_columns=DIM, fused_slot_init=0.1)
        opt = sopt.sparse_adagrad_fused(0.1, initial_accumulator_value=0.1)
    else:
        opt = sopt.sparse_adagrad(0.1, initial_accumulator_value=0.1)
    coll = fc.EmbeddingCollection(cols, **kw)
    model = ctr.DCN(emb_names=[c.name for c in cols], cross_layers=1,
                    deep_units=(16,))
    return ShardedTrainer(model=model, numeric_columns=numeric,
                          collections={"emb": coll},
                          sparse_optimizers={"emb": opt},
                          dense_optimizer=optax.adagrad(0.05),
                          mesh=make_mesh(n_dev))


def test_sharded_fused_matches_unfused():
    bs = list(SyntheticCriteo(batch_size=64, seed=3,
                              vocab_sizes=[40] * 26).take(5))
    snaps = []
    for fused in (False, True):
        tr = make(fused)
        state = tr.init(jax.random.key(0), bs[0])
        for b in bs[:4]:
            state = tr.train_step(state, b)
        from deeprec_tpu.checkpoint.saver import table_snapshot_host
        snap = table_snapshot_host(tr.collections["emb"].config,
                                   state.tables["emb"].ev,
                                   state.tables["emb"].slot,
                                   num_shards=tr.S, evict=False)
        o = np.argsort(snap["keys"])
        snaps.append((snap["keys"][o], snap["values"][o]))
        # eval still works
        ms = jax.device_put(M.create())
        ms = tr.eval_step(state, ms, bs[4])
        assert 0 < M.summarize(ms)["loss"] < 10
    (ka, va), (kb, vb) = snaps
    np.testing.assert_array_equal(ka, kb)
    np.testing.assert_allclose(va, vb[:, :DIM], rtol=1e-5, atol=1e-6)
