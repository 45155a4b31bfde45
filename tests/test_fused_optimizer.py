"""Fused slot storage (ValuePtr row layout): adagrad_fused must train
identically to the two-array adagrad while writing one scatter."""
import numpy as np
import optax

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.train.trainer import Trainer

N_CAT, DIM = 4, 8


def make(fused: bool):
    numeric = [fc.NumericColumn(n, log_normalize=True) for n in DENSE_NAMES[:3]]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), DIM)
            for n in CAT_NAMES[:N_CAT]]
    kw = dict(name="emb", capacity=1 << 10,
              initializer=dr.Initializer("normal", scale=0.1))
    if fused:
        kw.update(fused_slot_columns=DIM, fused_slot_init=0.1)
        opt = sopt.sparse_adagrad_fused(0.1, initial_accumulator_value=0.1)
    else:
        opt = sopt.sparse_adagrad(0.1, initial_accumulator_value=0.1)
    coll = fc.EmbeddingCollection(cols, **kw)
    model = ctr.DCN(emb_names=[c.name for c in cols], cross_layers=1,
                    deep_units=(16,))
    return coll, Trainer(model, numeric, {"emb": coll}, {"emb": opt},
                         optax.adagrad(0.05))


def rows_by_key(tr, state):
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    snap = table_snapshot_host(tr.collections["emb"].config,
                               state.tables["emb"].ev,
                               state.tables["emb"].slot, evict=False)
    order = np.argsort(snap["keys"])
    return snap["keys"][order], snap["values"][order]


def test_fused_matches_unfused_training():
    bs = list(SyntheticCriteo(batch_size=64, seed=3,
                              vocab_sizes=[50] * 26).take(6))
    results = []
    for fused in (False, True):
        coll, tr = make(fused)
        state = tr.init(jax.random.key(0), bs[0])
        for b in bs:
            state = tr.train_step(state, b)
        results.append((tr, state))
    (tr_a, sa), (tr_b, sb) = results
    ka, va = rows_by_key(tr_a, sa)
    kb, vb = rows_by_key(tr_b, sb)
    np.testing.assert_array_equal(ka, kb)
    # fused snapshot rows carry [dim | acc]; compare value columns, and the
    # acc columns against the unfused acc slot
    np.testing.assert_allclose(va, vb[:, :DIM], rtol=1e-5, atol=1e-6)
    # dense params identical too
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_accumulator_column_semantics():
    coll, tr = make(True)
    bs = list(SyntheticCriteo(batch_size=32, seed=1,
                              vocab_sizes=[20] * 26).take(3))
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs:
        state = tr.train_step(state, b)
    k, v = rows_by_key(tr, state)
    # accumulator columns grew beyond their initial value for trained rows
    assert (v[:, DIM:] >= 0.1 - 1e-6).all()
    assert (v[:, DIM:].max(axis=1) > 0.1).any()
