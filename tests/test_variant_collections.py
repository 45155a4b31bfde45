"""Variant collections trained end-to-end through the standard Trainer."""
import numpy as np
import optax

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.feature_column_variants import (AdaptiveCollection,
                                                 DynamicDimCollection,
                                                 MultiHashCollection)
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.sparse.dynamicdim import DynamicDimConfig
from deeprec_tpu.train import metrics as M
from deeprec_tpu.train.trainer import Trainer
from deeprec_tpu.data.criteo import SyntheticCriteo, CAT_NAMES, DENSE_NAMES

N_CAT, N_DENSE = 4, 3


def make_trainer(coll, dense_opt=None):
    numeric = [fc.NumericColumn(n, log_normalize=True)
               for n in DENSE_NAMES[:N_DENSE]]
    model = ctr.DCN(emb_names=[c.name for c in coll.columns],
                    cross_layers=1, deep_units=(32,))
    return Trainer(model, numeric, {"emb": coll},
                   {"emb": sopt.sparse_adagrad(0.5,
                                               initial_accumulator_value=0.01)},
                   dense_opt or optax.adam(3e-3))


def batches(n, bs=256, seed=0):
    return list(SyntheticCriteo(
        batch_size=bs, seed=seed, active_features=set(range(N_CAT)),
        noise=0.3, vocab_sizes=[100] * 26).take(n))


def cols(dim=8):
    return [fc.EmbeddingColumn(fc.CategoricalColumn(n), dim)
            for n in CAT_NAMES[:N_CAT]]


def run_and_auc(tr, n_train=150):
    bs = batches(n_train + 1)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs[:n_train]:
        state = tr.train_step(state, b)
    ms = M.create()
    for b in batches(10, seed=77):
        ms = tr.eval_step(state, ms, b)
    return state, M.summarize(ms)["auc"]


def test_multihash_collection_trains():
    coll = MultiHashCollection(cols(), table_sizes=(256, 64),
                               combiner_op="add")
    tr = make_trainer(coll)
    state, auc = run_and_auc(tr)
    assert auc > 0.54, auc


def test_adaptive_collection_trains_and_migrates():
    coll = AdaptiveCollection(cols(), buckets=128, capacity=1 << 10,
                              counter_filter=dr.CounterFilter(2),
                              initializer=dr.Initializer("normal", scale=0.05))
    tr = make_trainer(coll)
    state, auc = run_and_auc(tr)
    assert auc > 0.54, auc
    # hot keys hold admitted EV rows
    assert int(state.tables["emb"].ev.ev.index.size.sum()) > 0


def test_dynamicdim_collection_trains():
    dd = DynamicDimConfig(block_num=2, block_dim=4, freq_thresholds=(0, 20))
    coll = DynamicDimCollection(cols(dim=8), dynamic_dim=dd, capacity=1 << 10,
                                initializer=dr.Initializer("normal", scale=0.05))
    tr = make_trainer(coll)
    state, auc = run_and_auc(tr)
    assert auc > 0.54, auc
    # rare rows train only the first block: the second block of a
    # low-freq row stays at its init value scale while blocks gate on freq
    st = state.tables["emb"].ev
    freqs = np.asarray(st.freqs[:-1])
    rare = (freqs > 0) & (freqs < 20)
    if rare.any():
        rows = np.asarray(st.values[:-1])[rare]
        # gradient never reached block 2 of rare rows: its acc stays at
        # make_trainer's initial_accumulator_value (0.01) — untouched
        acc = np.asarray(state.tables["emb"].slot["acc"][:-1])[rare]
        np.testing.assert_allclose(acc[:, 4:], 0.01, atol=1e-6)


def test_variant_checkpoint_roundtrip(tmp_path):
    from deeprec_tpu.checkpoint import CheckpointManager
    coll = MultiHashCollection(cols(), table_sizes=(128, 32))
    tr = make_trainer(coll)
    bs = batches(5)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs[:4]:
        state = tr.train_step(state, b)
    CheckpointManager(str(tmp_path)).save(tr, state)

    coll2 = MultiHashCollection(cols(), table_sizes=(128, 32))
    tr2 = make_trainer(coll2)
    st2 = tr2.init(jax.random.key(1), bs[0])
    st2, ok = CheckpointManager(str(tmp_path)).restore(tr2, st2)
    assert ok
    for a, b_ in zip(jax.tree_util.tree_leaves(state.tables["emb"].ev),
                     jax.tree_util.tree_leaves(st2.tables["emb"].ev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_))
    st2 = tr2.train_step(st2, bs[4])
