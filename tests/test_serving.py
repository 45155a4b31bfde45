"""Serving tests: predictor parity with the training-state eval path and
live incremental refresh (reference: incremental serving via
KvResourceIncrImport/IncrRestore, docs/Incremental-Checkpoint.md)."""
import numpy as np
import optax

import jax

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.checkpoint import CheckpointManager
from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.serving import Predictor
from deeprec_tpu.train.trainer import Trainer

N_CAT, N_DENSE = 4, 3


def make_parts(capacity=1 << 10):
    numeric = [fc.NumericColumn(n, log_normalize=True)
               for n in DENSE_NAMES[:N_DENSE]]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8)
            for n in CAT_NAMES[:N_CAT]]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=capacity,
        initializer=dr.Initializer("normal", scale=0.05))
    model = ctr.DCN(emb_names=[c.name for c in cols],
                    cross_layers=2, deep_units=(32, 16))
    return numeric, coll, model, [c.name for c in cols]


def batches(n, bs=64, seed=0):
    return list(SyntheticCriteo(batch_size=bs, seed=seed,
                                vocab_sizes=[60, 120, 240, 480] + [9] * 22
                                ).take(n))


def test_predictor_matches_trainer_eval(tmp_path):
    numeric, coll, model, names = make_parts()
    tr = Trainer(model, numeric, {"emb": coll},
                 {"emb": sopt.sparse_adagrad(0.05)}, optax.adagrad(0.05))
    bs = batches(5)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs[:4]:
        state = tr.train_step(state, b)
    CheckpointManager(str(tmp_path)).save(tr, state)

    numeric2, coll2, model2, _ = make_parts()
    pred = Predictor(model2, numeric2, {"emb": coll2}, str(tmp_path))
    probs = pred.predict(bs[4])
    assert probs.shape == (64,)
    assert ((probs > 0) & (probs < 1)).all()

    # parity with the trainer's own forward on the same state
    import jax.numpy as jnp
    from deeprec_tpu.train import metrics as M
    dense, cats, labels = tr.prepare_batch(bs[4])
    m = tr._jit_eval(state, M.create(), dense, cats, labels)
    # recompute the trainer logits directly for comparison
    from deeprec_tpu.feature_column import normalize_dense
    from deeprec_tpu.train.trainer import _readonly_lookup
    d = normalize_dense(numeric, dense)
    aux, urows = _readonly_lookup(coll, state.tables["emb"].ev, cats["emb"])
    emb, _seq = coll.embeddings_readonly(urows, aux)
    logits = model.apply(state.params, d, emb, train=False)
    np.testing.assert_allclose(probs, np.asarray(jax.nn.sigmoid(logits)),
                               rtol=2e-4, atol=2e-5)


def test_predictor_incremental_refresh(tmp_path):
    numeric, coll, model, names = make_parts()
    tr = Trainer(model, numeric, {"emb": coll},
                 {"emb": sopt.sparse_adagrad(0.05)}, optax.adagrad(0.05))
    bs = batches(8)
    state = tr.init(jax.random.key(0), bs[0])
    mgr = CheckpointManager(str(tmp_path))
    for b in bs[:3]:
        state = tr.train_step(state, b)
    mgr.save(tr, state)

    numeric2, coll2, model2, _ = make_parts()
    pred = Predictor(model2, numeric2, {"emb": coll2}, str(tmp_path))
    p_before = pred.predict(bs[7])
    assert not pred.refresh()  # nothing new

    for b in bs[3:6]:
        state = tr.train_step(state, b)
    mgr.save_incremental(tr, state)
    assert pred.refresh()      # picks up the delta
    assert pred.step == int(state.step)
    p_after = pred.predict(bs[7])
    assert not np.allclose(p_before, p_after)  # the model moved

    # refreshed predictor == fresh predictor over the same dir
    numeric3, coll3, model3, _ = make_parts()
    fresh = Predictor(model3, numeric3, {"emb": coll3}, str(tmp_path))
    np.testing.assert_allclose(p_after, fresh.predict(bs[7]),
                               rtol=2e-4, atol=2e-5)


def test_predictor_refresh_on_new_full(tmp_path):
    numeric, coll, model, names = make_parts()
    tr = Trainer(model, numeric, {"emb": coll},
                 {"emb": sopt.sparse_adagrad(0.05)}, optax.adagrad(0.05))
    bs = batches(6)
    state = tr.init(jax.random.key(0), bs[0])
    mgr = CheckpointManager(str(tmp_path))
    state = tr.train_step(state, bs[0])
    mgr.save(tr, state)
    numeric2, coll2, model2, _ = make_parts()
    pred = Predictor(model2, numeric2, {"emb": coll2}, str(tmp_path))
    for b in bs[1:4]:
        state = tr.train_step(state, b)
    mgr.save(tr, state)       # new full
    assert pred.refresh()
    assert pred.step == int(state.step)
