"""Estimator workflow: train -> checkpoint -> new Estimator restores ->
evaluate/predict -> serving handoff."""
import numpy as np
import optax

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.train.estimator import Estimator


def make_est(model_dir):
    numeric = [fc.NumericColumn(n, log_normalize=True)
               for n in DENSE_NAMES[:3]]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8)
            for n in CAT_NAMES[:4]]
    coll = fc.EmbeddingCollection(cols, name="emb", capacity=1 << 10,
                                  initializer=dr.Initializer("normal", scale=0.05))
    model = ctr.DCN(emb_names=[c.name for c in cols], cross_layers=1,
                    deep_units=(16,))
    return Estimator(model, numeric, {"emb": coll},
                     {"emb": sopt.sparse_adagrad(0.1)}, optax.adagrad(0.05),
                     model_dir=str(model_dir), save_secs=None,
                     incr_save_secs=None, log_steps=5)


def input_fn(seed=0, bs=64):
    return lambda: SyntheticCriteo(batch_size=bs, seed=seed,
                                   vocab_sizes=[60] * 26)


def test_estimator_train_eval_predict_restore(tmp_path):
    est = make_est(tmp_path)
    m = est.train(input_fn(), steps=8)
    assert est.global_step == 8
    assert 0 < m["loss"] < 5

    ev = est.evaluate(input_fn(seed=9), steps=3)
    assert 0.0 <= ev["auc"] <= 1.0

    probs = list(est.predict(lambda: SyntheticCriteo(
        batch_size=64, seed=5, vocab_sizes=[60] * 26).take(2)))
    assert len(probs) == 2 and probs[0].shape == (64,)
    assert ((probs[0] > 0) & (probs[0] < 1)).all()

    # a fresh Estimator over the same dir restores and continues
    est2 = make_est(tmp_path)
    est2.train(input_fn(seed=3), steps=4)
    assert est2.global_step == 12

    # serving handoff
    d = est2.export_saved_model()
    from deeprec_tpu.serving import Predictor
    numeric = [fc.NumericColumn(n, log_normalize=True)
               for n in DENSE_NAMES[:3]]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8)
            for n in CAT_NAMES[:4]]
    coll = fc.EmbeddingCollection(cols, name="emb", capacity=1 << 10,
                                  initializer=dr.Initializer("normal", scale=0.05))
    model = ctr.DCN(emb_names=[c.name for c in cols], cross_layers=1,
                    deep_units=(16,))
    pred = Predictor(model, numeric, {"emb": coll}, d)
    p = pred.predict(next(iter(input_fn(seed=5)())))
    assert p.shape == (64,)
