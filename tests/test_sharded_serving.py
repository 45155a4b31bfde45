"""ShardedPredictor: row-sharded serving (tables spanning chips), reshard
at load, parity with the single-device Predictor, incremental refresh."""
import numpy as np
import optax
import pytest

import jax

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.checkpoint import CheckpointManager
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.parallel.trainer import ShardedTrainer, make_mesh
from deeprec_tpu.serving.predictor import Predictor, ShardedPredictor

CATS = ["C1", "C2"]


def _common():
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=256,
        initializer=dr.Initializer("normal", scale=0.1))
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    return dict(model=model, numeric_columns=[fc.NumericColumn("I1")],
                collections={"emb": coll},
                sparse_optimizers={"emb": sopt.sparse_adagrad(0.2)},
                dense_optimizer=optax.adagrad(0.05))


def _batch(rng, bs=32, vocab=100):
    b = {"I1": rng.normal(size=bs).astype(np.float32)}
    for n in CATS:
        b[n] = rng.integers(0, vocab, bs).astype(np.int64)
    b["label"] = (b["C1"] % 2).astype(np.float32)
    return b


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("sp_ckpt")
    tr = ShardedTrainer(mesh=make_mesh(8), **_common())
    rng = np.random.default_rng(0)
    st = tr.init(jax.random.key(0), _batch(rng))
    for _ in range(10):
        st = tr.train_step(st, _batch(rng))
    mgr = CheckpointManager(str(d))
    mgr.save(tr, st, evict=False)
    return str(d), tr, st, mgr


def test_sharded_predictor_matches_single_device(trained_ckpt):
    ckpt, _, _, _ = trained_ckpt
    rng = np.random.default_rng(7)
    b = _batch(rng, bs=24)  # not a multiple of 4: exercises padding
    p1 = Predictor(ckpt_dir=ckpt, **{k: v for k, v in _common().items()
                                     if k in ("model", "numeric_columns",
                                              "collections")})
    out1 = p1.predict(b)
    # serve RESHARDED: trained on 8 shards, served on 4
    p4 = ShardedPredictor(ckpt_dir=ckpt, mesh=make_mesh(4),
                          **{k: v for k, v in _common().items()
                             if k in ("model", "numeric_columns",
                                      "collections")})
    out4 = p4.predict(b)
    assert out4.shape == (24,)
    np.testing.assert_allclose(out1, out4, atol=1e-5)


def test_sharded_predictor_refresh_incremental(trained_ckpt, tmp_path):
    ckpt, tr, st, mgr = trained_ckpt
    p4 = ShardedPredictor(ckpt_dir=ckpt, mesh=make_mesh(4),
                          **{k: v for k, v in _common().items()
                             if k in ("model", "numeric_columns",
                                      "collections")})
    rng = np.random.default_rng(9)
    b = _batch(rng, bs=16, vocab=300)  # mostly unseen ids
    before = p4.predict(b)
    # train further on these ids, save an incremental, refresh
    for _ in range(5):
        st = tr.train_step(st, b)
    mgr.save_incremental(tr, st)
    assert p4.refresh()
    after = p4.predict(b)
    assert not np.allclose(before, after)
    # and parity with a fresh single-device predictor over the same saves
    p1 = Predictor(ckpt_dir=ckpt, **{k: v for k, v in _common().items()
                                     if k in ("model", "numeric_columns",
                                              "collections")})
    np.testing.assert_allclose(p1.predict(b), after, atol=1e-5)
