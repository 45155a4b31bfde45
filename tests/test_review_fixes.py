"""Regression tests for the round-2 self-review findings: version-aware
tier restore, padding-proof saturation detection, tier-aware serving."""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.checkpoint import CheckpointManager
from deeprec_tpu.config import StorageOption, StorageType
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.train.tiered_trainer import TieredTrainer
from deeprec_tpu.train.trainer import Trainer

CATS = ["C1"]


def _common(steps_to_live=3):
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=256,
        initializer=dr.Initializer("normal", scale=0.1),
        evict=dr.GlobalStepEvict(steps_to_live=steps_to_live),
        storage=StorageOption(storage_type=StorageType.HBM_DRAM))
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    return dict(model=model, numeric_columns=[fc.NumericColumn("I1")],
                collections={"emb": coll},
                sparse_optimizers={"emb": sopt.sparse_adagrad(0.3)},
                dense_optimizer=optax.adagrad(0.05))


def _batch(rng, ids, bs=16):
    b = {"I1": rng.normal(size=bs).astype(np.float32),
         "label": rng.integers(0, 2, bs).astype(np.float32)}
    for n in CATS:
        b[n] = np.resize(np.asarray(ids, np.int64), bs)
    return b


def _row_of(tr, state, key):
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    snap = table_snapshot_host(tr.collections["emb"].config,
                               state.tables["emb"].ev,
                               state.tables["emb"].slot, evict=False)
    i = np.nonzero(snap["keys"] == key)[0]
    return snap["values"][i[0]] if len(i) else None


def test_restore_prefers_newer_tier_row_over_stale_device_copy(tmp_path):
    """Key trained AFTER the base full save, then demoted: only the
    incremental's tier export has its final state. Restore must import the
    tier row (newer version) instead of keeping the base's stale device
    copy untouched and dropping the tier copy."""
    tr = TieredTrainer(**_common())
    rng = np.random.default_rng(0)
    cold = np.arange(1, 9)
    hot = np.arange(100, 108)
    st = tr.init(jax.random.key(0), _batch(rng, cold))
    st = tr.train_step(st, _batch(rng, cold))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, st, evict=False)        # base: cold rows on-device (stale)

    st = tr.train_step(st, _batch(rng, cold))  # cold rows trained AFTER base
    final_row = None
    for _ in range(5):                    # age them out with hot-only steps
        st = tr.train_step(st, _batch(rng, hot))
    # capture the final trained value of key 1 BEFORE demotion
    final_row = _row_of(tr, st, 1).copy()
    st = tr.maybe_demote(st)
    assert tr.host_tier_rows("emb") >= len(cold)
    mgr.save_incremental(tr, st)

    tr2 = TieredTrainer(**_common())
    st2 = tr2.init(jax.random.key(1), _batch(np.random.default_rng(9), hot))
    st2, ok = mgr.restore(tr2, st2)
    assert ok
    # the newer tier copy was imported (not masked out by the stale
    # device presence in the base full)
    keys_t, rows_t = tr2.tiers["emb"].export()
    assert 1 in keys_t.tolist()
    dim = tr2.collections["emb"].config.embedding_dim
    i = np.nonzero(keys_t == 1)[0][0]
    np.testing.assert_allclose(rows_t[i, :dim], final_row, atol=1e-6)
    # touching the key promotes the NEWER row into HBM
    st2 = tr2.train_step(st2, _batch(np.random.default_rng(2), hot))
    pre = tr2.host_tier_rows("emb")
    st2, _ = tr2._promote_for_batch(st2, _batch(rng, [1])), None
    assert _row_of(tr2, st2, 1) is not None


def test_saturation_detected_with_padding(tmp_path):
    """EMPTY (-1) padding occupies capped unique slots; the watchdog must
    still fire when real keys overflow the dedup cap."""
    import dataclasses
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn("C1", max_length=4), 8)]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=1024,
        initializer=dr.Initializer("normal", scale=0.1))
    coll.config = dataclasses.replace(coll.config, max_unique=8)
    model = ctr.DCN(emb_names=["C1"], cross_layers=1, deep_units=(8,))
    tr = Trainer(model, [fc.NumericColumn("I1")], {"emb": coll},
                 {"emb": sopt.sparse_adagrad(0.1)}, optax.adagrad(0.05))
    rng = np.random.default_rng(0)
    b = {"I1": rng.normal(size=16).astype(np.float32),
         "label": rng.integers(0, 2, 16).astype(np.float32),
         # 16 distinct keys >> cap 8, HALF the lanes are -1 padding so
         # n_unique alone would never reach the cap
         "C1": np.where(rng.random((16, 4)) < 0.5,
                        rng.integers(1, 10_000, (16, 4)),
                        -1).astype(np.int64)}
    state = tr.init(jax.random.key(0), b)
    state = tr.train_step(state, b)
    h = tr.table_health(state)["emb"]
    assert h["unique_saturated_steps"] >= 1, h
    assert h["max_n_unique"] > 8, h  # true demand, not the capped count


def test_predictor_serves_demoted_rows(tmp_path):
    """A Predictor over a tiered checkpoint must serve demoted keys with
    their trained embeddings, not default-init rows."""
    from deeprec_tpu.serving import Predictor

    tr = TieredTrainer(**_common())
    rng = np.random.default_rng(0)
    cold = np.arange(1, 9)
    hot = np.arange(100, 108)
    st = tr.init(jax.random.key(0), _batch(rng, cold))
    for _ in range(3):
        st = tr.train_step(st, _batch(rng, cold))
    for _ in range(5):
        st = tr.train_step(st, _batch(rng, hot))
    st = tr.maybe_demote(st)
    assert tr.host_tier_rows("emb") >= len(cold)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, st, evict=False)

    kw = {k: v for k, v in _common().items()
          if k in ("model", "numeric_columns", "collections")}
    p = Predictor(ckpt_dir=str(tmp_path), **kw)
    b_cold = _batch(rng, cold)
    b_fresh = dict(b_cold)  # SAME dense features, unknown keys
    b_fresh["C1"] = np.resize(np.arange(9000, 9008, dtype=np.int64), 16)
    out_cold = p.predict(b_cold)
    out_fresh = p.predict(b_fresh)
    # demoted keys produce DIFFERENT predictions than unknown keys with
    # identical dense features: their trained rows were served from the
    # checkpoint's tier export, not the default init
    assert not np.allclose(out_cold, out_fresh, atol=1e-4)
