"""TieredTrainer: HBM + host-DRAM multi-tier training end-to-end."""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu.config import StorageOption, StorageType
from deeprec_tpu import feature_column as fc
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.train.tiered_trainer import TieredTrainer
from deeprec_tpu.utils.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")

CATS = ["C1", "C2"]


def make_trainer(steps_to_live=4):
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=256,
        initializer=dr.Initializer("normal", scale=0.1),
        evict=dr.GlobalStepEvict(steps_to_live=steps_to_live),
        storage=StorageOption(storage_type=StorageType.HBM_DRAM))
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    return TieredTrainer(
        model=model, numeric_columns=[fc.NumericColumn("I1")],
        collections={"emb": coll},
        sparse_optimizers={"emb": sopt.sparse_adagrad(0.1)},
        dense_optimizer=optax.adagrad(0.05))


def batch_with(ids, bs=8):
    rng = np.random.default_rng(0)
    b = {"label": rng.integers(0, 2, bs).astype(np.float32),
         "I1": rng.normal(size=bs).astype(np.float32)}
    for n in CATS:
        b[n] = np.resize(np.asarray(ids, np.int64), bs)
    return b


def snapshot_rows(tr, state, ids):
    """value rows + adagrad acc rows for given raw ids of column C1."""
    from deeprec_tpu.sparse import hashtable as ht, keys as K
    coll = tr.collections["emb"]
    flat = coll.pack_ids_np(batch_with(ids, bs=len(ids)))[0]  # C1 row
    keys = K.from_numpy(flat)
    slots, found = ht.lookup(state.tables["emb"].ev.index, keys)
    vals = np.asarray(state.tables["emb"].ev.values)[np.asarray(slots)]
    acc = np.asarray(state.tables["emb"].slot["acc"])[np.asarray(slots)]
    return np.asarray(found), vals, acc


def test_demote_then_promote_roundtrip_with_optimizer_state():
    tr = make_trainer(steps_to_live=3)
    cold_ids, hot_ids = [11, 12], [77, 78]
    state = tr.init(jax.random.key(0), batch_with(cold_ids))

    # steps 0-1 touch cold ids; then hot-only steps age them out
    for _ in range(2):
        state = tr.train_step(state, batch_with(cold_ids))
    found, vals_before, acc_before = snapshot_rows(tr, state, cold_ids)
    assert found.all()
    for _ in range(4):
        state = tr.train_step(state, batch_with(hot_ids))

    state = tr.maybe_demote(state)
    assert tr.host_tier_rows("emb") > 0
    found, _, _ = snapshot_rows(tr, state, cold_ids)
    assert not found.any()              # gone from HBM

    # cold ids recur -> promoted back before the step, training state intact
    state2 = tr._promote_for_batch(state, batch_with(cold_ids))
    found, vals_after, acc_after = snapshot_rows(tr, state2, cold_ids)
    assert found.all()
    np.testing.assert_allclose(vals_after, vals_before, atol=1e-6)
    np.testing.assert_allclose(acc_after, acc_before, atol=1e-4)
    assert tr.host_tier_rows("emb") == 0

    # and a full train step through the tier path works
    step_before = int(state2.step)
    state3 = tr.train_step(state2, batch_with(cold_ids))
    assert int(state3.step) == step_before + 1


def test_training_consistency_with_and_without_tier():
    """Tiering must not change results while nothing is demoted."""
    tr = make_trainer()
    bs = [batch_with([1, 2, 3]), batch_with([2, 3, 4])]
    s1 = tr.init(jax.random.key(0), bs[0])
    for b in bs:
        s1 = tr.train_step(s1, b)
    from deeprec_tpu.train.trainer import Trainer
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=256,
        initializer=dr.Initializer("normal", scale=0.1))
    plain = Trainer(
        model=tr.model, numeric_columns=[fc.NumericColumn("I1")],
        collections={"emb": coll},
        sparse_optimizers={"emb": sopt.sparse_adagrad(0.1)},
        dense_optimizer=optax.adagrad(0.05))
    s2 = plain.init(jax.random.key(0), bs[0])
    for b in bs:
        s2 = plain.train_step(s2, b)
    _, v1, _ = snapshot_rows(tr, s1, [1, 2, 3, 4])
    _, v2, _ = snapshot_rows(plain, s2, [1, 2, 3, 4])
    np.testing.assert_allclose(v1, v2, atol=1e-6)


def test_budget_pressure_demotion_without_evict_policy():
    """``StorageOption.hbm_capacity`` caps resident rows with NO eviction
    policy configured: maybe_demote moves the least-recently-touched rows
    (LRU by version, freq tiebreak) to the host tier — the reference's
    BatchCache pressure demotion over multi-tier ValuePtrs
    (embedding/cache.h) — and they come back intact on recurrence."""
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=256,
        initializer=dr.Initializer("normal", scale=0.1),
        storage=StorageOption(storage_type=StorageType.HBM_DRAM,
                              hbm_capacity=8))
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    tr = TieredTrainer(
        model=model, numeric_columns=[fc.NumericColumn("I1")],
        collections={"emb": coll},
        sparse_optimizers={"emb": sopt.sparse_adagrad(0.1)},
        dense_optimizer=optax.adagrad(0.05))
    old_ids, new_ids = [1, 2, 3, 4], [5, 6, 7, 8]
    state = tr.init(jax.random.key(0), batch_with(old_ids))
    state = tr.train_step(state, batch_with(old_ids))   # 8 rows (2 cols x 4)
    found, vals_before, acc_before = snapshot_rows(tr, state, old_ids)
    assert found.all()
    state = tr.train_step(state, batch_with(new_ids))   # 16 resident > 8
    state = tr.maybe_demote(state)
    # the oldest-touched rows left HBM; the freshly-touched ones stayed
    found_old, _, _ = snapshot_rows(tr, state, old_ids)
    found_new, _, _ = snapshot_rows(tr, state, new_ids)
    assert not found_old.any()
    assert found_new.all()
    assert tr.host_tier_rows("emb") == 8
    # recurrence promotes back with values AND optimizer state intact
    state = tr._promote_for_batch(state, batch_with(old_ids))
    found, vals_after, acc_after = snapshot_rows(tr, state, old_ids)
    assert found.all()
    np.testing.assert_allclose(vals_after, vals_before, atol=1e-6)
    np.testing.assert_allclose(acc_after, acc_before, atol=1e-4)


def test_tiered_storage_implies_version_tracking():
    """Demotion ranks coldness by the version plane and tier restore
    reconciles by version — a tiered table with NO eviction policy must
    still stamp versions (the light layout would rank garbage)."""
    import deeprec_tpu as dr
    from deeprec_tpu import feature_column as fc
    from deeprec_tpu.config import StorageOption, StorageType

    col = fc.EmbeddingColumn(fc.CategoricalColumn("c"), 4)
    coll = fc.EmbeddingCollection(
        [col], name="e", capacity=64,
        storage=StorageOption(StorageType.HBM_DRAM))
    assert coll.config.version_tracked
    # plain HBM table without evict/filter stays light
    coll2 = fc.EmbeddingCollection([col], name="e2", capacity=64)
    assert not coll2.config.version_tracked
