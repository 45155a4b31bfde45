"""TieredShardedTrainer: host-DRAM tier under the row-sharded trainer."""
import numpy as np
import optax
import pytest

import jax

import deeprec_tpu as dr
from deeprec_tpu.config import StorageOption, StorageType
from deeprec_tpu import feature_column as fc
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.parallel.tiered import TieredShardedTrainer
from deeprec_tpu.parallel.trainer import make_mesh
from deeprec_tpu.utils.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")

CATS = ["C1", "C2"]


def make_trainer(steps_to_live=3, n_dev=4):
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=256,
        initializer=dr.Initializer("normal", scale=0.1),
        evict=dr.GlobalStepEvict(steps_to_live=steps_to_live),
        storage=StorageOption(storage_type=StorageType.HBM_DRAM))
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    return TieredShardedTrainer(
        model=model, numeric_columns=[fc.NumericColumn("I1")],
        collections={"emb": coll},
        sparse_optimizers={"emb": sopt.sparse_adagrad(0.1)},
        dense_optimizer=optax.adagrad(0.05), mesh=make_mesh(n_dev))


def batch_with(ids, bs=16):
    rng = np.random.default_rng(0)
    b = {"label": rng.integers(0, 2, bs).astype(np.float32),
         "I1": rng.normal(size=bs).astype(np.float32)}
    for n in CATS:
        b[n] = np.resize(np.asarray(ids, np.int64), bs)
    return b


def global_rows(tr, state, ids):
    """values rows for C1-salted ids, searched across all shards."""
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    coll = tr.collections["emb"]
    snap = table_snapshot_host(coll.config, state.tables["emb"].ev,
                               state.tables["emb"].slot, num_shards=tr.S,
                               evict=False)
    want = coll.pack_ids_np(batch_with(ids, bs=len(ids)))[0]
    out, found = [], []
    for k in want:
        hit = np.nonzero(snap["keys"] == k)[0]
        found.append(len(hit) > 0)
        out.append(snap["values"][hit[0]] if len(hit) else None)
    return np.asarray(found), out


def test_sharded_budget_pressure_demotion():
    """``hbm_capacity`` (total across the mesh) splits into per-shard
    budgets; with NO eviction policy every shard demotes its LRU excess
    and the rows return intact when their ids recur."""
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=256,
        initializer=dr.Initializer("normal", scale=0.1),
        storage=StorageOption(storage_type=StorageType.HBM_DRAM,
                              hbm_capacity=8))
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    tr = TieredShardedTrainer(
        model=model, numeric_columns=[fc.NumericColumn("I1")],
        collections={"emb": coll},
        sparse_optimizers={"emb": sopt.sparse_adagrad(0.1)},
        dense_optimizer=optax.adagrad(0.05), mesh=make_mesh(4))
    ids1, ids2 = [1, 2, 3, 4], [5, 6, 7, 8]
    state = tr.init(jax.random.key(0), batch_with(ids1))
    state = tr.train_step(state, batch_with(ids1))
    state = tr.train_step(state, batch_with(ids2))
    found, rows_before = global_rows(tr, state, ids1 + ids2)
    assert found.all()
    state = tr.maybe_demote(state)
    assert tr.host_tier_rows("emb") > 0
    # per-shard enforcement bounds the global resident count by the budget
    snap = table_snapshot_host(coll.config, state.tables["emb"].ev,
                               state.tables["emb"].slot, num_shards=tr.S,
                               evict=False)
    assert len(snap["keys"]) <= 8
    # every id recurs; the demoted ones promote back bit-intact
    state = tr._promote_for_batch(state, batch_with(ids1 + ids2))
    found, rows_after = global_rows(tr, state, ids1 + ids2)
    assert found.all()
    for b, a in zip(rows_before, rows_after):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_sharded_demote_promote_roundtrip():
    tr = make_trainer()
    cold_ids, hot_ids = [11, 12, 13], [77, 78, 79]
    state = tr.init(jax.random.key(0), batch_with(cold_ids))
    for _ in range(2):
        state = tr.train_step(state, batch_with(cold_ids))
    found, rows_before = global_rows(tr, state, cold_ids)
    assert found.all()
    for _ in range(4):
        state = tr.train_step(state, batch_with(hot_ids))

    state = tr.maybe_demote(state)
    assert tr.host_tier_rows("emb") > 0
    found, _ = global_rows(tr, state, cold_ids)
    assert not found.any()          # demoted out of every shard

    # recurrence promotes back onto the owner shards with values EXACTLY
    # intact (check the promotion alone, before any training step)
    state = tr._promote_for_batch(state, batch_with(cold_ids))
    found, rows_after = global_rows(tr, state, cold_ids)
    assert found.all()
    assert tr.host_tier_rows("emb") == 0
    for b, a in zip(rows_before, rows_after):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # and the full train step through the tier path works
    step_before = int(state.step)
    state = tr.train_step(state, batch_with(cold_ids))
    assert int(state.step) == step_before + 1
