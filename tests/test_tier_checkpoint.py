"""Host-tier checkpointing: demoted rows are training state and must
survive a kill-and-restore with exact values, optimizer slots, and
bit-exact integer metadata (reference embedding_var.h:221 GetSnapshot
spans storage tiers)."""
import numpy as np
import optax
import pytest

import jax

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.checkpoint import CheckpointManager
from deeprec_tpu.config import StorageOption, StorageType
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.parallel.tiered import TieredShardedTrainer
from deeprec_tpu.parallel.trainer import make_mesh
from deeprec_tpu.train.tiered_trainer import TieredTrainer

CATS = ["C1", "C2"]


def _common(steps_to_live=3, capacity=256):
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=capacity,
        initializer=dr.Initializer("normal", scale=0.1),
        evict=dr.GlobalStepEvict(steps_to_live=steps_to_live),
        storage=StorageOption(storage_type=StorageType.HBM_DRAM))
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    return dict(model=model, numeric_columns=[fc.NumericColumn("I1")],
                collections={"emb": coll},
                sparse_optimizers={"emb": sopt.sparse_adagrad_decay(0.1)},
                dense_optimizer=optax.adagrad(0.05))


def _batch(rng, ids, bs=16):
    b = {"I1": rng.normal(size=bs).astype(np.float32),
         "label": rng.integers(0, 2, bs).astype(np.float32)}
    for n in CATS:
        b[n] = np.resize(np.asarray(ids, np.int64), bs)
    return b


def _train_and_demote(tr, hot, cold):
    """Train on cold ids, then hot-only until cold rows age out; demote."""
    rng = np.random.default_rng(0)
    st = tr.init(jax.random.key(0), _batch(rng, cold))
    st = tr.train_step(st, _batch(rng, cold))
    for _ in range(5):
        st = tr.train_step(st, _batch(rng, hot))
    st = tr.maybe_demote(st)
    return st


def test_tier_rows_survive_kill_and_restore(tmp_path):
    hot = np.arange(100, 108)
    cold = np.arange(1, 9)
    tr = TieredTrainer(**_common())
    st = _train_and_demote(tr, hot, cold)
    n_tier = tr.host_tier_rows("emb")
    assert n_tier >= len(cold)
    keys0, rows0 = tr.tiers["emb"].export()
    o = np.argsort(keys0)
    keys0, rows0 = keys0[o], rows0[o]

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, st, evict=False)

    # "kill": a brand-new trainer + state; restore must refill the tier
    tr2 = TieredTrainer(**_common())
    st2 = tr2.init(jax.random.key(1),
                   _batch(np.random.default_rng(9), hot))
    st2, ok = mgr.restore(tr2, st2)
    assert ok
    assert tr2.host_tier_rows("emb") == n_tier
    keys1, rows1 = tr2.tiers["emb"].export()
    o = np.argsort(keys1)
    np.testing.assert_array_equal(keys0, keys1[o])
    # exact payload: values, bit-pattern int meta, slot rows
    np.testing.assert_array_equal(rows0, rows1[o])

    # touching a demoted id promotes the exact saved row back to HBM
    rngp = np.random.default_rng(2)
    st2 = tr2.train_step(st2, _batch(rngp, cold[:2]))
    assert tr2.host_tier_rows("emb") < n_tier


def test_tier_rows_in_incremental_saves(tmp_path):
    hot = np.arange(100, 108)
    cold = np.arange(1, 9)
    tr = TieredTrainer(**_common())
    rng = np.random.default_rng(0)
    st = tr.init(jax.random.key(0), _batch(rng, cold))
    st = tr.train_step(st, _batch(rng, cold))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, st, evict=False)  # base full BEFORE any demotion
    for _ in range(5):
        st = tr.train_step(st, _batch(rng, hot))
    st = tr.maybe_demote(st)
    assert tr.host_tier_rows("emb") >= len(cold)
    mgr.save_incremental(tr, st)

    tr2 = TieredTrainer(**_common())
    st2 = tr2.init(jax.random.key(1), _batch(np.random.default_rng(9), hot))
    st2, ok = mgr.restore(tr2, st2)
    assert ok
    # cold rows were on-device in the base full; restore puts them either
    # on-device or in the tier, but their state must exist exactly once and
    # a lookup must see the trained values
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    snap = table_snapshot_host(tr2.collections["emb"].config,
                               st2.tables["emb"].ev, st2.tables["emb"].slot,
                               num_shards=1, evict=False)
    on_dev = set(snap["keys"].tolist())
    in_tier = set()
    if tr2.tiers["emb"] is not None:
        in_tier = set(tr2.tiers["emb"].export()[0].tolist())
    for k in cold.tolist():
        assert (k in on_dev) or (k in in_tier)
        assert not (k in on_dev and k in in_tier), "duplicated row state"


def test_sharded_tier_checkpoint_reshard(tmp_path):
    hot = np.arange(100, 116)
    cold = np.arange(1, 17)
    tr = TieredShardedTrainer(mesh=make_mesh(8), **_common())
    st = _train_and_demote(tr, hot, cold)
    n_tier = tr.host_tier_rows("emb")
    assert n_tier >= len(cold)
    keys0, rows0 = tr.tiers["emb"].export()
    o = np.argsort(keys0)
    keys0, rows0 = keys0[o], rows0[o]

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, st, evict=False)

    # restore into a DIFFERENT mesh size: tier rows re-route by owner
    tr2 = TieredShardedTrainer(mesh=make_mesh(4), **_common())
    st2 = tr2.init(jax.random.key(1), _batch(np.random.default_rng(9), hot))
    st2, ok = mgr.restore(tr2, st2)
    assert ok
    keys1, rows1 = tr2.tiers["emb"].export()
    o = np.argsort(keys1)
    np.testing.assert_array_equal(keys0, keys1[o])
    np.testing.assert_array_equal(rows0, rows1[o])
