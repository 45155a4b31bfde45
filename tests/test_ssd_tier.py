"""SSD storage tier: DRAM -> disk cascade under a DRAM row budget
(reference embedding/config.proto StorageType{DRAM,PMEM,SSD})."""
import os

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
from deeprec_tpu.train.tiered_trainer import TieredTrainer
from deeprec_tpu.utils.native import HostKV, TierStack, get_lib

CATS = ["C1"]


def test_disk_kv_roundtrip(tmp_path):
    kv = HostKV(4, 64, path=str(tmp_path / "arena.bin"))
    keys = np.arange(1, 2000, dtype=np.int64)
    rows = np.arange(len(keys) * 4, dtype=np.float32).reshape(-1, 4)
    kv.upsert(keys, rows)
    assert len(kv) == len(keys)
    got, found = kv.lookup(keys[::7])
    assert found.all()
    np.testing.assert_array_equal(got, rows[::7])
    if get_lib() is not None:
        # rows actually live in the mmap'd file
        assert os.path.getsize(tmp_path / "arena.bin") > 0
    kv.erase(keys[:500])
    assert len(kv) == len(keys) - 500
    _, found = kv.lookup(keys[:500])
    assert not found.any()


def test_tier_stack_spills_coldest(tmp_path):
    width, vcol = 6, 3  # payload [v0 v1 v2 | freq version create]
    ts = TierStack(width, vcol, dram_row_budget=64,
                   ssd_path=str(tmp_path / "ssd.bin"))
    keys = np.arange(1, 201, dtype=np.int64)
    rows = np.zeros((200, width), np.float32)
    rows[:, 0] = keys  # payload identity
    rows[:, vcol] = np.arange(200, dtype=np.int32).view(np.float32)  # version
    ts.upsert(keys, rows)
    assert len(ts) == 200
    assert len(ts.dram) <= 64
    assert len(ts.ssd) >= 136
    # the WARMEST rows (highest version) stayed in DRAM
    dk, drows = ts.dram.export()
    vers = drows[:, vcol].copy().view(np.int32)
    assert vers.min() >= 200 - 64
    # lookup falls through to the ssd store transparently
    got, found = ts.lookup(keys)
    assert found.all()
    np.testing.assert_array_equal(got[:, 0], rows[:, 0])
    # export spans both tiers (checkpoint contract)
    ek, er = ts.export()
    assert len(ek) == 200


def _common(tmp_path, budget=8):
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8) for n in CATS]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=128,
        initializer=dr.Initializer("normal", scale=0.1),
        evict=dr.GlobalStepEvict(steps_to_live=2),
        storage=StorageOption(storage_type=StorageType.HBM_DRAM_SSD,
                              dram_row_budget=budget,
                              ssd_path=str(tmp_path / "emb.arena")))
    model = ctr.DCN(emb_names=CATS, cross_layers=1, deep_units=(16,))
    return dict(model=model, numeric_columns=[fc.NumericColumn("I1")],
                collections={"emb": coll},
                sparse_optimizers={"emb": sopt.sparse_adagrad(0.1)},
                dense_optimizer=optax.adagrad(0.05))


def _batch(rng, ids, bs=16):
    b = {"I1": rng.normal(size=bs).astype(np.float32),
         "label": rng.integers(0, 2, bs).astype(np.float32)}
    for n in CATS:
        b[n] = np.resize(np.asarray(ids, np.int64), bs)
    return b


def test_training_spills_past_dram_budget_and_restores(tmp_path):
    """Train more cold rows than the DRAM budget: the overflow must land
    on disk, stay promotable, and survive a checkpoint round trip."""
    tr = TieredTrainer(**_common(tmp_path, budget=8))
    rng = np.random.default_rng(0)
    cold = np.arange(1, 41)  # 40 rows >> budget of 8
    st = tr.init(jax.random.key(0), _batch(rng, cold, bs=40))
    st = tr.train_step(st, _batch(rng, cold, bs=40))
    hot = np.arange(100, 108)
    for _ in range(4):
        st = tr.train_step(st, _batch(rng, hot))
    st = tr.maybe_demote(st)
    ts = tr.tiers["emb"]
    assert isinstance(ts, TierStack)
    assert len(ts) >= len(cold)
    assert len(ts.dram) <= 8
    assert len(ts.ssd) > 0

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(tr, st, evict=False)
    tr2 = TieredTrainer(**_common(tmp_path / "r2", budget=8))
    st2 = tr2.init(jax.random.key(1), _batch(np.random.default_rng(9), hot))
    st2, ok = mgr.restore(tr2, st2)
    assert ok
    assert len(tr2.tiers["emb"]) == len(ts)

    # touching spilled ids promotes them back to HBM from disk
    before = len(tr2.tiers["emb"])
    st2 = tr2.train_step(st2, _batch(rng, cold[:8]))
    assert len(tr2.tiers["emb"]) < before
