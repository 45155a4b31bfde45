"""Checkpoint tests: full save/restore roundtrip, incremental replay,
mod-reshard restore, eviction at save — mirroring the reference suites
python/training/incr_ckpt_test.py and the save/restore cases of
python/ops/embedding_variable_ops_test.py."""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.checkpoint import CheckpointManager
from deeprec_tpu.data.criteo import SyntheticCriteo, CAT_NAMES, DENSE_NAMES
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.train.trainer import Trainer
from deeprec_tpu.parallel.trainer import ShardedTrainer, make_mesh


N_CAT = 4
N_DENSE = 3


def make_trainer(capacity=1 << 10, sharded=False, n_devices=4, **ev_kwargs):
    numeric = [fc.NumericColumn(n, log_normalize=True)
               for n in DENSE_NAMES[:N_DENSE]]
    emb_cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8)
                for n in CAT_NAMES[:N_CAT]]
    # version-delta incrementals on tables without an evict policy need the
    # explicit version-stamp opt-in (light-layout default skips the writes)
    ev_kwargs.setdefault("track_version", True)
    coll = fc.EmbeddingCollection(
        emb_cols, name="emb", capacity=capacity,
        initializer=dr.Initializer(kind="normal", scale=0.05), **ev_kwargs)
    model = ctr.DCN(emb_names=[c.name for c in emb_cols],
                    cross_layers=2, deep_units=(32, 16))
    kw = dict(model=model, numeric_columns=numeric,
              collections={"emb": coll},
              sparse_optimizers={"emb": sopt.sparse_adagrad(0.05)},
              dense_optimizer=optax.adagrad(0.05))
    if sharded:
        return ShardedTrainer(mesh=make_mesh(n_devices), **kw)
    return Trainer(**kw)


def batches(n, bs=64, seed=0):
    gen = SyntheticCriteo(batch_size=bs, seed=seed,
                          vocab_sizes=[50, 100, 200, 400] + [10] * 22)
    return list(gen.take(n))


def snapshot_dict(trainer, state, name="emb"):
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    S = getattr(trainer, "S", 1)
    coll = trainer.collections[name]
    t = state.tables[name]
    snap = table_snapshot_host(coll.config, t.ev, t.slot, num_shards=S,
                               evict=False)
    order = np.argsort(snap["keys"])
    return {k: v[order] for k, v in snap.items()
            if hasattr(v, "ndim") and v.ndim >= 1 and
            v.shape[:1] == snap["keys"].shape}


def assert_same_rows(trainer_a, sa, trainer_b, sb, check_meta=True):
    da, db = snapshot_dict(trainer_a, sa), snapshot_dict(trainer_b, sb)
    np.testing.assert_array_equal(da["keys"], db["keys"])
    np.testing.assert_allclose(da["values"], db["values"], atol=1e-6)
    if check_meta:
        np.testing.assert_array_equal(da["versions"], db["versions"])
        np.testing.assert_array_equal(da["freqs"], db["freqs"])
    for k in da:
        if k.startswith("slot__"):
            np.testing.assert_allclose(da[k], db[k], atol=1e-6)


def test_full_roundtrip(tmp_path):
    tr = make_trainer()
    bs = batches(6)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs[:4]:
        state = tr.train_step(state, b)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, state)

    tr2 = make_trainer()
    st2 = tr2.init(jax.random.key(1), bs[0])
    st2, ok = CheckpointManager(str(tmp_path)).restore(tr2, st2)
    assert ok
    assert int(st2.step) == int(state.step)
    assert_same_rows(tr, state, tr2, st2)
    # dense params identical
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # training continues identically
    nxt_a = tr.train_step(state, bs[4])
    nxt_b = tr2.train_step(st2, bs[4])
    assert_same_rows(tr, nxt_a, tr2, nxt_b)


def test_incremental_replay(tmp_path):
    tr = make_trainer()
    bs = batches(10)
    state = tr.init(jax.random.key(0), bs[0])
    mgr = CheckpointManager(str(tmp_path))
    for b in bs[:3]:
        state = tr.train_step(state, b)
    mgr.save(tr, state)
    for b in bs[3:6]:
        state = tr.train_step(state, b)
    p1 = mgr.save_incremental(tr, state)
    for b in bs[6:9]:
        state = tr.train_step(state, b)
    p2 = mgr.save_incremental(tr, state)
    assert "incr-" in p1 and "incr-" in p2

    tr2 = make_trainer()
    st2 = tr2.init(jax.random.key(1), bs[0])
    st2, ok = CheckpointManager(str(tmp_path)).restore(tr2, st2)
    assert ok
    assert int(st2.step) == int(state.step)
    assert_same_rows(tr, state, tr2, st2)


def test_incremental_is_delta(tmp_path):
    """Incremental saves contain only rows touched since the last save."""
    tr = make_trainer()
    bs = batches(4, bs=32)
    state = tr.init(jax.random.key(0), bs[0])
    mgr = CheckpointManager(str(tmp_path))
    for b in bs[:2]:
        state = tr.train_step(state, b)
    mgr.save(tr, state)
    state = tr.train_step(state, bs[2])
    mgr.save_incremental(tr, state)
    from deeprec_tpu.checkpoint import list_saves
    from deeprec_tpu.checkpoint.format import read_table
    saves = list_saves(str(tmp_path))
    incr = [m for m in saves if m["kind"] == "incr"][0]
    full = [m for m in saves if m["kind"] == "full"][0]
    ti = read_table(incr["path"], "emb")
    tf_ = read_table(full["path"], "emb")
    assert 0 < ti["keys"].shape[0] < tf_["keys"].shape[0] * 1.2
    # delta rows are exactly those with version >= full step
    assert (ti["versions"] >= full["step"]).all()


@pytest.mark.parametrize("s_from,s_to", [(1, 4), (4, 2), (4, 1)])
def test_reshard_restore(tmp_path, s_from, s_to):
    """Shard count may change between save and restore (mod-reshard,
    reference embedding_var.h:196-199)."""
    tr = make_trainer(sharded=s_from > 1, n_devices=s_from, capacity=1 << 10)
    bs = batches(4, bs=64)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs[:3]:
        state = tr.train_step(state, b)
    CheckpointManager(str(tmp_path)).save(tr, state)

    tr2 = make_trainer(sharded=s_to > 1, n_devices=s_to, capacity=1 << 10)
    st2 = tr2.init(jax.random.key(1), bs[0])
    st2, ok = CheckpointManager(str(tmp_path)).restore(tr2, st2)
    assert ok
    assert_same_rows(tr, state, tr2, st2)
    # restored trainer can take a step
    st2 = tr2.train_step(st2, bs[3])
    assert int(st2.step) == int(state.step) + 1


def test_capacity_autogrow_on_restore(tmp_path):
    tr = make_trainer(capacity=1 << 12)
    bs = batches(8, bs=256)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs:
        state = tr.train_step(state, b)
    CheckpointManager(str(tmp_path)).save(tr, state)

    tr2 = make_trainer(capacity=64)  # too small: must grow at restore
    st2 = tr2.init(jax.random.key(1), bs[0])
    st2, ok = CheckpointManager(str(tmp_path)).restore(tr2, st2)
    assert ok
    assert tr2.collections["emb"].config.capacity > 64
    assert_same_rows(tr, state, tr2, st2)


def test_evict_at_save(tmp_path):
    """GlobalStepEvict filters stale rows out of the saved checkpoint
    (Shrink-at-save, embedding_var.h:289-313)."""
    tr = make_trainer(evict=dr.GlobalStepEvict(steps_to_live=2))
    bs = batches(8, bs=32, seed=3)
    state = tr.init(jax.random.key(0), bs[0])
    for b in bs:
        state = tr.train_step(state, b)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, state, evict=True)
    from deeprec_tpu.checkpoint.format import read_table
    from deeprec_tpu.checkpoint import list_saves
    full = list_saves(str(tmp_path))[-1]
    t = read_table(full["path"], "emb")
    # every saved row was touched within steps_to_live of the save step
    assert (full["step"] - t["versions"] < 2).all()
    # a no-evict save keeps strictly more rows (stale ones exist)
    noevict_dir = str(tmp_path / "noevict")
    CheckpointManager(noevict_dir).save(tr, state, evict=False)
    t2 = read_table(list_saves(noevict_dir)[-1]["path"], "emb")
    assert t2["keys"].shape[0] > t["keys"].shape[0]


def test_maybe_save_policy(tmp_path):
    tr = make_trainer()
    bs = batches(3)
    state = tr.init(jax.random.key(0), bs[0])
    state = tr.train_step(state, bs[0])
    mgr = CheckpointManager(str(tmp_path), full_secs=1e9, incr_secs=0.0)
    # incr before any full falls back to a full save
    p = mgr.maybe_save(tr, state)
    assert p and "full-" in p
    state = tr.train_step(state, bs[1])
    mgr._last_incr_time = 0.0
    p = mgr.maybe_save(tr, state)
    assert p and "incr-" in p
