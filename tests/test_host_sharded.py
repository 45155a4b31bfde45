"""Host-sharded engine (parallel/host_sharded.py): the host resolves the
whole mesh exchange; semantics must match both the single-device
host-index trainer and the device-index sharded engine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
from deeprec_tpu.host_index import HostIndexEmbeddingCollection
from deeprec_tpu.parallel.host_sharded import HostShardedCollection
from deeprec_tpu.parallel.trainer import ShardedTrainer, make_mesh
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.train import metrics as metrics_lib
from deeprec_tpu.train.trainer import Trainer
from deeprec_tpu.utils.native import get_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the 4+ virtual-device CPU mesh")


def _build(kind, dim=8, cap=1 << 13, batch=128, mesh_n=4, **coll_kw):
    numeric = [fc.NumericColumn(n, log_normalize=True) for n in DENSE_NAMES]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), dim)
            for n in CAT_NAMES]
    cls = {"host": HostIndexEmbeddingCollection,
           "hs": HostShardedCollection,
           "dev": fc.EmbeddingCollection}[kind]
    coll = cls(cols, name="emb", capacity=cap,
               initializer=dr.Initializer(kind="normal", scale=0.05),
               max_unique=26 * batch, fused_slot_columns=dim,
               fused_slot_init=0.1, **coll_kw)
    model = ctr.DLRM(emb_names=[c.name for c in cols], emb_dim=dim,
                     bottom_units=(32,), top_units=(64, 32))
    kw = dict(model=model, numeric_columns=numeric, collections={"emb": coll},
              sparse_optimizers={"emb": sopt.sparse_adagrad_fused(0.05)},
              dense_optimizer=optax.adagrad(0.05))
    if kind == "hs" or (kind == "dev" and mesh_n):
        tr = ShardedTrainer(mesh=make_mesh(mesh_n), **kw)
    else:
        tr = Trainer(**kw)
    return tr, coll


def _table_dict(coll, bundle, S, step):
    a = coll.ckpt_arrays(bundle, S, None, False, step)
    return (dict(zip(a["keys"].tolist(), np.asarray(a["values"]))),
            dict(zip(a["keys"].tolist(), a["freqs"].tolist())))


def test_host_sharded_matches_single_device_host():
    gen = SyntheticCriteo(batch_size=128, seed=13)
    batches = list(gen.take(6))
    tr_s, c_s = _build("hs", mesh_n=4)
    tr_1, c_1 = _build("host", mesh_n=0)
    ss = tr_s.init(jax.random.key(0), batches[0])
    s1 = tr_1.init(jax.random.key(0), batches[0])
    for b in batches:
        ss = tr_s.train_step(ss, b)
        s1 = tr_1.train_step(s1, b)
    assert float(ss.metrics.loss_sum) == pytest.approx(
        float(s1.metrics.loss_sum), rel=1e-5)
    vs, fs = _table_dict(c_s, ss.tables["emb"], 4, int(jnp.max(ss.step)))
    v1, f1 = _table_dict(c_1, s1.tables["emb"], 1, int(s1.step))
    assert vs.keys() == v1.keys()
    assert fs == f1
    worst = max(float(np.abs(vs[k] - v1[k]).max()) for k in vs)
    assert worst < 1e-5, worst

    # eval parity on unseen keys
    md, mh = metrics_lib.create(), metrics_lib.create()
    from deeprec_tpu.parallel.multihost import host_to_global
    from jax.sharding import PartitionSpec as P
    md = jax.device_put(md)  # sharded eval psums into a replicated mstate
    for b in SyntheticCriteo(batch_size=128, seed=99).take(2):
        md = tr_s.eval_step(ss, md, b)
        mh = tr_1.eval_step(s1, mh, b)
    assert metrics_lib.auc(md) == pytest.approx(metrics_lib.auc(mh),
                                                abs=1e-6)


def test_host_sharded_matches_device_sharded_metadata():
    """Heavy layout (counter filter + evict): owner-side freq/version and
    admission agree with the device-index sharded engine per key."""
    kw = dict(counter_filter=dr.CounterFilter(filter_freq=2),
              evict=dr.GlobalStepEvict(steps_to_live=1 << 30))
    gen = SyntheticCriteo(batch_size=128, seed=17)
    batches = list(gen.take(5))
    tr_h, c_h = _build("hs", mesh_n=4, **kw)
    tr_d, c_d = _build("dev", mesh_n=4, **kw)
    sh = tr_h.init(jax.random.key(0), batches[0])
    sd = tr_d.init(jax.random.key(0), batches[0])
    for b in batches:
        sh = tr_h.train_step(sh, b)
        sd = tr_d.train_step(sd, b)
    assert float(sh.metrics.loss_sum) == pytest.approx(
        float(sd.metrics.loss_sum), rel=1e-5)
    vh, fh = _table_dict(c_h, sh.tables["emb"], 4, int(jnp.max(sh.step)))
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    a = table_snapshot_host(c_d.config, sd.tables["emb"].ev,
                            sd.tables["emb"].slot, num_shards=4)
    vd = dict(zip(a["keys"].tolist(), np.asarray(a["values"])))
    fd = dict(zip(a["keys"].tolist(), a["freqs"].tolist()))
    assert vh.keys() == vd.keys()
    assert fh == fd
    worst = max(float(np.abs(vh[k] - vd[k]).max()) for k in vh)
    assert worst < 1e-5, worst


def test_host_sharded_reshard_checkpoint(tmp_path):
    """Save on 4 shards, restore on 2 — and into the device engine."""
    from deeprec_tpu.checkpoint.saver import CheckpointManager
    kw = dict(evict=dr.GlobalStepEvict(steps_to_live=1 << 30))
    gen = SyntheticCriteo(batch_size=128, seed=23)
    batches = list(gen.take(6))
    tr4, c4 = _build("hs", mesh_n=4, **kw)
    s4 = tr4.init(jax.random.key(0), batches[0])
    mgr = CheckpointManager(str(tmp_path))
    for b in batches[:4]:
        s4 = tr4.train_step(s4, b)
    mgr.save(tr4, s4, evict=False)
    for b in batches[4:]:
        s4 = tr4.train_step(s4, b)
    mgr.save_incremental(tr4, s4)
    v4, f4 = _table_dict(c4, s4.tables["emb"], 4, int(jnp.max(s4.step)))

    tr2, c2 = _build("hs", mesh_n=2, **kw)
    s2 = tr2.init(jax.random.key(1), batches[0])
    s2, ok = CheckpointManager(str(tmp_path)).restore(tr2, s2)
    assert ok
    v2, f2 = _table_dict(c2, s2.tables["emb"], 2, int(jnp.max(s2.step)))
    assert v4.keys() == v2.keys() and f4 == f2
    for k in v4:
        np.testing.assert_array_equal(v4[k], v2[k])

    # host-sharded save -> DEVICE sharded engine
    trd, cd = _build("dev", mesh_n=2, **kw)
    sd = trd.init(jax.random.key(2), batches[0])
    sd, ok = CheckpointManager(str(tmp_path)).restore(trd, sd)
    assert ok
    from deeprec_tpu.checkpoint.saver import table_snapshot_host
    a = table_snapshot_host(cd.config, sd.tables["emb"].ev,
                            sd.tables["emb"].slot, num_shards=2)
    vd = dict(zip(a["keys"].tolist(), np.asarray(a["values"])))
    assert vd.keys() == v4.keys()
    for k in v4:
        np.testing.assert_array_equal(v4[k], vd[k])


def test_host_sharded_growth():
    gen = SyntheticCriteo(batch_size=128, seed=29)
    batches = list(gen.take(8))
    tr, coll = _build("hs", cap=1 << 7, mesh_n=4)
    st = tr.init(jax.random.key(0), batches[0])
    grew = False
    for b in batches:
        st = tr.train_step(st, b)
        before = coll.config.capacity
        st = tr.maybe_grow(st)
        grew |= coll.config.capacity > before
    assert grew
    h = tr.table_health(st)["emb"]
    assert h["shards"] == 4
    assert h["size"] > 0
    # training continues after growth with finite loss
    st = tr.train_step(st, batches[0])
    assert np.isfinite(float(st.metrics.loss_sum))


def test_host_sharded_multiprocess_refused():
    coll = HostShardedCollection(
        [fc.EmbeddingColumn(fc.CategoricalColumn("a"), 4)], capacity=64)
    # single process here, so _ensure_shards(2) succeeds; the refusal
    # branch is its process_count()!=1 check — assert it is wired
    import inspect
    src = inspect.getsource(coll._ensure_shards)
    assert "process_count" in src
    coll._ensure_shards(2)
    with pytest.raises(ValueError):
        coll._ensure_shards(4)  # mesh size change
