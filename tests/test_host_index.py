"""Host-index fast path: semantics must be IDENTICAL to the device-index
engine (reference parity: the CPU-hash-map index of
tensorflow/core/framework/embedding/dense_hash_map.h, rebuilt as a
pipelined C++ resolver — see deeprec_tpu/host_index.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.data.criteo import CAT_NAMES, DENSE_NAMES, SyntheticCriteo
from deeprec_tpu.host_index import HostEVState, HostIndexEmbeddingCollection
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.train import metrics as metrics_lib
from deeprec_tpu.train.trainer import Trainer
from deeprec_tpu.utils.native import HostIndexResolver, get_lib

NATIVE = get_lib() is not None


# ---------------------------------------------------------------------------
# Resolver unit level: the native C++ and the pure-python fallback are one
# semantics (n_groups=1 pins identical unique ORDER too).


@pytest.mark.skipif(not NATIVE, reason="native lib unavailable")
def test_resolver_native_matches_fallback_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(4):
        nat = HostIndexResolver(n_groups=1, use_native=True)
        fb = HostIndexResolver(use_native=False)
        cap = 40 if trial == 1 else 1000  # trial 1: row-capacity overflow
        for step in range(10):
            keys = rng.choice(np.arange(-1, 70, dtype=np.int64), size=256)
            ro = step % 3 == 2
            a = nat.resolve(keys, 48, 100, cap, readonly=ro)
            b = fb.resolve(keys, 48, 100, cap, readonly=ro)
            for x, y, what in zip(a, b, ["ukeys", "uslots", "inverse",
                                         "created", "counts", "nu", "nov"]):
                assert np.array_equal(x, y), (trial, step, what)
        assert nat.stats() == fb.stats()
        keep = rng.random(nat.size) > 0.4
        assert np.array_equal(nat.compact(keep), fb.compact(keep))
        assert np.array_equal(nat.export_keys(), fb.export_keys())


@pytest.mark.skipif(not NATIVE, reason="native lib unavailable")
def test_resolver_group_invariance():
    """Semantics (key sets, counts, slot bijection) do not depend on the
    group fan-out — only the unique lane ORDER does."""
    rng = np.random.default_rng(1)
    r16 = HostIndexResolver(n_groups=16, use_native=True)
    r1 = HostIndexResolver(n_groups=1, use_native=True)
    for _ in range(5):
        keys = rng.choice(np.arange(-1, 900, dtype=np.int64), size=2000)
        a = r16.resolve(keys, 1024, 9999, 10000)
        b = r1.resolve(keys, 1024, 9999, 10000)
        assert a[5] == b[5]  # n_unique
        ka = {int(k): int(c) for k, c in zip(a[0], a[4]) if k != -1}
        kb = {int(k): int(c) for k, c in zip(b[0], b[4]) if k != -1}
        assert ka == kb
    assert sorted(r16.export_keys().tolist()) == sorted(r1.export_keys().tolist())


def test_resolver_overflow_and_pending():
    """Row-capacity overflow = pending keys that materialize later; the
    unique-width overflow lane reads the null slot."""
    r = HostIndexResolver(use_native=False)
    keys = np.arange(100, dtype=np.int64)
    uk, us, inv, cr, ct, nu, nov = r.resolve(keys, 11, 999, 1000)
    assert nu == 10 and nov == 90
    assert (inv[10:] == 10).all() and us[10] == 999
    uk, us, inv, cr, ct, nu, nov = r.resolve(keys[:5], 11, 999, 1000)
    assert cr[:5].sum() == 0  # already materialized
    uk, us, inv, cr, ct, nu, nov = r.resolve(keys[20:25], 11, 999, 1000)
    assert cr[:5].sum() == 5  # previously-overflowed keys create NOW


# ---------------------------------------------------------------------------
# Trainer level: bit-equality with the device-index engine.


def _build(host, dim=8, cap=1 << 13, batch=128, meta=False, seq=False,
           **coll_kw):
    numeric = [fc.NumericColumn(n, log_normalize=True) for n in DENSE_NAMES]
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), dim)
            for n in CAT_NAMES]
    forward = None
    if seq:
        cols = [
            fc.EmbeddingColumn(
                fc.CategoricalColumn("item", shared_embedding="it"), dim),
            fc.SequenceEmbeddingColumn(
                fc.CategoricalColumn("hist", max_length=6,
                                     shared_embedding="it"), dim),
            fc.EmbeddingColumn(fc.CategoricalColumn("user"), dim),
        ]
    kw = dict(coll_kw)
    if meta:
        kw.update(counter_filter=dr.CounterFilter(filter_freq=2),
                  evict=dr.GlobalStepEvict(steps_to_live=1 << 30))
    C = HostIndexEmbeddingCollection if host else fc.EmbeddingCollection
    coll = C(cols, name="emb", capacity=cap,
             initializer=dr.Initializer(kind="normal", scale=0.05),
             max_unique=26 * batch, fused_slot_columns=dim,
             fused_slot_init=0.1, **kw)
    emb_names = [c.name for c in cols
                 if not isinstance(c, fc.SequenceEmbeddingColumn)]
    if seq:
        emb_names = emb_names + ["hist"]  # mean-pooled by the forward

        def forward(apply_fn, dense, outputs, train):
            emb, seqs = outputs["emb"]
            pooled = dict(emb)
            rows, mask = seqs["hist"]
            m = mask.astype(rows.dtype)
            denom = jnp.maximum(m.sum(-1, keepdims=True), 1.0)
            pooled["hist"] = (rows * m[..., None]).sum(1) / denom
            return apply_fn(dense, pooled, train=train)
    else:
        forward = None
    model = ctr.DLRM(emb_names=emb_names, emb_dim=dim,
                     bottom_units=(32,), top_units=(64, 32))
    tr = Trainer(model=model, numeric_columns=numeric,
                 collections={"emb": coll},
                 sparse_optimizers={"emb": sopt.sparse_adagrad_fused(0.05)},
                 dense_optimizer=optax.adagrad(0.05), forward=forward)
    return tr, coll


def _seq_batch(rng, batch):
    return {
        "item": rng.integers(0, 500, size=batch, dtype=np.int64),
        "hist": np.where(rng.random((batch, 6)) < 0.3, np.int64(-1),
                         rng.integers(0, 500, (batch, 6), dtype=np.int64)),
        "user": rng.integers(1000, 1400, size=batch, dtype=np.int64),
        **{n: rng.normal(size=batch).astype(np.float32) for n in DENSE_NAMES},
        "label": (rng.random(batch) < 0.4).astype(np.float32),
    }


def _table_dict(coll, bundle, host, step):
    if host:
        a = coll.ckpt_arrays(bundle, 1, None, False, step)
    else:
        from deeprec_tpu.checkpoint.saver import table_snapshot_host
        a = table_snapshot_host(coll.config, bundle.ev, bundle.slot)
    return (dict(zip(a["keys"].tolist(), np.asarray(a["values"]))),
            dict(zip(a["keys"].tolist(), a["freqs"].tolist())),
            dict(zip(a["keys"].tolist(), a["versions"].tolist())))


def _run_pair(meta=False, steps=6):
    gen = SyntheticCriteo(batch_size=128, seed=11)
    batches = list(gen.take(steps))
    tr_d, c_d = _build(False, meta=meta)
    tr_h, c_h = _build(True, meta=meta)
    sd = tr_d.init(jax.random.key(0), batches[0])
    sh = tr_h.init(jax.random.key(0), batches[0])
    for b in batches:
        sd = tr_d.train_step(sd, b)
        sh = tr_h.train_step(sh, b)
    return tr_d, tr_h, c_d, c_h, sd, sh


def test_host_trainer_bit_equal_to_device_trainer():
    tr_d, tr_h, c_d, c_h, sd, sh = _run_pair()
    vd, fd, _ = _table_dict(c_d, sd.tables["emb"], False, int(sd.step))
    vh, fh, _ = _table_dict(c_h, sh.tables["emb"], True, int(sh.step))
    assert vd.keys() == vh.keys()
    assert fd == fh
    for k in vd:
        np.testing.assert_array_equal(vd[k], vh[k])
    assert float(sd.metrics.loss_sum) == pytest.approx(
        float(sh.metrics.loss_sum), rel=1e-6)

    # eval on unseen keys: missing -> deterministic init in both paths
    md, mh = metrics_lib.create(), metrics_lib.create()
    for b in SyntheticCriteo(batch_size=128, seed=99).take(2):
        md = tr_d.eval_step(sd, md, b)
        mh = tr_h.eval_step(sh, mh, b)
    assert metrics_lib.auc(md) == pytest.approx(metrics_lib.auc(mh), abs=1e-6)


def test_host_trainer_metadata_parity():
    """CounterFilter admission + version stamps match the device engine."""
    tr_d, tr_h, c_d, c_h, sd, sh = _run_pair(meta=True)
    vd, fd, verd = _table_dict(c_d, sd.tables["emb"], False, int(sd.step))
    vh, fh, verh = _table_dict(c_h, sh.tables["emb"], True, int(sh.step))
    assert vd.keys() == vh.keys()
    assert fd == fh and verd == verh
    for k in vd:
        np.testing.assert_array_equal(vd[k], vh[k])


def test_host_trainer_sequence_and_shared_embedding():
    """Sequence columns + shared-embedding groups (unique_cols-ineligible
    on the device path) are fully supported by the host resolver."""
    rng = np.random.default_rng(3)
    batches = [_seq_batch(rng, 64) for _ in range(5)]
    tr_d, c_d = _build(False, seq=True)
    tr_h, c_h = _build(True, seq=True)
    sd = tr_d.init(jax.random.key(0), batches[0])
    sh = tr_h.init(jax.random.key(0), batches[0])
    for b in batches:
        sd = tr_d.train_step(sd, b)
        sh = tr_h.train_step(sh, b)
    assert float(sd.metrics.loss_sum) == pytest.approx(
        float(sh.metrics.loss_sum), rel=1e-6)
    vd, fd, _ = _table_dict(c_d, sd.tables["emb"], False, int(sd.step))
    vh, fh, _ = _table_dict(c_h, sh.tables["emb"], True, int(sh.step))
    assert vd.keys() == vh.keys() and fd == fh
    for k in vd:
        np.testing.assert_array_equal(vd[k], vh[k])


def test_host_growth_under_load():
    """Tiny capacity: rows overflow -> maybe_grow doubles the ROW STORE
    without moving slots; pending keys materialize after growth."""
    gen = SyntheticCriteo(batch_size=128, seed=5)
    batches = list(gen.take(10))
    tr, coll = _build(True, cap=1 << 9)
    st = tr.init(jax.random.key(0), batches[0])
    grew = False
    for b in batches:
        st = tr.train_step(st, b)
        before = coll.config.capacity
        st = tr.maybe_grow(st)
        grew |= coll.config.capacity > before
    assert grew
    size, cap_ovf, _ = coll._resolver.stats()
    assert size > 1 << 9  # beyond the original capacity
    h = tr.table_health(st)["emb"]
    assert h["size"] == size and h["capacity"] == coll.config.capacity
    # every materialized key's row is live and finite
    arrays = coll.ckpt_arrays(st.tables["emb"], 1, None, False, int(st.step))
    assert arrays["keys"].shape[0] == size
    assert np.isfinite(arrays["values"]).all()


def test_host_checkpoint_roundtrip_and_cross_path(tmp_path):
    """Full+incremental save from the HOST trainer restores into BOTH a
    host trainer and a DEVICE trainer (and vice versa) — the 4-array
    checkpoint format is one interchange."""
    from deeprec_tpu.checkpoint.saver import CheckpointManager

    gen = SyntheticCriteo(batch_size=128, seed=21)
    batches = list(gen.take(8))
    kw = dict(evict=dr.GlobalStepEvict(steps_to_live=1 << 30))  # version-tracked
    tr_h, c_h = _build(True, **kw)
    sh = tr_h.init(jax.random.key(0), batches[0])
    mgr = CheckpointManager(str(tmp_path / "h"))
    for b in batches[:4]:
        sh = tr_h.train_step(sh, b)
    mgr.save(tr_h, sh, evict=False)
    for b in batches[4:6]:
        sh = tr_h.train_step(sh, b)
    mgr.save_incremental(tr_h, sh)

    # host -> host restore
    tr_h2, c_h2 = _build(True, **kw)
    s2 = tr_h2.init(jax.random.key(1), batches[0])
    s2, ok = CheckpointManager(str(tmp_path / "h")).restore(tr_h2, s2)
    assert ok
    v1, f1, _ = _table_dict(c_h, sh.tables["emb"], True, int(sh.step))
    v2, f2, _ = _table_dict(c_h2, s2.tables["emb"], True, int(s2.step))
    assert v1.keys() == v2.keys() and f1 == f2
    for k in v1:
        np.testing.assert_array_equal(v1[k], v2[k])

    # host ckpt -> DEVICE trainer; both continue and stay equal
    tr_d, c_d = _build(False, **kw)
    sd = tr_d.init(jax.random.key(2), batches[0])
    sd, ok = CheckpointManager(str(tmp_path / "h")).restore(tr_d, sd)
    assert ok
    for b in batches[6:]:
        sd = tr_d.train_step(sd, b)
        s2 = tr_h2.train_step(s2, b)
    vd, fd, _ = _table_dict(c_d, sd.tables["emb"], False, int(sd.step))
    vh, fh, _ = _table_dict(c_h2, s2.tables["emb"], True, int(s2.step))
    assert vd.keys() == vh.keys() and fd == fh
    for k in vd:
        np.testing.assert_allclose(vd[k], vh[k], atol=1e-6)

    # DEVICE ckpt -> host trainer
    mgr_d = CheckpointManager(str(tmp_path / "d"))
    mgr_d.save(tr_d, sd, evict=False)
    tr_h3, c_h3 = _build(True, **kw)
    s3 = tr_h3.init(jax.random.key(3), batches[0])
    s3, ok = CheckpointManager(str(tmp_path / "d")).restore(tr_h3, s3)
    assert ok
    v3, f3, _ = _table_dict(c_h3, s3.tables["emb"], True, int(s3.step))
    assert v3.keys() == vd.keys() and f3 == fd
    for k in v3:
        np.testing.assert_array_equal(v3[k], vd[k])


def test_host_save_time_eviction():
    """evict=True at save applies the policy as a save filter (the
    reference's Shrink-at-save, embedding_var.h:264-313)."""
    gen = SyntheticCriteo(batch_size=128, seed=31)
    batches = list(gen.take(4))
    tr, coll = _build(True, evict=dr.GlobalStepEvict(steps_to_live=2))
    st = tr.init(jax.random.key(0), batches[0])
    for b in batches:
        st = tr.train_step(st, b)
    full = coll.ckpt_arrays(st.tables["emb"], 1, None, False, int(st.step))
    evicted = coll.ckpt_arrays(st.tables["emb"], 1, None, True, int(st.step))
    assert evicted["keys"].shape[0] < full["keys"].shape[0]
    # surviving rows were touched within steps_to_live
    assert (int(st.step) - evicted["versions"] < 2).all()


def test_serving_from_host_index_checkpoint(tmp_path):
    """Predictor serves a host-index training job's checkpoint (it
    unwraps the collection to its device-index view and rebuilds the
    table on-device); predictions equal the trainer's own eval logits."""
    import functools

    from deeprec_tpu.checkpoint.saver import CheckpointManager
    from deeprec_tpu.feature_column import normalize_dense
    from deeprec_tpu.serving.predictor import Predictor

    gen = SyntheticCriteo(batch_size=128, seed=41)
    batches = list(gen.take(5))
    tr, coll = _build(True)
    st = tr.init(jax.random.key(0), batches[0])
    for b in batches:
        st = tr.train_step(st, b)
    CheckpointManager(str(tmp_path)).save(tr, st, evict=False)

    pred = Predictor(tr.model, tr.numeric_columns, {"emb": coll},
                     ckpt_dir=str(tmp_path))
    ev_batch = list(SyntheticCriteo(batch_size=128, seed=77).take(1))[0]
    served = np.asarray(pred.predict(ev_batch))

    dense, cats, _ = tr.prepare_batch(ev_batch, train=False)
    dense = normalize_dense(tr.numeric_columns, dense)
    aux, rows = coll.readonly_rows(st.tables["emb"].ev, cats["emb"])
    outs = {"emb": coll.embeddings_readonly(rows, aux)}
    out = tr.forward(functools.partial(tr.model.apply, st.params),
                     dense, outs, False)
    logits = np.asarray(out[0] if isinstance(out, tuple) else out)
    expect = 1.0 / (1.0 + np.exp(-logits))
    if served.shape != expect.shape:  # predictor may emit probabilities
        served = served.reshape(expect.shape)
    # predictor emits sigmoid(logits) or logits; accept either encoding
    ok_prob = np.allclose(served, expect, atol=1e-5)
    ok_logit = np.allclose(served, logits, atol=1e-5)
    assert ok_prob or ok_logit


def test_estimator_with_host_index(tmp_path):
    """Estimator train/evaluate/predict over a host-index collection
    (evaluate/predict go through the read-only resolve)."""
    from deeprec_tpu.train.estimator import Estimator

    tr, coll = _build(True)
    gen = SyntheticCriteo(batch_size=128, seed=51)
    batches = list(gen.take(6))
    est = Estimator(tr.model, tr.numeric_columns, tr.collections,
                    tr.sparse_optimizers, tr.dense_optimizer,
                    model_dir=str(tmp_path))
    est.train(lambda: iter(batches), steps=6)
    m = est.evaluate(lambda: iter(batches[:2]))
    assert np.isfinite(m["loss"])
    preds = list(est.predict(lambda: iter(batches[:1])))
    assert np.isfinite(np.concatenate([np.ravel(p) for p in preds])).all()
    # predict/evaluate did not mutate the index
    size_after_train = coll._resolver.size
    list(est.predict(lambda: iter(
        SyntheticCriteo(batch_size=128, seed=991).take(1))))
    assert coll._resolver.size == size_after_train


def test_host_unsupported_configs_raise():
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn("a"), 4)]
    from deeprec_tpu.config import StorageOption, StorageType
    import deeprec_tpu as dr
    # tiered storage IS supported (round 5); the one justified rejection
    # is CBF admission on a tiered table (the bloom gate would deny a
    # returning demoted key its slot — see host_index.py __init__)
    coll_t = HostIndexEmbeddingCollection(
        cols, capacity=64,
        storage=StorageOption(storage_type=StorageType.HBM_DRAM))
    assert coll_t._tiered
    with pytest.raises(NotImplementedError):
        HostIndexEmbeddingCollection(
            cols, capacity=64,
            cbf_filter=dr.CBFFilter(filter_freq=2, max_element_size=1024),
            storage=StorageOption(storage_type=StorageType.HBM_DRAM))
    coll = HostIndexEmbeddingCollection(cols, capacity=64)
    with pytest.raises(NotImplementedError):
        coll.sharded_table_spec("x", None)


def test_host_light_layout_touched_incremental(tmp_path):
    """LIGHT-layout tables (no version stamps) get TRUE incremental deltas
    from the resolver's touched-slot recorder (reference recorder-op
    semantics, incr_save_restore_ops.h:329) — not a full-row dump, and
    base+incr restore equals the live table bit-for-bit."""
    from deeprec_tpu.checkpoint.saver import CheckpointManager

    gen = SyntheticCriteo(batch_size=128, seed=41)
    batches = list(gen.take(8))
    tr, coll = _build(True)  # light: no filter, no evict
    assert not coll.config.version_tracked
    st = tr.init(jax.random.key(0), batches[0])
    mgr = CheckpointManager(str(tmp_path / "c"))
    for b in batches[:4]:
        st = tr.train_step(st, b)
    mgr.save(tr, st, evict=False)
    rows_full = int(coll._resolver.size)

    # a NARROW post-save window: only two batches touch rows
    for b in batches[4:6]:
        st = tr.train_step(st, b)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old fallback warned here
        path = mgr.save_incremental(tr, st)
    import json, os
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    n_incr = manifest["tables"]["emb"]
    # the delta holds only rows touched after the full save: strictly
    # fewer than all live rows
    assert 0 < n_incr < int(coll._resolver.size), (n_incr, rows_full)

    # base + delta replay == the live table
    tr2, c2 = _build(True)
    s2 = tr2.init(jax.random.key(1), batches[0])
    s2, ok = CheckpointManager(str(tmp_path / "c")).restore(tr2, s2)
    assert ok
    v1, f1, _ = _table_dict(coll, st.tables["emb"], True, int(st.step))
    v2, f2, _ = _table_dict(c2, s2.tables["emb"], True, int(s2.step))
    assert v1.keys() == v2.keys()
    for k in v1:
        np.testing.assert_array_equal(v1[k], v2[k])

    # the recorder window RESET at the incremental: an immediate second
    # incremental is (near-)empty
    p2 = mgr.save_incremental(tr, st)
    with open(os.path.join(p2, "manifest.json")) as f:
        m2 = json.load(f)
    assert m2["tables"]["emb"] == 0


def test_host_cbf_admission_parity(tmp_path):
    """Counting-bloom admission in the RESOLVER admits, gates and counts
    identically to the device engine (same hash family, bump order and
    post-bump estimate), and CBF counters checkpoint-interchange across
    engines."""
    from deeprec_tpu.checkpoint.saver import CheckpointManager

    kw = dict(cbf_filter=dr.CBFFilter(filter_freq=3, max_element_size=2000,
                                      num_hashes=4))
    gen = SyntheticCriteo(batch_size=128, seed=61)
    batches = list(gen.take(8))
    tr_d, c_d = _build(False, **kw)
    tr_h, c_h = _build(True, **kw)
    sd = tr_d.init(jax.random.key(0), batches[0])
    sh = tr_h.init(jax.random.key(0), batches[0])
    for b in batches[:6]:
        sd = tr_d.train_step(sd, b)
        sh = tr_h.train_step(sh, b)
    # materialized key sets, rows, freqs equal; losses equal
    vd, fd, _ = _table_dict(c_d, sd.tables["emb"], False, int(sd.step))
    vh, fh, _ = _table_dict(c_h, sh.tables["emb"], True, int(sh.step))
    assert vd.keys() == vh.keys() and len(vd) > 0
    assert fd == fh
    for k in vd:
        np.testing.assert_array_equal(vd[k], vh[k])
    assert float(sd.metrics.loss_sum) == pytest.approx(
        float(sh.metrics.loss_sum), rel=1e-6)
    # the gate actually gates: far fewer rows than distinct keys seen
    seen = set()
    for b in batches[:6]:
        for n in CAT_NAMES:
            seen.update(np.asarray(b[n]).tolist())
    assert len(vh) < len(seen)
    # CBF counters identical across engines
    np.testing.assert_array_equal(c_h._resolver.cbf_export(),
                                  np.asarray(sd.tables["emb"].ev.cbf))

    # host ckpt (with counters) -> device restore; continue; still equal
    mgr = CheckpointManager(str(tmp_path / "x"))
    mgr.save(tr_h, sh, evict=False)
    tr_d2, c_d2 = _build(False, **kw)
    s2 = tr_d2.init(jax.random.key(1), batches[0])
    s2, ok = CheckpointManager(str(tmp_path / "x")).restore(tr_d2, s2)
    assert ok
    np.testing.assert_array_equal(np.asarray(s2.tables["emb"].ev.cbf),
                                  c_h._resolver.cbf_export())
    for b in batches[6:]:
        sh = tr_h.train_step(sh, b)
        s2 = tr_d2.train_step(s2, b)
    vh, fh, _ = _table_dict(c_h, sh.tables["emb"], True, int(sh.step))
    v2, f2, _ = _table_dict(c_d2, s2.tables["emb"], False, int(s2.step))
    assert vh.keys() == v2.keys() and fh == f2

    # device ckpt -> HOST restore resumes admission counts
    mgr_d = CheckpointManager(str(tmp_path / "d"))
    mgr_d.save(tr_d2, s2, evict=False)
    tr_h3, c_h3 = _build(True, **kw)
    s3 = tr_h3.init(jax.random.key(2), batches[0])
    s3, ok = CheckpointManager(str(tmp_path / "d")).restore(tr_h3, s3)
    assert ok
    np.testing.assert_array_equal(c_h3._resolver.cbf_export(),
                                  np.asarray(s2.tables["emb"].ev.cbf))


@pytest.mark.skipif(not NATIVE, reason="native lib unavailable")
def test_resolver_cbf_native_matches_fallback():
    rng = np.random.default_rng(7)
    nat = HostIndexResolver(n_groups=1, use_native=True)
    fb = HostIndexResolver(use_native=False)
    for r in (nat, fb):
        r.cbf_enable(1 << 10, 4, 3)
    for step in range(12):
        keys = rng.choice(np.arange(-1, 120, dtype=np.int64), size=256)
        ro = step % 4 == 3
        a = nat.resolve(keys, 80, 999, 1000, readonly=ro)
        b = fb.resolve(keys, 80, 999, 1000, readonly=ro)
        for x, y, what in zip(a, b, ["ukeys", "uslots", "inverse",
                                     "created", "counts", "nu", "nov"]):
            assert np.array_equal(x, y), (step, what)
        # wire path too
        wa, n1, o1 = nat.resolve_wire(keys, 80, 999, 1000, ro, True, True)
        wb, n2, o2 = fb.resolve_wire(keys, 80, 999, 1000, ro, True, True)
        assert (n1, o1) == (n2, o2)
        assert np.array_equal(wa, wb)
    np.testing.assert_array_equal(nat.cbf_export(), fb.cbf_export())
    assert nat.stats() == fb.stats()
