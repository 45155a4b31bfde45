"""Reference-checkpoint migration tests.

Bundles are written by the REAL TensorFlow C++ BundleWriter
(``tf.raw_ops.SaveV2`` — the op DeepRec's Saver lowers to), so the
clean-room reader in ``checkpoint/bundle_reader.py`` is validated against
authentic bytes, cross-checked with ``tf.train.load_checkpoint``. The
EV layout mirrors what DeepRec emits: per-feature EVs saved as
``name-keys/-values/-versions/-freqs`` quads (reference:
python/training/saving/saveable_object_util.py:169-172), partitioned EVs
under ``name/part_k`` and optimizer slots under ``name/<Optimizer>``."""
import json
import os

import numpy as np
import optax
import pytest

tf = pytest.importorskip("tensorflow")

import deeprec_tpu as dr  # noqa: E402
from deeprec_tpu import feature_column as fc  # noqa: E402
from deeprec_tpu.checkpoint.bundle_reader import (  # noqa: E402
    BundleReader, masked_crc32c)
from deeprec_tpu.checkpoint import migrate  # noqa: E402
from deeprec_tpu.checkpoint.saver import table_snapshot_host  # noqa: E402
from deeprec_tpu.models import ctr  # noqa: E402
from deeprec_tpu.optim import sparse as sopt  # noqa: E402
from deeprec_tpu.train.trainer import Trainer  # noqa: E402
from deeprec_tpu.parallel.trainer import ShardedTrainer, make_mesh  # noqa: E402

DIM = 8


def _save_bundle(prefix, tensors):
    """tensors: list of (name, slice_spec, np_or_tf_tensor)."""
    tf.raw_ops.SaveV2(
        prefix=prefix,
        tensor_names=[n for n, _, _ in tensors],
        shape_and_slices=[s for _, s, _ in tensors],
        tensors=[tf.constant(t) for _, _, t in tensors])


def _ev_quad(name, keys, values, versions=None, freqs=None):
    n = len(keys)
    versions = np.asarray(versions if versions is not None
                          else np.arange(n), np.int64)
    freqs = np.asarray(freqs if freqs is not None
                       else np.ones(n), np.int64)
    return [(name + "-keys", "", np.asarray(keys, np.int64)),
            (name + "-values", "", np.asarray(values, np.float32)),
            (name + "-versions", "", versions),
            (name + "-freqs", "", freqs)]


@pytest.fixture(scope="module")
def deeprec_ckpt(tmp_path_factory):
    """A DeepRec-shaped checkpoint: partitioned EV + slot EV + second
    feature EV + dense weights + a string tensor (skipped by scan)."""
    d = tmp_path_factory.mktemp("refckpt")
    prefix = os.path.join(str(d), "model.ckpt-500")
    rng = np.random.default_rng(42)

    c1_keys = np.arange(10, dtype=np.int64) * 7 + 1
    c1_vals = rng.standard_normal((10, DIM)).astype(np.float32)
    c1_vers = np.arange(100, 110, dtype=np.int64)
    c1_freqs = rng.integers(1, 50, 10).astype(np.int64)
    # the slot EV dumps in its OWN hash order and misses two keys
    perm = rng.permutation(10)[:8]
    acc_keys = c1_keys[perm]
    acc_vals = rng.uniform(0.1, 2.0, (8, DIM)).astype(np.float32)

    c2_keys = np.array([3, 5, 9, 11], np.int64)
    c2_vals = rng.standard_normal((4, DIM)).astype(np.float32)

    tensors = []
    # partitioned primary: rows 0-5 in part_0, 6-9 in part_1
    tensors += _ev_quad("dnn/C1/weights/part_0", c1_keys[:6], c1_vals[:6],
                        c1_vers[:6], c1_freqs[:6])
    tensors += _ev_quad("dnn/C1/weights/part_1", c1_keys[6:], c1_vals[6:],
                        c1_vers[6:], c1_freqs[6:])
    tensors += _ev_quad("dnn/C1/weights/Adagrad", acc_keys, acc_vals)
    tensors += _ev_quad("dnn/C2/weights", c2_keys, c2_vals)
    dense_w = rng.standard_normal((DIM, 4)).astype(np.float32)
    tensors.append(("head/kernel", "", dense_w))
    tensors.append(("global_step", "", np.int64(500)))
    tensors.append(("ckpt/path", "", tf.constant("unused-string")))
    _save_bundle(prefix, tensors)
    return dict(prefix=prefix, c1_keys=c1_keys, c1_vals=c1_vals,
                c1_vers=c1_vers, c1_freqs=c1_freqs, acc_keys=acc_keys,
                acc_vals=acc_vals, c2_keys=c2_keys, c2_vals=c2_vals,
                dense_w=dense_w)


def test_bundle_reader_matches_tf(deeprec_ckpt):
    prefix = deeprec_ckpt["prefix"]
    r = BundleReader(prefix)
    ck = tf.train.load_checkpoint(prefix)
    for name in r.keys():
        if name == "ckpt/path":
            with pytest.raises(NotImplementedError):
                r.get_tensor(name)
            continue
        got = r.get_tensor(name, validate=True)
        want = ck.get_tensor(name)
        assert np.array_equal(got, want), name
        assert got.dtype == want.dtype, name


def test_bundle_reader_sliced_tensor(tmp_path):
    """Partitioned DENSE variables are saved as slices with OrderedCode
    keys; the reader must stitch the full tensor back."""
    prefix = os.path.join(str(tmp_path), "m.ckpt-1")
    full = np.random.default_rng(1).standard_normal((8, 6)).astype(np.float32)
    _save_bundle(prefix, [
        ("p/w", "8 6 0,3:-", full[0:3]),
        ("p/w", "8 6 3,5:-", full[3:8]),
    ])
    r = BundleReader(prefix)
    got = r.get_tensor("p/w", validate=True)
    assert np.array_equal(got, full)
    assert np.array_equal(got, tf.train.load_checkpoint(prefix)
                          .get_tensor("p/w"))


def test_crc32c_reference_vector():
    # RFC 3720 test vector: crc32c of 32 zero bytes = 0x8a9136aa
    from deeprec_tpu.checkpoint.bundle_reader import crc32c
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert masked_crc32c(b"") == ((0x0 >> 15 | 0x0 << 17) + 0xA282EAD8) & 0xFFFFFFFF


def test_scan_catalogue(deeprec_ckpt):
    cat = migrate.scan(BundleReader(deeprec_ckpt["prefix"]))
    assert set(cat.evs) == {"dnn/C1/weights", "dnn/C2/weights"}
    g = cat.evs["dnn/C1/weights"]
    assert len(g.parts) == 2 and g.rows == 10 and g.dim == DIM
    assert set(g.slots) == {"Adagrad"}
    assert "head/kernel" in cat.dense and "global_step" in cat.dense
    assert cat.skipped == ["ckpt/path"]
    # quad members must not appear as dense tensors
    assert not any(n.endswith("-values") for n in cat.dense)


def _make_trainer(sharded=False, capacity=64):
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn("C1"), DIM),
            fc.EmbeddingColumn(fc.CategoricalColumn("C2"), DIM)]
    coll = fc.EmbeddingCollection(
        cols, name="emb", capacity=capacity, track_version=True,
        initializer=dr.Initializer(kind="normal", scale=0.05))
    model = ctr.DCN(emb_names=["C1", "C2"], cross_layers=1, deep_units=(8,))
    kw = dict(model=model,
              numeric_columns=[fc.NumericColumn("I1")],
              collections={"emb": coll},
              sparse_optimizers={"emb": sopt.sparse_adagrad(
                  0.05, initial_accumulator_value=0.1)},
              dense_optimizer=optax.adagrad(0.05))
    if sharded:
        return ShardedTrainer(mesh=make_mesh(4), **kw)
    return Trainer(**kw)


def _init_state(trainer):
    import jax
    batch = {"I1": np.ones(4, np.float32),
             "C1": np.zeros(4, np.int64), "C2": np.zeros(4, np.int64),
             "label": np.zeros(4, np.float32)}
    return trainer.init(jax.random.PRNGKey(0), batch)


def _snap_map(trainer, state):
    coll = trainer.collections["emb"]
    t = state.tables["emb"]
    snap = table_snapshot_host(coll.config, t.ev, t.slot,
                               num_shards=getattr(trainer, "S", 1),
                               evict=False)
    acc_name = next(k for k in snap if k.startswith("slot__"))
    return {int(k): (snap["values"][i], int(snap["versions"][i]),
                     int(snap["freqs"][i]), snap[acc_name][i])
            for i, k in enumerate(snap["keys"])}


NAME_MAP = {"emb": {"C1": "dnn/C1/weights", "C2": "dnn/C2/weights"}}


def _check_imported(ck, trainer, state):
    coll = trainer.collections["emb"]
    rows = _snap_map(trainer, state)
    assert len(rows) == 14
    acc_by_key = {int(k): v for k, v in zip(ck["acc_keys"], ck["acc_vals"])}
    for i, raw in enumerate(ck["c1_keys"]):
        key = int(coll.transform_raw_keys("C1", np.array([raw]))[0])
        vals, ver, freq, acc = rows[key]
        np.testing.assert_allclose(vals[:DIM], ck["c1_vals"][i], rtol=0)
        assert ver == ck["c1_vers"][i]
        assert freq == ck["c1_freqs"][i]
        want_acc = acc_by_key.get(int(raw))
        if want_acc is not None:
            np.testing.assert_allclose(acc, want_acc, rtol=0)
        else:  # keys the slot EV never dumped start at the fresh-slot fill
            np.testing.assert_allclose(acc, np.float32(0.1), rtol=0)
    for i, raw in enumerate(ck["c2_keys"]):
        key = int(coll.transform_raw_keys("C2", np.array([raw]))[0])
        assert key != int(raw) or raw == -1  # salted into its own space
        vals, ver, freq, acc = rows[key]
        np.testing.assert_allclose(vals[:DIM], ck["c2_vals"][i], rtol=0)
        np.testing.assert_allclose(acc, np.float32(0.1), rtol=0)


def test_import_tables_single_device(deeprec_ckpt):
    trainer = _make_trainer()
    state = _init_state(trainer)
    state, report = migrate.import_tables(
        trainer, state, deeprec_ckpt["prefix"], name_map=NAME_MAP,
        validate=True)
    assert report["imported"]["emb"]["rows"] == 14
    assert report["imported"]["emb"]["evs"] == ["dnn/C1/weights",
                                                "dnn/C2/weights"]
    assert report["slots"]["emb"] == ["Adagrad->acc"]
    assert report["unmatched_evs"] == []
    _check_imported(deeprec_ckpt, trainer, state)
    # imported state must be trainable: one step on live keys
    batch = {"I1": np.ones(4, np.float32),
             "C1": deeprec_ckpt["c1_keys"][:4].copy(),
             "C2": deeprec_ckpt["c2_keys"].copy(),
             "label": np.ones(4, np.float32)}
    state2 = trainer.train_step(state, batch)
    from deeprec_tpu.train import metrics as metrics_lib
    assert np.isfinite(metrics_lib.summarize(state2.metrics)["loss"])


def test_import_tables_sharded_matches_single(deeprec_ckpt):
    single = _make_trainer()
    s_state, _ = migrate.import_tables(
        single, _init_state(single), deeprec_ckpt["prefix"],
        name_map=NAME_MAP)
    sharded = _make_trainer(sharded=True)
    m_state, report = migrate.import_tables(
        sharded, _init_state(sharded), deeprec_ckpt["prefix"],
        name_map=NAME_MAP)
    assert report["imported"]["emb"]["rows"] == 14
    a, b = _snap_map(single, s_state), _snap_map(sharded, m_state)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k][0], b[k][0])
        assert a[k][1:3] == b[k][1:3]
        np.testing.assert_array_equal(a[k][3], b[k][3])
    _check_imported(deeprec_ckpt, sharded, m_state)


def test_import_unmatched_collection(deeprec_ckpt):
    trainer = _make_trainer()
    state = _init_state(trainer)
    _state, report = migrate.import_tables(
        trainer, state, deeprec_ckpt["prefix"],
        name_map={"emb": "no/such/ev"})
    assert report["imported"] == {}
    assert report["unmatched_collections"] == ["emb"]
    assert set(report["unmatched_evs"]) == {"dnn/C1/weights",
                                            "dnn/C2/weights"}


def test_import_dense(deeprec_ckpt):
    import jax.numpy as jnp
    params = {"head": {"kernel": jnp.zeros((DIM, 4), jnp.float32)},
              "other": jnp.ones(3)}
    new, missing = migrate.import_dense(
        params, deeprec_ckpt["prefix"],
        {"head/kernel": "['head']['kernel']", "nope": "['other']"})
    assert missing == ["nope"]
    np.testing.assert_array_equal(np.asarray(new["head"]["kernel"]),
                                  deeprec_ckpt["dense_w"])
    np.testing.assert_array_equal(np.asarray(new["other"]), 1.0)


def test_import_dense_shape_mismatch(deeprec_ckpt):
    import jax.numpy as jnp
    params = {"head": {"kernel": jnp.zeros((DIM, 5), jnp.float32)}}
    with pytest.raises(ValueError, match="shape"):
        migrate.import_dense(params, deeprec_ckpt["prefix"],
                             {"head/kernel": "['head']['kernel']"})


def test_offline_cli(deeprec_ckpt, tmp_path):
    out = str(tmp_path / "migrated")
    rc = migrate._main(["--prefix", deeprec_ckpt["prefix"], "--out", out,
                        "--validate"])
    assert rc == 0
    with open(os.path.join(out, "migration_report.json")) as f:
        report = json.load(f)
    assert set(report["evs"]) == {"dnn/C1/weights", "dnn/C2/weights"}
    ev1 = report["evs"]["dnn/C1/weights"]
    assert ev1["rows"] == 10 and ev1["parts"] == 2
    assert ev1["slots"] == ["Adagrad"]
    npz = np.load(os.path.join(out, ev1["file"]))
    order = np.argsort(npz["keys"])
    np.testing.assert_array_equal(npz["keys"][order],
                                  np.sort(deeprec_ckpt["c1_keys"]))
    # slot rows aligned to the primary's key order despite the slot EV's
    # own shuffled dump order
    acc = npz["slotrows__Adagrad"]
    key_list = list(npz["keys"])
    for k, v in zip(deeprec_ckpt["acc_keys"], deeprec_ckpt["acc_vals"]):
        np.testing.assert_array_equal(acc[key_list.index(k)], v)
    dense = np.load(os.path.join(out, "dense.npz"))
    np.testing.assert_array_equal(dense["head__kernel"],
                                  deeprec_ckpt["dense_w"])
