"""Native host runtime + multi-tier storage tests (mirrors the reference's
embedding storage suite: embedding_variable_ops_test.cc storage cases and
modelzoo/features/pmem)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu.config import EmbeddingVariableConfig, GlobalStepEvict
from deeprec_tpu.sparse import embedding_var as ev
from deeprec_tpu.sparse import keys as K
from deeprec_tpu.sparse.tiered import TieredTable
from deeprec_tpu.utils.native import HostKV, criteo_parse_chunk, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def test_hostkv_roundtrip():
    kv = HostKV(dim=8, capacity_hint=64)
    keys = np.arange(1000, dtype=np.int64) * 7 - 100
    rows = np.random.default_rng(0).normal(size=(1000, 8)).astype(np.float32)
    kv.upsert(keys, rows)
    assert len(kv) == 1000
    out, found = kv.lookup(np.concatenate([keys[::3], [999999]]))
    assert found[:-1].all() and not found[-1]
    np.testing.assert_allclose(out[:-1], rows[::3])
    # overwrite
    kv.upsert(keys[:10], rows[:10] * 2)
    out, _ = kv.lookup(keys[:10])
    np.testing.assert_allclose(out, rows[:10] * 2)
    assert len(kv) == 1000
    # erase
    kv.erase(keys[:500])
    assert len(kv) == 500
    _, found = kv.lookup(keys[:500])
    assert not found.any()
    ek, er = kv.export()
    assert ek.shape[0] == 500
    order = np.argsort(ek)
    np.testing.assert_array_equal(ek[order], np.sort(keys[500:]))


def test_hostkv_growth_and_negative_keys():
    kv = HostKV(dim=4, capacity_hint=16)  # force many growths
    keys = np.random.default_rng(1).integers(-2**62, 2**62, size=20000,
                                             dtype=np.int64)
    keys = np.unique(keys)
    rows = np.arange(keys.shape[0] * 4, dtype=np.float32).reshape(-1, 4)
    kv.upsert(keys, rows)
    out, found = kv.lookup(keys)
    assert found.all()
    np.testing.assert_allclose(out, rows)


def test_criteo_native_parser(tmp_path):
    lines = []
    for r in range(10):
        lines.append("\t".join([str(r % 2)] + [str(r * i) for i in range(13)]
                               + [f"tok{r}{j}" for j in range(26)]))
    # one row with missing fields
    lines.append("1\t\t5" + "\t" * 36)
    buf = ("\n".join(lines) + "\n").encode()
    labels, dense, cats, consumed = criteo_parse_chunk(buf, 100)
    assert labels.shape[0] == 11
    assert consumed == len(buf)
    np.testing.assert_array_equal(labels[:4], [0, 1, 0, 1])
    assert dense[2, 3] == 6.0  # r=2, i=3 -> 6
    assert dense[10, 0] == 0.0 and dense[10, 1] == 5.0
    assert (cats[10] == -2).all()  # empty tokens -> missing id
    # same token hashes identically across calls; distinct tokens differ
    l2, d2, c2, _ = criteo_parse_chunk(buf, 100)
    np.testing.assert_array_equal(cats, c2)
    assert len(np.unique(cats[:10])) > 200
    assert (cats != -1).all()


def test_read_criteo_native_matches_python_structure(tmp_path):
    from deeprec_tpu.data.criteo import read_criteo, read_criteo_native
    p = tmp_path / "day.tsv"
    rows = []
    for r in range(37):
        rows.append("\t".join([str(r % 2)] + [str(r)] * 13
                              + [f"t{r % 5}x{j}" for j in range(26)]))
    p.write_text("\n".join(rows) + "\n")
    nb = list(read_criteo_native(str(p), batch_size=8))
    pb = list(read_criteo(str(p), batch_size=8))
    assert len(nb) == len(pb) == 4
    for a, b in zip(nb, pb):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_allclose(a["I3"], b["I3"])
        # ids differ (different hash) but structure/validity matches
        assert a["C1"].dtype == np.int64 and (a["C1"] != -1).all()


def test_tiered_demote_promote_roundtrip():
    cfg = EmbeddingVariableConfig(
        name="t", embedding_dim=4, capacity=64,
        evict=GlobalStepEvict(steps_to_live=2),
        initializer=dr.Initializer("zeros"))
    table = TieredTable(cfg)
    st = ev.create(cfg)

    hot = K.from_numpy(np.asarray([1, 2, 3], np.int64))
    st, aux = table.lookup_or_create(st, hot, 0)
    # hand-train the rows so demotion must preserve learned values
    marker = jnp.arange(3 * 4, dtype=jnp.float32).reshape(3, 4) + 1.0
    st = st._replace(values=st.values.at[aux.slots].set(marker))

    # steps pass without touching these keys -> policy-cold at step 5
    st, perm = table.demote(st, global_step=5)
    assert table.host_rows() == 3
    # rows are gone from HBM
    from deeprec_tpu.sparse import hashtable as ht
    slots, found = ht.lookup(st.index, hot)
    assert not bool(found.any())

    # the keys recur -> created rows get patched from the host tier
    st, aux = table.lookup_or_create(st, hot, 6)
    rows = np.asarray(ev.gather(st.values, aux, cfg))
    order = np.argsort(K.to_numpy(K.Keys(np.asarray(aux.uniq.ukeys.hi),
                                         np.asarray(aux.uniq.ukeys.lo)))[:3])
    np.testing.assert_allclose(rows[:3][order],
                               np.asarray(marker)[np.argsort([1, 2, 3])])
    assert table.host_rows() == 0  # promoted out of the cold tier


def test_tiered_export_import():
    cfg = EmbeddingVariableConfig(name="t", embedding_dim=4, capacity=64,
                                  evict=GlobalStepEvict(steps_to_live=1))
    t1 = TieredTable(cfg)
    keys = np.asarray([10, 20, 30], np.int64)
    rows = np.random.default_rng(2).normal(size=(3, 4)).astype(np.float32)
    t1.import_host(keys, rows)
    ek, er = t1.export_host()
    t2 = TieredTable(cfg)
    t2.import_host(ek, er)
    out, found = t2.host.lookup(keys)
    assert found.all()
    np.testing.assert_allclose(out[np.argsort(keys)][np.argsort(np.argsort(keys))], rows)
