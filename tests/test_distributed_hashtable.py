"""DistributedHashTable (second KV stack, sharded) + hash_table_column
(HashTableCollection through the standard Trainer). Mirrors the
single-table semantics of tests/test_hashtable.py on the mesh:
dense per-shard id spaces, admission, id stability, gradient exchange."""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.config import CBFFilter
from deeprec_tpu.feature_column_variants import HashTableCollection
from deeprec_tpu.models import ctr
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.parallel.hash_table import DistributedHashTable
from deeprec_tpu.parallel.trainer import make_mesh
from deeprec_tpu.sparse import keys as K
from deeprec_tpu.train import metrics as M
from deeprec_tpu.train.trainer import Trainer


def _keys_batch(ids, S=4, n=16):
    """[S, n] per-device key planes from an id list."""
    arr = np.resize(np.asarray(ids, np.int64), S * n).reshape(S, n)
    hi, lo = K.split_np(arr)
    return jnp.asarray(hi), jnp.asarray(lo), arr


class TestDistributedHashTable:
    def _make(self, S=4, **kw):
        return DistributedHashTable(make_mesh(S), capacity_per_shard=64,
                                    dim=8, bucket_cap=64, **kw)

    def test_gen_ids_dense_per_shard_and_stable(self):
        dht = self._make()
        state = dht.init()
        hi, lo, arr = _keys_batch(np.arange(1, 33), S=4, n=16)
        state, ids1 = dht.gen_ids(state, hi, lo)
        ids1 = np.asarray(ids1).reshape(-1)
        arrf = arr.reshape(-1)
        # every key got an id; same key -> same id everywhere
        assert (ids1 >= 0).all()
        m = {}
        for k, i in zip(arrf, ids1):
            assert m.setdefault(k, i) == i
        # id -> shard is the owner hash (global id = local*S + shard)
        from deeprec_tpu.parallel.sharded import OWNER_SEED
        own = K.hash32_np(arrf, seed=OWNER_SEED) % np.uint32(4)
        np.testing.assert_array_equal(ids1 % 4, own.astype(ids1.dtype))
        # ids are dense per shard: shard s's local ids are 0..count-1
        for s in range(4):
            loc = np.unique(ids1[ids1 % 4 == s]) // 4
            np.testing.assert_array_equal(np.sort(loc), np.arange(len(loc)))
        # second lookup: identical ids (stability), size unchanged
        n1 = dht.size(state)
        state, ids2 = dht.gen_ids(state, hi, lo)
        np.testing.assert_array_equal(ids1, np.asarray(ids2).reshape(-1))
        assert dht.size(state) == n1 == len(np.unique(arrf))

    def test_snapshot_concatenates_partitions(self):
        dht = self._make()
        state = dht.init()
        hi, lo, arr = _keys_batch(np.arange(100, 140), S=4, n=16)
        state, ids = dht.gen_ids(state, hi, lo)
        keys, sids = dht.snapshot(state)
        assert set(keys.tolist()) == set(arr.reshape(-1).tolist())
        lookup = dict(zip(arr.reshape(-1).tolist(),
                          np.asarray(ids).reshape(-1).tolist()))
        for k, i in zip(keys.tolist(), sids.tolist()):
            assert lookup[k] == i

    def test_admission_gate(self):
        # every device sights each key once per batch -> 4 occurrences per
        # GLOBAL batch; counts accumulate by multiplicity (the counts plane
        # rides the exchange), so filter_freq=8 admits at the second batch
        dht = self._make(admit=CBFFilter(filter_freq=8, max_element_size=1000))
        state = dht.init()
        hi, lo, arr = _keys_batch(np.arange(1, 9), S=4, n=8)
        state, ids1 = dht.gen_ids(state, hi, lo)
        assert (np.asarray(ids1) == -1).all()  # 4 sightings < 8: filtered
        state, ids2 = dht.gen_ids(state, hi, lo)
        assert (np.asarray(ids2) >= 0).all()   # 8 sightings: admitted

    def test_gradient_exchange_updates_owner_rows(self):
        """The cotangent of the returned rows lands on the OWNER shard's
        table rows (summed over requesters) — SOK all2all grad semantics."""
        dht = self._make()
        state = dht.init()
        # every device asks for THE SAME key -> its row grad must be the
        # SUM over the 4 requesters
        arr = np.full((4, 8), 7, np.int64)
        hi, lo = (jnp.asarray(x) for x in K.split_np(arr))
        state, ids = dht.gen_ids(state, hi, lo)
        ct = jnp.ones((4, 8, 8), jnp.float32)  # d(rows): one per key slot
        st2, rows, valid, d_rows = dht.lookup_and_grads(state, hi, lo, ct)
        d = np.asarray(d_rows)  # [S*(cap+1), dim] global
        gid = int(np.asarray(ids).reshape(-1)[0])
        shard, local = gid % 4, gid // 4
        row = d[shard * 65 + local]
        np.testing.assert_allclose(row, 4 * 8 * 1.0)  # 4 devices x 8 copies
        # and ONLY that row got cotangent
        assert np.count_nonzero(d.sum(-1)) == 1

    def test_apply_cotangent_trains(self):
        dht = self._make()
        state = dht.init()
        opt = sopt.sparse_sgd(0.5)
        slot = dht.init_slot(opt, state)
        arr = np.resize(np.arange(1, 17, dtype=np.int64), (4, 16))
        hi, lo = (jnp.asarray(x) for x in K.split_np(arr))
        state, ids = dht.gen_ids(state, hi, lo)
        rows_before = np.asarray(state.table.rows).copy()
        ct = jnp.ones((4, 16, 8), jnp.float32)
        state, slot, rows, valid = dht.apply_cotangent(
            state, opt, slot, hi, lo, ct, jnp.zeros((), jnp.int32))
        assert bool(np.asarray(valid).all())
        moved = np.abs(np.asarray(state.table.rows) - rows_before).sum(-1)
        assert np.count_nonzero(moved) == 16  # exactly the touched ids


class TestDHTOperationalTail:
    """Round-3: health counters, growth under load, reshard-safe
    checkpoint for the standalone DistributedHashTable."""

    def test_health_and_grow_under_load(self):
        dht = DistributedHashTable(make_mesh(4), capacity_per_shard=32,
                                   dim=8, bucket_cap=128)
        state = dht.init()
        hi, lo, arr = _keys_batch(np.arange(1, 101), S=4, n=32)
        state, ids1 = dht.gen_ids(state, hi, lo)
        h = dht.health(state)
        assert h["size"] == 100 and h["shards"] == 4
        assert h["load_factor"] > 0.5
        state = dht.maybe_grow(state)
        assert dht.cap == 64
        # ids stable through growth; lookups still resolve
        state, ids2 = dht.gen_ids(state, hi, lo)
        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
        assert dht.health(state)["overflow"] == 0

    def test_checkpoint_reshard_4_to_2(self):
        dht4 = DistributedHashTable(make_mesh(4), capacity_per_shard=64,
                                    dim=4, bucket_cap=64)
        state = dht4.init()
        hi, lo, arr = _keys_batch(np.arange(50, 120), S=4, n=32)
        state, ids = dht4.gen_ids(state, hi, lo)
        # train the rows a little so values are non-trivial
        ct = jnp.ones((4, 32, 4), jnp.float32)
        state, rows, valid, _ = dht4.lookup_and_grads(state, hi, lo, ct)
        arrays = dht4.checkpoint_arrays(state)
        assert set(arrays["keys"].tolist()) == set(arr.reshape(-1).tolist())

        dht2 = DistributedHashTable(make_mesh(2), capacity_per_shard=64,
                                    dim=4, bucket_cap=64)
        st2 = dht2.restore_arrays(arrays)
        assert dht2.size(st2) == dht4.size(state)
        arrays2 = dht2.checkpoint_arrays(st2)
        m1 = dict(zip(arrays["keys"].tolist(),
                      [v.tobytes() for v in arrays["values"]]))
        m2 = dict(zip(arrays2["keys"].tolist(),
                      [v.tobytes() for v in arrays2["values"]]))
        assert m1 == m2


class TestHashTableColumn:
    """hash_table_column -> HashTableCollection through the Trainer."""

    def _make(self, admit=None, capacity=256):
        cols = [fc.EmbeddingColumn(fc.CategoricalColumn(n), 8)
                for n in ("C1", "C2")]
        coll = HashTableCollection(
            cols, name="ht", capacity=capacity, admit=admit,
            initializer=dr.Initializer("normal", scale=0.1))
        model = ctr.DCN(emb_names=["C1", "C2"], cross_layers=1,
                        deep_units=(16,))
        return Trainer(model, [fc.NumericColumn("I1")], {"emb": coll},
                       {"emb": sopt.sparse_adagrad(0.5)}, optax.adagrad(0.05))

    def _batch(self, rng, bs=64, vocab=64):
        b = {"I1": rng.normal(size=bs).astype(np.float32)}
        for n in ("C1", "C2"):
            b[n] = rng.integers(0, vocab, bs).astype(np.int64)
        b["label"] = (b["C1"] % 2).astype(np.float32)
        return b

    def test_trains_and_learns(self):
        tr = self._make()
        rng = np.random.default_rng(0)
        state = tr.init(jax.random.key(0), self._batch(rng))
        for _ in range(40):
            state = tr.train_step(state, self._batch(rng))
        state = tr.reset_metrics(state)
        for _ in range(10):
            state = tr.train_step(state, self._batch(rng))
        m = M.summarize(state.metrics)
        assert m["auc"] > 0.75, m
        # dense id space: exactly vocab C1-ids + vocab C2-ids allocated
        assert int(np.asarray(state.tables["emb"].ev.alloc.next_id)) <= 128

    def test_eval_matches_train_rows(self):
        tr = self._make()
        rng = np.random.default_rng(1)
        b = self._batch(rng)
        state = tr.init(jax.random.key(0), b)
        for _ in range(3):
            state = tr.train_step(state, b)
        mstate = tr.eval_step(state, tr.reset_metrics(state).metrics, b)
        assert np.isfinite(float(mstate.loss_sum))

    def test_growth_keeps_ids_and_rows(self):
        tr = self._make(capacity=64)
        coll = tr.collections["emb"]
        rng = np.random.default_rng(2)
        state = tr.init(jax.random.key(0), self._batch(rng, vocab=50))
        for _ in range(3):
            state = tr.train_step(state, self._batch(rng, vocab=50))
        b = state.tables["emb"]
        assert coll.needs_growth(b.ev)
        ids_before = np.asarray(b.ev.alloc.ids).copy()
        keys_hi = np.asarray(b.ev.alloc.index.key_hi)
        keys_lo = np.asarray(b.ev.alloc.index.key_lo)
        rows_before = np.asarray(b.ev.table.rows)
        grown = tr.maybe_grow(state)
        assert coll.config.capacity == 128
        g = grown.tables["emb"].ev
        # every live key kept its dense id, and its row moved with it
        live = ~((keys_hi == -1) & (keys_lo == -1))
        k64 = ((keys_hi[live].astype(np.int64) << 32)
               | keys_lo[live].astype(np.uint32).astype(np.int64))
        from deeprec_tpu.sparse import hash_table_api as hta
        ids_after = np.asarray(hta.lookup(g.alloc, K.from_numpy(k64)))
        old_ids = []
        from deeprec_tpu.sparse import hashtable as ht_mod
        slots, found = ht_mod.lookup(b.ev.alloc.index, K.from_numpy(k64), 32)
        old_ids = ids_before[np.asarray(slots)]
        np.testing.assert_array_equal(ids_after, old_ids)
        np.testing.assert_allclose(np.asarray(g.table.rows)[ids_after],
                                   rows_before[old_ids])
        # training continues post-growth
        grown = tr.train_step(grown, self._batch(rng, vocab=50))
        assert np.isfinite(float(grown.metrics.loss_sum))


def test_hashtable_collection_checkpoint_roundtrip(tmp_path):
    """HTState saves per-key {key, row, slot rows} (reshard-safe — ids are
    per-shard internals, re-allocated at restore like the reference's
    HashTableDirectRestoreOp re-insertion, ops/hash_ops.cc:353-391): every
    key's row and allocator size survive; dense ids may renumber."""
    from deeprec_tpu.checkpoint import CheckpointManager

    def make():
        cols = [fc.EmbeddingColumn(fc.CategoricalColumn("C1"), 8)]
        coll = HashTableCollection(
            cols, name="emb", capacity=256,
            initializer=dr.Initializer("normal", scale=0.1))
        model = ctr.DCN(emb_names=["C1"], cross_layers=1, deep_units=(16,))
        return Trainer(model, [fc.NumericColumn("I1")], {"emb": coll},
                       {"emb": sopt.sparse_adagrad(0.3)}, optax.adagrad(0.05))

    rng = np.random.default_rng(0)

    def batch(bs=32):
        return {"I1": rng.normal(size=bs).astype(np.float32),
                "label": rng.integers(0, 2, bs).astype(np.float32),
                "C1": rng.integers(0, 50, bs).astype(np.int64)}

    tr = make()
    st = tr.init(jax.random.key(0), batch())
    for _ in range(5):
        st = tr.train_step(st, batch())
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr, st, evict=False)
    tr2 = make()
    st2 = tr2.init(jax.random.key(1), batch())
    st2, ok = mgr.restore(tr2, st2)
    assert ok

    def rows_by_key(trx, stx):
        from deeprec_tpu.sparse import hash_table_api as hta
        ev_st = stx.tables["emb"].ev
        hi = np.asarray(ev_st.alloc.index.key_hi)
        lo = np.asarray(ev_st.alloc.index.key_lo)
        live = ~((hi == -1) & (lo == -1))
        k64 = ((hi[live].astype(np.int64) << 32)
               | lo[live].astype(np.uint32).astype(np.int64))
        ids = np.asarray(hta.lookup(ev_st.alloc, K.from_numpy(k64)))
        rows = np.asarray(ev_st.table.rows)[ids]
        return {k: rows[i].tobytes() for i, k in enumerate(k64.tolist())}

    assert rows_by_key(tr, st) == rows_by_key(tr2, st2)
    assert int(np.asarray(st2.tables["emb"].ev.alloc.next_id)) == \
        int(np.asarray(st.tables["emb"].ev.alloc.next_id))
    st2 = tr2.train_step(st2, batch())
    assert np.isfinite(float(st2.metrics.loss_sum))


class TestReinsertCompaction:
    """Restore-time re-insertion (hta.reinsert) under probe overflow.

    Regression: the old allocation gave a restored key its SCAN position as
    its dense id (arange), so when an earlier key probe-overflowed the ids
    had gaps while ``next_id`` (= live count) landed inside the live range —
    the next post-restore insert handed out an id already owned by a
    restored row. Reference semantics: HashTableDirectRestoreOp re-allocates
    ids densely (ops/hash_ops.cc:353-391)."""

    def test_ids_compact_and_next_id_fresh(self):
        from deeprec_tpu.sparse import hash_table_api as hta

        cap = 64
        st = hta.create(cap)
        keys = K.from_numpy(np.arange(1, 201, dtype=np.int64))
        index, ids_plane, next_id, live, new_ids = hta.reinsert(
            st, keys, max_probes=2)
        live = np.asarray(live)
        new_ids = np.asarray(new_ids)
        n_live = int(live.sum())
        # the probe bound must actually bite for this test to mean anything
        assert 0 < n_live < 200
        # live ids are exactly {0..n_live-1}: compact, no duplicates
        np.testing.assert_array_equal(np.sort(new_ids[live]),
                                      np.arange(n_live))
        assert int(next_id) == n_live
        # post-restore inserts allocate only UNUSED ids
        st2 = hta.HashTableState(index=index, ids=ids_plane,
                                 next_id=jnp.asarray(next_id, jnp.int32),
                                 cbf=None)
        fresh = K.from_numpy(np.arange(10**9, 10**9 + 8, dtype=np.int64))
        st2, ids2 = hta.lookup_or_create(st2, fresh, max_probes=2)
        got = np.asarray(ids2)
        assert (got[got >= 0] >= n_live).all()
