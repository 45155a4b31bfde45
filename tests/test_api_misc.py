"""API facade, HashTable/Tensible second stack, structured model tests."""
import numpy as np

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu.config import CBFFilter
from deeprec_tpu.models.structured import dot_head, structured_forward
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.sparse import hash_table_api as hta
from deeprec_tpu.sparse import keys as K


def ids_of(*vals):
    return K.from_numpy(np.asarray(vals, np.int64))


def test_hash_table_dense_id_allocation():
    st = hta.create(256)
    st, ids1 = hta.lookup_or_create(st, ids_of(100, 200, 100, 300, -1))
    a = np.asarray(ids1)
    assert a[0] == a[2]                      # same key -> same id
    assert a[4] == -1                        # padding
    assert set(a[:4]) <= {0, 1, 2}           # dense ids in allocation order
    assert int(hta.size(st)) == 3
    # second batch: existing keys keep ids, new keys extend
    st, ids2 = hta.lookup_or_create(st, ids_of(300, 400))
    b = np.asarray(ids2)
    assert b[0] == a[3]
    assert b[1] == 3
    assert int(hta.size(st)) == 4
    # read-only lookup
    assert np.asarray(hta.lookup(st, ids_of(200, 999)))[1] == -1


def test_hash_table_admission():
    st = hta.create(256, admit=CBFFilter(filter_freq=2, max_element_size=1000))
    admit = CBFFilter(filter_freq=2, max_element_size=1000)
    st, ids = hta.lookup_or_create(st, ids_of(7), admit=admit)
    assert int(ids[0]) == -1                 # first sighting: not admitted
    st, ids = hta.lookup_or_create(st, ids_of(7), admit=admit)
    assert int(ids[0]) >= 0                  # second: admitted


def test_tensible_gather_scatter_grow_apply():
    st = hta.create(64)
    st, ids = hta.lookup_or_create(st, ids_of(5, 6, 7))
    t = hta.tensible(8, (4,), init=0.0)
    rows = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    t = hta.scatter(t, ids, rows)
    np.testing.assert_allclose(np.asarray(hta.gather(t, ids)), np.asarray(rows))
    # -1 reads null row
    np.testing.assert_allclose(
        np.asarray(hta.gather(t, jnp.asarray([-1], jnp.int32)))[0], np.zeros(4))
    # growth keeps rows
    t2 = hta.grow(t, 32)
    np.testing.assert_allclose(np.asarray(hta.gather(t2, ids)), np.asarray(rows))
    # sparse apply (SGD lr 1: rows -= grads)
    opt = sopt.sparse_sgd(1.0)
    slot = opt.init(t2.rows)
    g = jnp.ones((3, 4), jnp.float32)
    t3, _ = hta.apply_sparse(t2, opt, slot, ids, g, jnp.zeros((), jnp.int32))
    np.testing.assert_allclose(np.asarray(hta.gather(t3, ids)),
                               np.asarray(rows) - 1.0)


def test_structured_forward_user_tower_runs_once():
    calls = {"user": 0}

    def user_fn(x):
        calls["user"] += 1          # traced once regardless of item count
        return x * 2.0

    def item_fn(x):
        return x + 1.0

    B, I, D = 4, 6, 8
    u_in = jnp.ones((B, D))
    i_in = jnp.arange(B * I * D, dtype=jnp.float32).reshape(B, I, D)
    out = structured_forward(user_fn, item_fn, dot_head, u_in, i_in)
    assert out.shape == (B, I)
    assert calls["user"] == 1
    expect = np.einsum("bd,bid->bi", np.asarray(u_in) * 2, np.asarray(i_in) + 1)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_api_facade_names():
    cfg, st = dr.get_embedding_variable("e", 8, capacity=256)
    assert st.values.shape == (257, 8)
    mcfg, mst = dr.get_multihash_variable("m", dims=(16, 8), operation="concat",
                                          embedding_dim=8)
    assert sum(t.shape[0] for t in mst.tables) == 24
    (dcfg, dd), dst = dr.get_dynamic_dimension_embedding_variable(
        "d", embedding_block_dimension=4, embedding_block_num=2,
        freq_thresholds=(0, 5), capacity=64)
    assert dst.values.shape == (65, 8)
    ht_state = dr.get_hash_table(128)
    assert int(hta.size(ht_state)) == 0
    cols = dr.shared_embedding_columns(["item", "hist"], 8, "item_space",
                                       max_lengths=[1, 16])
    assert cols[0].categorical.shared_embedding == "item_space"
    c = dr.categorical_column_with_embedding("C1")
    assert c.hash_bucket_size is None
    e = dr.embedding_column(c, 16)
    assert e.dimension == 16
