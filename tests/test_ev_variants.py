"""EV variant tests: multi-hash (Q-R), dynamic-dimension, adaptive
embedding — mirroring reference embedding_variable_ops_test.py cases for
MultiHashVariable (add/mul/concat), dynamic-dimension, and the adaptive
column."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu.config import CounterFilter, EmbeddingVariableConfig
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.sparse import adaptive, dynamicdim, embedding_var as ev
from deeprec_tpu.sparse import keys as K
from deeprec_tpu.sparse import multihash as mh


def ids_of(*vals):
    return K.from_numpy(np.asarray(vals, np.int64))


# ---------------------------------------------------------------------------
# Multi-hash


@pytest.mark.parametrize("combiner", ["add", "mult", "concat"])
def test_multihash_lookup_shapes_and_padding(combiner):
    cfg = mh.MultiHashConfig(name="m", embedding_dim=8,
                             table_sizes=(16, 8), combiner=combiner)
    st = mh.create(cfg)
    ids = ids_of(3, 3, 99, -1, 2**40 + 5)
    out = mh.lookup(st, cfg, ids)
    assert out.shape == (5, 8)
    np.testing.assert_array_equal(np.asarray(out[3]), np.zeros(8))  # padding
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))
    # distinct ids map to distinct combinations (w.h.p.)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[2]))


def test_multihash_memory_is_compositional():
    """Q*R id space covered by Q+R rows."""
    cfg = mh.MultiHashConfig(name="m", embedding_dim=4, table_sizes=(64, 32))
    st = mh.create(cfg)
    n_rows = sum(t.shape[0] for t in st.tables)
    assert n_rows == 96  # not 2048
    ids = ids_of(*range(0, 2048, 37))
    out = mh.lookup(st, cfg, ids)
    # rows are (almost) pairwise distinct thanks to the complementary parts
    flat = np.asarray(out)
    assert len(np.unique(flat.round(6), axis=0)) > 50


@pytest.mark.parametrize("combiner", ["add", "concat", "mult"])
def test_multihash_training_reduces_loss(combiner):
    cfg = mh.MultiHashConfig(name="m", embedding_dim=8,
                             table_sizes=(32, 16), combiner=combiner,
                             initializer_scale=0.3)
    st = mh.create(cfg)
    opt = sopt.sparse_adagrad(0.5)
    slots = mh.init_slots(st, opt)
    ids = ids_of(*range(20))
    target = jnp.asarray(np.random.default_rng(0).normal(size=(20, 8)),
                         jnp.float32)

    def loss_fn(st):
        out = mh.lookup(st, cfg, ids)
        return jnp.mean((out - target) ** 2)

    l0 = float(loss_fn(st))
    step = jnp.zeros((), jnp.int32)
    for i in range(60):
        out = mh.lookup(st, cfg, ids)
        g_out = 2.0 * (out - target) / out.size
        # route the cotangent through apply_gradients (the sparse path)
        st, slots = mh.apply_gradients(st, cfg, opt, slots, ids, g_out, step)
        step = step + 1
    l1 = float(loss_fn(st))
    assert l1 < l0 * 0.5, (l0, l1)


def test_multihash_grad_equivalence_with_autodiff():
    """apply_gradients' per-table grads equal autodiff grads wrt tables."""
    cfg = mh.MultiHashConfig(name="m", embedding_dim=6, table_sizes=(8, 4),
                             combiner="mult")
    st = mh.create(cfg)
    ids = ids_of(1, 5, 5, 9)
    g_out = jnp.asarray(np.random.default_rng(1).normal(size=(4, 6)),
                        jnp.float32)

    def scalar(st):
        return jnp.sum(mh.lookup(st, cfg, ids) * g_out)

    auto = jax.grad(scalar)(st)
    opt = sopt.sparse_sgd(1.0)  # SGD: new = cur - g  => delta == -grad
    slots = mh.init_slots(st, opt)
    st2, _ = mh.apply_gradients(st, cfg, opt, slots, ids, g_out,
                                jnp.zeros((), jnp.int32))
    for t_new, t_old, t_auto in zip(st2.tables, st.tables, auto.tables):
        np.testing.assert_allclose(np.asarray(t_old - t_new),
                                   np.asarray(t_auto), atol=1e-5)


# ---------------------------------------------------------------------------
# Dynamic dimension


def test_dynamicdim_blocks_activate_with_frequency():
    dd = dynamicdim.DynamicDimConfig(block_num=3, block_dim=4,
                                     freq_thresholds=(0, 3, 6))
    cfg = dynamicdim.ev_config("d", dd, capacity=64, lazy_init=False,
                               initializer=dr.Initializer("constant", constant=1.0))
    st = ev.create(cfg)
    ids = ids_of(42)
    step = jnp.zeros((), jnp.int32)
    widths = []
    for i in range(7):
        st, aux = ev.lookup_or_create(st, cfg, ids, step + i)
        rows = dynamicdim.gather(st, dd, aux)
        active = int(np.sum(np.asarray(rows[0]) != 0.0))
        widths.append(active)
    # freq counts: 1,2,3,...,7 -> widths 4,4,8,8,8,12,12
    assert widths == [4, 4, 8, 8, 8, 12, 12], widths


def test_dynamicdim_masked_blocks_get_no_gradient():
    dd = dynamicdim.DynamicDimConfig(block_num=2, block_dim=3,
                                     freq_thresholds=(0, 100))
    cfg = dynamicdim.ev_config("d", dd, capacity=64, lazy_init=False)
    st = ev.create(cfg)
    ids = ids_of(7, 8)
    st, aux = ev.lookup_or_create(st, cfg, ids, jnp.zeros((), jnp.int32))

    def loss(values):
        rows = values[aux.slots] * dynamicdim.block_mask(dd, st.freqs[aux.slots])
        return jnp.sum(rows ** 2) + jnp.sum(rows)

    g = jax.grad(loss)(st.values)
    g_rows = np.asarray(g[np.asarray(aux.slots)[:2]])
    assert np.any(g_rows[:, :3] != 0)      # active block trains
    np.testing.assert_array_equal(g_rows[:, 3:], 0.0)  # masked block frozen


# ---------------------------------------------------------------------------
# Adaptive embedding


def make_adaptive(filter_freq=3, buckets=8, dim=4, capacity=64):
    cfg = EmbeddingVariableConfig(
        name="a", embedding_dim=dim, capacity=capacity,
        counter_filter=CounterFilter(filter_freq=filter_freq),
        initializer=dr.Initializer("normal", scale=0.1))
    return cfg, adaptive.create(cfg, buckets)


def test_adaptive_routes_tail_to_static_bucket():
    cfg, st = make_adaptive()
    ids = ids_of(5, 6, 7)
    st, aux = adaptive.lookup_or_create(st, cfg, ids, jnp.zeros((), jnp.int32))
    rows = adaptive.gather(st, cfg, aux)
    # freq=1 < 3: all non-admitted -> static bucket rows (non-zero, shared)
    assert not bool(aux.admitted.any())
    b = adaptive.bucket_of(aux.uniq.ukeys, st.static.shape[0] - 1)
    np.testing.assert_allclose(np.asarray(rows),
                               np.asarray(st.static)[np.asarray(b)], atol=1e-6)


def test_adaptive_migration_seeds_ev_from_bucket():
    cfg, st = make_adaptive(filter_freq=2)
    ids = ids_of(11)
    step = jnp.zeros((), jnp.int32)
    st, aux = adaptive.lookup_or_create(st, cfg, ids, step)       # freq 1
    bucket_row = np.asarray(adaptive.gather(st, cfg, aux))[0]
    st, aux = adaptive.lookup_or_create(st, cfg, ids, step + 1)   # freq 2: admitted
    assert bool(aux.admitted[0])
    ev_row = np.asarray(adaptive.gather(st, cfg, aux))[0]
    np.testing.assert_allclose(ev_row, bucket_row, atol=1e-6)  # warm start


def test_adaptive_training_updates_right_table():
    cfg, st = make_adaptive(filter_freq=100)  # never admit: tail-only
    opt = sopt.sparse_sgd(1.0)
    slot = opt.init(st.ev.values)
    sopt_static = sopt.sparse_sgd(1.0)
    static_slot = sopt_static.init(st.static)
    ids = ids_of(1, 2, 3, 1)
    step = jnp.zeros((), jnp.int32)
    st, aux = adaptive.lookup_or_create(st, cfg, ids, step)
    g = jnp.ones((ids.shape[0], cfg.embedding_dim), jnp.float32)
    # cotangent per unique key (dup id 1 counted twice)
    gu = jax.ops.segment_sum(g, aux.uniq.inverse, ids.shape[0])
    before = np.asarray(st.static).copy()
    ev_before = np.asarray(st.ev.values).copy()
    st, slot, static_slot = adaptive.apply_gradients(
        st, cfg, opt, slot, sopt_static, static_slot, aux, gu, step)
    after = np.asarray(st.static)
    changed = np.nonzero(np.any(before != after, axis=1))[0]
    assert 1 <= len(changed) <= 3          # only touched buckets moved
    # EV values untouched (nothing admitted)
    np.testing.assert_allclose(np.asarray(st.ev.values), ev_before)
