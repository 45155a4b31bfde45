"""Round-2 hardening: slot-init fills through rebuilds, full-fidelity tier
payloads (bit-pattern ints), probe-bound claims, checkpoint crash windows."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import deeprec_tpu as dr
from deeprec_tpu import feature_column as fc
from deeprec_tpu.config import (CounterFilter, EmbeddingVariableConfig,
                                Initializer)
from deeprec_tpu.optim import sparse as sopt
from deeprec_tpu.sparse import embedding_var as ev
from deeprec_tpu.sparse import hashtable as ht
from deeprec_tpu.sparse import keys as K
from deeprec_tpu.sparse import tier_payload as TP


# ---------------------------------------------------------------------------
# permute_slot_state fills


def test_permute_slot_state_refills_with_optimizer_init():
    opt = sopt.sparse_adagrad(0.1, initial_accumulator_value=0.1)
    values = jnp.zeros((9, 4))  # cap = 8
    slot = opt.init(values)
    # rebuild that drops every old row: all new rows must hold the init fill
    old_to_new = jnp.full((8,), 18, jnp.int32)  # OOB of new cap 16
    new_slot = sopt.permute_slot_state(slot, old_to_new, 16, fills=opt.fills)
    assert new_slot["acc"].shape == (17, 4)
    np.testing.assert_allclose(np.asarray(new_slot["acc"]), 0.1)


def test_permute_slot_state_fills_structure_all_optimizers():
    """fills must be a structural match of init for every registered
    optimizer (tree_map over both would otherwise throw)."""
    values = jnp.zeros((5, 4))
    old_to_new = jnp.full((4,), 10, jnp.int32)
    for name, ctor in sopt.REGISTRY.items():
        opt = ctor()
        slot = opt.init(values)
        out = sopt.permute_slot_state(slot, old_to_new, 8, fills=opt.fills)
        # row leaves resized; scalar leaves untouched
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1:
                assert leaf.shape[0] == 9


def _mk_coll(capacity=64, filter_freq=0, dim=4):
    cols = [fc.EmbeddingColumn(fc.CategoricalColumn("C1"), dim)]
    kw = {}
    if filter_freq:
        kw["counter_filter"] = CounterFilter(filter_freq=filter_freq)
    return fc.EmbeddingCollection(
        cols, name="t", capacity=capacity,
        initializer=Initializer("normal", scale=0.1), **kw)


def test_grow_then_late_admission_zero_grad_is_finite():
    """The NaN-poisoning repro: grow vacates nothing but new rows are
    fill-initialised; a CounterFilter key created post-grow is admitted on
    its SECOND lookup (created=False then), so only the array fill protects
    its accumulator. A zero gradient must not write NaN."""
    coll = _mk_coll(capacity=64, filter_freq=2)
    opt = sopt.sparse_adagrad(0.1, initial_accumulator_value=0.1)
    state = coll.init()
    slot = coll.init_slot(opt, state)
    step = jnp.zeros((), jnp.int32)

    # fill past the growth threshold
    ids = {"C1": np.arange(1, 60, dtype=np.int64)}
    state, aux = coll.lookup_or_create(state, ids, step)
    assert coll.needs_growth(state)
    state, slot = coll.grow_state(state, slot, opt=opt)

    # a brand-new key: first lookup creates (not admitted), second admits
    nid = {"C1": np.asarray([777777], np.int64)}
    state, aux = coll.lookup_or_create(state, nid, step)
    state, aux = coll.lookup_or_create(state, nid, step)
    a = aux.ev_aux
    assert bool(a.admitted[np.asarray(a.uniq.inverse)[0]])
    urows = coll.rows_for_training(state, aux)
    state, slot = coll.apply_gradients(
        state, opt, slot, aux, jnp.zeros_like(urows), step, urows=urows)
    assert np.isfinite(np.asarray(state.values)).all()
    assert np.isfinite(np.asarray(slot["acc"])).all()
    # the admitted row's accumulator is exactly the init (zero grad added 0)
    slot_idx = int(np.asarray(a.slots)[np.asarray(a.uniq.inverse)[0]])
    np.testing.assert_allclose(np.asarray(slot["acc"])[slot_idx], 0.1)


# ---------------------------------------------------------------------------
# tier payload fidelity


def test_tier_payload_bitpattern_roundtrip():
    """freq/version/create_step and integer slot leaves survive the f32
    payload exactly, including values far above 2^24."""
    from deeprec_tpu.train.trainer import TableBundle

    cfg = EmbeddingVariableConfig(name="t", embedding_dim=4, capacity=32,
                                  lazy_init=False)
    opt = sopt.sparse_adagrad_decay(0.1)
    state = ev.create(cfg)
    slot = opt.init(state.values)
    keys = K.from_numpy(np.asarray([11, 22, 33], np.int64))
    state, aux = ev.lookup_or_create(state, cfg, keys, jnp.int32(0))

    big = np.int32(2**24 + 12345)  # not representable in f32 by value
    state = state._replace(
        versions=state.versions.at[aux.slots].set(big, mode="drop"),
        freqs=state.freqs.at[aux.slots].set(big + 1, mode="drop"),
        create_steps=state.create_steps.at[aux.slots].set(big + 2, mode="drop"))
    slot = dict(slot)
    slot["last_period"] = slot["last_period"].at[aux.slots].set(
        big + 3, mode="drop")
    bundle = TableBundle(ev=state, slot=slot)

    spec = TP.spec(state.values.shape[1], slot, cfg.capacity + 1)
    idx = np.asarray(aux.slots)[:3]
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(slot)]
    payload = TP.pack_np(spec, idx, np.asarray(state.values),
                         np.asarray(state.freqs), np.asarray(state.versions),
                         np.asarray(state.create_steps), leaves)

    # restore into a FRESH bundle and check exactness
    fresh = ev.create(cfg)
    fresh_bundle = TableBundle(ev=fresh, slot=opt.init(fresh.values))
    out, live = TP.scatter(fresh_bundle, cfg, spec, keys,
                           jnp.asarray(payload))
    assert bool(np.asarray(live).all())
    slots2, found = ht.lookup(out.ev.index, keys, cfg.max_probes)
    assert bool(np.asarray(found).all())
    s2 = np.asarray(slots2)
    np.testing.assert_array_equal(np.asarray(out.ev.versions)[s2], big)
    np.testing.assert_array_equal(np.asarray(out.ev.freqs)[s2], big + 1)
    np.testing.assert_array_equal(np.asarray(out.ev.create_steps)[s2], big + 2)
    np.testing.assert_array_equal(
        np.asarray(out.slot["last_period"])[s2], big + 3)
    np.testing.assert_allclose(np.asarray(out.ev.values)[s2],
                               np.asarray(state.values)[idx])
    np.testing.assert_allclose(np.asarray(out.slot["acc"])[s2],
                               np.asarray(slot["acc"])[idx])


# ---------------------------------------------------------------------------
# hash table probe bound


def test_insert_never_claims_past_probe_bound():
    """Every key the insert placed must be reachable by lookup under the
    same max_probes (the stored-within-bound invariant)."""
    max_probes = 1
    table = ht.create(64)  # nb = 4 buckets of 16
    rng = np.random.default_rng(3)
    keys = K.from_numpy(rng.integers(1, 1 << 60, size=60).astype(np.int64))
    table, slots, created = ht.lookup_or_insert(table, keys, max_probes)
    placed = np.asarray(slots) != 64
    # with max_probes=1 only home buckets fill: expect some overflow
    assert int(np.asarray(table.overflow)[0]) > 0
    slots2, found = ht.lookup(table, keys, max_probes)
    np.testing.assert_array_equal(placed, np.asarray(found))
    np.testing.assert_array_equal(np.asarray(slots)[placed],
                                  np.asarray(slots2)[placed])


# ---------------------------------------------------------------------------
# checkpoint crash window


def test_write_save_crash_between_renames_recovers(tmp_path):
    from deeprec_tpu.checkpoint import format as F

    d = str(tmp_path)
    path = os.path.join(d, F.step_dirname("full", 5))
    F.write_save(path, {"kind": "full", "step": 5, "tables": {}},
                 [np.zeros(2)], {})
    assert len(F.list_saves(d)) == 1
    # simulate the crash window: base renamed aside, tmp never moved in
    os.rename(path, path + ".old.999")
    saves = F.list_saves(d)
    assert len(saves) == 1 and saves[0]["step"] == 5  # recovered from .old

    # a later successful save of the same step supersedes the .old copy
    F.write_save(path, {"kind": "full", "step": 5, "tables": {}},
                 [np.ones(2)], {})
    saves = F.list_saves(d)
    assert len(saves) == 1
    assert saves[0]["path"] == path
