"""unique_cols (column-parallel dedup) must match unique(flat) exactly in
its observable contract: ukeys[inverse] reproduces the inputs, per-key
counts agree, no duplicate live groups, overflow collapses to the null
group."""
import numpy as np
import pytest

import jax.numpy as jnp

from deeprec_tpu.ops.unique import unique, unique_cols
from deeprec_tpu.sparse import keys as K


def _keys2d(arr):
    hi, lo = K.split_np(arr)
    return K.Keys(jnp.asarray(hi), jnp.asarray(lo))


def _check_equivalent(arr, max_unique=None):
    W, B = arr.shape
    u_flat = unique(_keys2d(arr).reshape(-1), max_unique)
    u_cols = unique_cols(_keys2d(arr), max_unique)

    assert int(u_flat.n_unique) == int(u_cols.n_unique)

    for u in (u_flat, u_cols):
        uk = K.to_numpy(K.Keys(np.asarray(u.ukeys.hi), np.asarray(u.ukeys.lo)))
        inv = np.asarray(u.inverse)
        cnt = np.asarray(u.counts)
        live = uk != -1  # EMPTY sentinel packs to -1
        # no duplicate live groups (the invariant scatters rely on)
        assert len(np.unique(uk[live])) == live.sum()
        flat = arr.reshape(-1)
        # every routed input resolves to its own key
        routed = uk[inv] != -1
        np.testing.assert_array_equal(flat[routed & (flat != -1)],
                                      uk[inv][routed & (flat != -1)])
        # counts per key agree with true multiplicities (for routed keys)
        true = {}
        for k in flat[flat != -1]:
            true[k] = true.get(k, 0) + 1
        for g in np.nonzero(live)[0]:
            assert cnt[g] == true[uk[g]], (g, uk[g])

    # identical key->count maps between the two
    def kmap(u):
        uk = K.to_numpy(K.Keys(np.asarray(u.ukeys.hi), np.asarray(u.ukeys.lo)))
        cnt = np.asarray(u.counts)
        return {k: c for k, c in zip(uk.tolist(), cnt.tolist()) if k != -1}

    assert kmap(u_flat) == kmap(u_cols)


def test_unique_cols_matches_flat_random():
    rng = np.random.default_rng(0)
    # per-column disjoint spaces (the eligibility precondition)
    arr = np.stack([rng.integers(0, 50, 64) + (c << 33)
                    for c in range(6)]).astype(np.int64)
    _check_equivalent(arr)


def test_unique_cols_with_empty_keys():
    rng = np.random.default_rng(1)
    arr = np.stack([rng.integers(1, 30, 32) + (c << 33)
                    for c in range(4)]).astype(np.int64)
    arr[arr % 5 == 0] = -1  # EMPTY padding scattered through
    _check_equivalent(arr)


def test_unique_cols_overflow_reads_null_group():
    rng = np.random.default_rng(2)
    arr = np.stack([rng.integers(0, 1 << 40, 128) + (c << 50)
                    for c in range(4)]).astype(np.int64)  # ~all unique
    mu = 64  # far below the ~512 uniques
    u = unique_cols(_keys2d(arr), mu)
    uk_hi = np.asarray(u.ukeys.hi)
    assert u.ukeys.hi.shape[0] == mu + 1
    inv = np.asarray(u.inverse)
    # overflowed inputs point at the null group (EMPTY key -> null row)
    over = inv == mu
    assert over.sum() > 0
    assert int(np.asarray(u.n_unique)) <= mu
    # routed inputs still resolve to their own key
    uk = K.to_numpy(K.Keys(np.asarray(u.ukeys.hi), np.asarray(u.ukeys.lo)))
    flat = arr.reshape(-1)
    routed = ~over
    np.testing.assert_array_equal(flat[routed], uk[inv][routed])


def test_unique_cols_single_repeated_key_per_column():
    arr = np.stack([np.full(16, 7 + (c << 33)) for c in range(3)]).astype(np.int64)
    u = unique_cols(_keys2d(arr), 8)
    assert int(u.n_unique) == 3
    cnt = np.asarray(u.counts)
    assert sorted(cnt[cnt > 0].tolist()) == [16, 16, 16]
