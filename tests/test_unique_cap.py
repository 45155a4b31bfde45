"""max_unique dedup-width cap semantics (ops/unique.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from deeprec_tpu.ops.unique import unique
from deeprec_tpu.sparse import keys as K


def u64(*vals):
    return K.from_numpy(np.asarray(vals, np.int64))


def test_uncapped_matches_numpy(rng):
    ids_np = rng.integers(0, 50, size=256).astype(np.int64)
    u = unique(K.from_numpy(ids_np))
    ref_u, ref_inv, ref_counts = np.unique(ids_np, return_inverse=True,
                                           return_counts=True)
    assert int(u.n_unique) == ref_u.shape[0]
    got = K.to_numpy(K.Keys(np.asarray(u.ukeys.hi), np.asarray(u.ukeys.lo)))
    got_inv = np.asarray(u.inverse)
    np.testing.assert_array_equal(got[got_inv], ids_np)
    # counts per group match
    for i, key in enumerate(ref_u):
        gi = np.nonzero(got == key)[0][0]
        assert np.asarray(u.counts)[gi] == ref_counts[i]


def test_capped_width_and_overflow_group(rng):
    ids_np = rng.integers(0, 100, size=128).astype(np.int64)
    mu = 16
    u = unique(K.from_numpy(ids_np), max_unique=mu)
    assert u.ukeys.hi.shape == (mu + 1,)
    assert u.counts.shape == (mu + 1,)
    assert u.inverse.shape == (128,)
    assert int(u.inverse.max()) <= mu
    # kept groups reconstruct their inputs; overflow ids map to group mu
    got = K.to_numpy(K.Keys(np.asarray(u.ukeys.hi), np.asarray(u.ukeys.lo)))
    inv = np.asarray(u.inverse)
    kept = inv < mu
    np.testing.assert_array_equal(got[inv[kept]], ids_np[kept])
    assert (got[mu] == -1)  # overflow group is the EMPTY/null group
    assert int(np.asarray(u.counts)[mu]) == 0  # overflow takes no updates
    # saturation observable
    assert int(u.n_unique) <= mu


def test_cap_no_op_when_large_enough(rng):
    ids_np = rng.integers(0, 8, size=64).astype(np.int64)
    a = unique(K.from_numpy(ids_np))
    b = unique(K.from_numpy(ids_np), max_unique=32)
    # same groups in the kept region
    inv_a, inv_b = np.asarray(a.inverse), np.asarray(b.inverse)
    ka = K.to_numpy(K.Keys(np.asarray(a.ukeys.hi), np.asarray(a.ukeys.lo)))
    kb = K.to_numpy(K.Keys(np.asarray(b.ukeys.hi), np.asarray(b.ukeys.lo)))
    np.testing.assert_array_equal(ka[inv_a], kb[inv_b])
    assert int(a.n_unique) == int(b.n_unique)


def test_padding_goes_to_null(rng):
    ids_np = np.asarray([5, -1, 5, -1, 7], np.int64)
    u = unique(K.from_numpy(ids_np), max_unique=8)
    inv = np.asarray(u.inverse)
    got = K.to_numpy(K.Keys(np.asarray(u.ukeys.hi), np.asarray(u.ukeys.lo)))
    assert got[inv[1]] == -1 and got[inv[3]] == -1
    assert int(u.n_unique) == 2
