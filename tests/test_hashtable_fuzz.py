"""Hash-table fuzz: random batched insert/lookup/rebuild sequences checked
against a python dict oracle (the multithreaded stress analog of the
reference's TestFeatureFilterParallel, embedding_variable_ops_test.cc)."""
import numpy as np

import jax.numpy as jnp

from deeprec_tpu.sparse import hashtable as ht
from deeprec_tpu.sparse import keys as K


def keys64(arr):
    return K.from_numpy(np.asarray(arr, np.int64))


def stored_set(table):
    hi = np.asarray(table.key_hi).astype(np.int64)
    lo = np.asarray(table.key_lo).astype(np.uint32).astype(np.int64)
    k = (hi << 32) | lo
    return set(k[k != -1].tolist())


def test_fuzz_against_dict_oracle(rng):
    cap = 1 << 12
    table = ht.create(cap)
    oracle = {}  # key -> slot
    key_space = rng.integers(-2**62, 2**62, size=3000, dtype=np.int64)
    key_space = key_space[key_space != -1]

    for round_i in range(25):
        batch = rng.choice(key_space, size=256, replace=True)
        # sprinkle padding
        batch[rng.random(256) < 0.05] = -1
        uniq = np.unique(batch)
        table, slots, created = ht.lookup_or_insert(table, keys64(uniq))
        slots = np.asarray(slots)
        created = np.asarray(created)
        for i, k in enumerate(uniq.tolist()):
            if k == -1:
                assert slots[i] == cap
                continue
            if k in oracle:
                assert not created[i], (round_i, k)
                assert slots[i] == oracle[k], "slot moved without rebuild"
            else:
                assert created[i], (round_i, k)
                assert 0 <= slots[i] < cap
                oracle[k] = int(slots[i])
        # no two keys share a slot
        assert len(set(oracle.values())) == len(oracle)
        # lookup agrees for a random probe set incl. absent keys
        probes = np.concatenate([
            rng.choice(list(oracle.keys()) or [0], size=64),
            rng.integers(-2**62, 2**62, size=64, dtype=np.int64)])
        pslots, pfound = ht.lookup(table, keys64(probes))
        pslots, pfound = np.asarray(pslots), np.asarray(pfound)
        for j, k in enumerate(probes.tolist()):
            if k in oracle:
                assert pfound[j] and pslots[j] == oracle[k]
            else:
                assert not pfound[j] and pslots[j] == cap

        if round_i % 7 == 6:
            # rebuild keeping a random subset (eviction analog)
            keep_np = rng.random(cap) < 0.8
            table, old_to_new = ht.rebuild(table, jnp.asarray(keep_np))
            old_to_new = np.asarray(old_to_new)
            new_oracle = {}
            for k, s in oracle.items():
                if keep_np[s]:
                    assert old_to_new[s] <= cap
                    new_oracle[k] = int(old_to_new[s])
                else:
                    assert old_to_new[s] == cap + 1  # dropped marker
            oracle = new_oracle
            assert stored_set(table) == set(oracle.keys())

    assert int(np.asarray(table.size).sum()) == len(oracle)
    assert int(np.asarray(table.overflow).sum()) == 0


def test_fuzz_high_load_overflow_accounting(rng):
    """Push the table past comfortable load: overflow is counted, stored
    keys stay findable, and no key is double-stored."""
    cap = 256
    table = ht.create(cap)
    inserted = set()
    for _ in range(8):
        batch = np.unique(rng.integers(0, 1 << 40, size=96, dtype=np.int64))
        table, slots, created = ht.lookup_or_insert(table, keys64(batch))
        slots = np.asarray(slots)
        for i, k in enumerate(batch.tolist()):
            if slots[i] < cap:
                inserted.add(k)
    stored = stored_set(table)
    assert stored <= inserted or stored == inserted
    assert len(stored) == int(np.asarray(table.size).sum())
    assert len(stored) <= cap
    # all stored keys resolve
    arr = np.asarray(sorted(stored), np.int64)
    _, found = ht.lookup(table, keys64(arr))
    assert np.asarray(found).all()
