"""64-bit feature-key handling on TPU.

DeepRec's EmbeddingVariable is keyed by int64 feature ids
(reference: tensorflow/core/framework/embedding/embedding_var.h:51,
tensorflow/python/ops/kv_variable_ops.py:44). TPUs emulate int64, so we
represent a key as a pair of int32 planes ``(hi, lo)`` — all hashing,
comparison and sorting operate on the two planes. 32-bit workloads simply
carry a zero ``hi`` plane (4 bytes/row of overhead, negligible next to the
embedding row itself).

A ``Keys`` value is a NamedTuple of equally-shaped int32 arrays and is a
pytree, so it can flow through jit/shard_map/all_to_all like any array.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Keys(NamedTuple):
    """A batch of 64-bit keys stored as two int32 planes."""

    hi: jax.Array  # int32
    lo: jax.Array  # int32

    @property
    def shape(self):
        return self.lo.shape

    def __len__(self):
        return self.lo.shape[0]

    def reshape(self, *shape) -> "Keys":
        return Keys(self.hi.reshape(*shape), self.lo.reshape(*shape))

    def __getitem__(self, idx) -> "Keys":
        return Keys(self.hi[idx], self.lo[idx])


# Reserved sentinel: the all-ones key (== int64 -1). DeepRec likewise uses -1
# as the invalid key for EV (kv_variable_ops.py `invalid_key`).
EMPTY_HI = np.int32(-1)
EMPTY_LO = np.int32(-1)


def split_np(ids: "np.ndarray"):
    """int64 numpy -> (hi, lo) int32 numpy planes — the one key encoding;
    every host-side consumer (packing, sharded batch assembly) must use
    this so keys route identically everywhere."""
    a = np.asarray(ids, dtype=np.int64)
    lo = (a & np.int64(0xFFFFFFFF)).astype(np.uint32).astype(np.int32)
    hi = (a >> np.int64(32)).astype(np.int32)
    return hi, lo


def from_numpy(ids) -> Keys:
    """Split an int64 numpy array (or python ints) into (hi, lo) planes."""
    hi, lo = split_np(ids)
    return Keys(jnp.asarray(hi), jnp.asarray(lo))


def from_int32(ids) -> Keys:
    """Lift int32 ids (non-negative or arbitrary) into Keys with hi=0.

    Note: this is a raw reinterpretation for speed — int32 id ``x`` maps to
    the 64-bit key ``uint32(x)``. Use :func:`from_numpy` for true sign
    extension of negative ids.
    """
    lo = jnp.asarray(ids, dtype=jnp.int32)
    return Keys(jnp.zeros_like(lo), lo)


def to_numpy(keys: Keys) -> np.ndarray:
    hi = np.asarray(keys.hi).astype(np.int64)
    lo = np.asarray(keys.lo).astype(np.uint32).astype(np.int64)
    return (hi << np.int64(32)) | lo


def empty_like(shape) -> Keys:
    return Keys(jnp.full(shape, EMPTY_HI, jnp.int32), jnp.full(shape, EMPTY_LO, jnp.int32))


def eq(a: Keys, b: Keys) -> jax.Array:
    return (a.hi == b.hi) & (a.lo == b.lo)


def is_empty(a: Keys) -> jax.Array:
    return (a.hi == EMPTY_HI) & (a.lo == EMPTY_LO)


def where(pred: jax.Array, a: Keys, b: Keys) -> Keys:
    return Keys(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def concat(parts, axis=0) -> Keys:
    return Keys(
        jnp.concatenate([p.hi for p in parts], axis=axis),
        jnp.concatenate([p.lo for p in parts], axis=axis),
    )


def _u32(x) -> jax.Array:
    return x.astype(jnp.uint32)


def hash32(keys: Keys, seed: int = 0) -> jax.Array:
    """Murmur3-style finalizer mix of the two planes -> uint32 hash."""
    h = _u32(keys.lo) ^ (_u32(keys.hi) * np.uint32(0x85EBCA6B)) ^ np.uint32(seed * 0x9E3779B9 & 0xFFFFFFFF)
    h ^= h >> 16
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> 13
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h


def hash32_np(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Numpy mirror of :func:`hash32` over int64 ids (host-side resharding
    at checkpoint restore must route keys exactly like the device does)."""
    a = np.asarray(ids, dtype=np.int64)
    lo = (a & np.int64(0xFFFFFFFF)).astype(np.uint32)
    hi = (a >> np.int64(32)).astype(np.int64).astype(np.uint32)
    with np.errstate(over="ignore"):
        h = lo ^ (hi * np.uint32(0x85EBCA6B)) ^ np.uint32((seed * 0x9E3779B9) & 0xFFFFFFFF)
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


def mod(keys: Keys, n: int) -> jax.Array:
    """``key % n`` over the full 64-bit value (non-negative result).

    Used for the EV default-value-matrix index (docs/Embedding-Variable.md
    default_value_dim semantics) and mod-sharding across table shards
    (reference embedding_var.h:196-199).
    """
    n = np.int32(n)
    # (hi*2^32 + lo) % n == ((hi % n) * (2^32 % n) + lo % n) % n, all in int64-free math.
    two32_mod = np.int32((1 << 32) % int(n))
    lo_u = _u32(keys.lo)
    lo_mod = (lo_u % _u32(n)).astype(jnp.int32)
    hi_mod = jnp.remainder(keys.hi, n)  # python-style, non-negative
    return jnp.remainder(hi_mod * two32_mod + lo_mod, n)


def sort_with(keys: Keys, *payloads) -> Tuple[Keys, tuple]:
    """Lexicographic sort by (hi, lo); payloads carried along."""
    out = jax.lax.sort((keys.hi, keys.lo) + tuple(payloads), num_keys=2)
    return Keys(out[0], out[1]), tuple(out[2:])


def random_uniform_bits(keys: Keys, salt: jax.Array, n_cols: int) -> jax.Array:
    """Deterministic per-key random bits: shape keys.shape + (n_cols,), uint32.

    A small counter-based hash (not crypto): each column mixes the key planes
    with the column index and a salt. Used for key-deterministic row
    initialisation so restores/resharding reproduce identical init values.
    """
    col = jax.lax.broadcasted_iota(jnp.uint32, keys.shape + (n_cols,), len(keys.shape))
    h = _u32(keys.lo)[..., None] ^ (_u32(keys.hi)[..., None] * np.uint32(0x9E3779B1))
    h = h ^ (col * np.uint32(0x85EBCA77)) ^ _u32(jnp.asarray(salt, jnp.int32))
    for c in (np.uint32(0xCC9E2D51), np.uint32(0x1B873593), np.uint32(0xE6546B64)):
        h ^= h >> 15
        h = h * c
    h ^= h >> 13
    h = h * np.uint32(0xC2B2AE3D)
    h ^= h >> 16
    return h
