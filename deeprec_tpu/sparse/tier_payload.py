"""Full-fidelity row payloads for host-tier demotion / promotion.

One row of a tiered table demotes to the host KV as a single float32
vector::

    [ values (dim incl. fused slot cols) | freq | version | create_step |
      flattened optimizer slot rows ... ]

Integer columns (freq/version/create_step and any integer slot leaves,
e.g. AdagradDecay's ``last_period``) are stored as **bit patterns**
(``.view(float32)``), not value casts — versions are global steps and must
survive month-long runs past 2^24 exactly (the reference's multi-tier
storage keeps the full ValuePtr row — values, meta and slots — across
DRAM/PMEM placements: embedding/value_ptr.h:141, embedding_var.h:221
GetSnapshot walks the kv regardless of tier).

This module is the SINGLE definition of the payload layout, shared by
``train.tiered_trainer.TieredTrainer`` (local) and
``parallel.tiered.TieredShardedTrainer`` (per-shard inside shard_map), so
the two tier paths cannot diverge.
"""
from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import hashtable as ht
from . import keys as K


class SlotLeaf(NamedTuple):
    index: int                 # position in tree_leaves(slot_state)
    width: int                 # flattened per-row width
    shape: Tuple[int, ...]     # per-row shape
    dtype: Any                 # leaf dtype


class PayloadSpec(NamedTuple):
    dim: int                   # values row width (incl. fused slot columns)
    slot_rows: Tuple[SlotLeaf, ...]
    width: int                 # total payload width


def slot_row_leaves(slot_state, cap1: int) -> List[SlotLeaf]:
    """Row-shaped slot leaves (leading dim == cap1, or S*cap1 for stacked
    sharded state when ``cap1`` is passed as S*(cap+1))."""
    leaves = jax.tree_util.tree_leaves(slot_state)
    out = []
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap1:
            w = int(np.prod(leaf.shape[1:], dtype=np.int64)) if leaf.ndim > 1 else 1
            out.append(SlotLeaf(i, w, tuple(leaf.shape[1:]), leaf.dtype))
    return out


def spec(values_width: int, slot_state, cap1: int) -> PayloadSpec:
    rows = tuple(slot_row_leaves(slot_state, cap1))
    return PayloadSpec(values_width, rows,
                       values_width + 3 + sum(r.width for r in rows))


def _to_f32_bits(arr: np.ndarray) -> np.ndarray:
    """Lossless mapping into the f32 payload: floats cast, ints bit-cast."""
    if arr.dtype.kind in "iu":
        return np.ascontiguousarray(arr.astype(np.int32)).view(np.float32)
    return arr.astype(np.float32)


def pack_np(spec_: PayloadSpec, idx: np.ndarray, values_np: np.ndarray,
            freqs_np: np.ndarray, versions_np: np.ndarray,
            create_steps_np: np.ndarray, slot_leaves_np) -> np.ndarray:
    """Host-side packing of the selected rows ``idx`` into [n, width] f32.

    ``slot_leaves_np``: full list of tree_leaves arrays (per-shard view, so
    row-shaped leaves have leading dim cap1)."""
    dim = spec_.dim
    n = idx.shape[0]
    payload = np.zeros((n, spec_.width), np.float32)
    payload[:, :dim] = values_np[idx].astype(np.float32)
    payload[:, dim] = _to_f32_bits(np.asarray(freqs_np)[idx])
    payload[:, dim + 1] = _to_f32_bits(np.asarray(versions_np)[idx])
    payload[:, dim + 2] = _to_f32_bits(np.asarray(create_steps_np)[idx])
    o = dim + 3
    for sl in spec_.slot_rows:
        part = np.asarray(slot_leaves_np[sl.index])[idx].reshape(n, -1)
        payload[:, o:o + sl.width] = _to_f32_bits(part)
        o += sl.width
    return payload


def _from_f32_bits(col: jax.Array, dtype) -> jax.Array:
    """Traced inverse of :func:`_to_f32_bits`."""
    if jnp.issubdtype(dtype, jnp.integer):
        return jax.lax.bitcast_convert_type(col, jnp.int32).astype(dtype)
    return col.astype(dtype)


def scatter(bundle, cfg, spec_: PayloadSpec, keys: K.Keys,
            payload: jax.Array):
    """Traced promotion: insert ``keys`` into the (local) table bundle and
    scatter the payload rows into values/meta/slot stores with full
    fidelity. Returns ``(bundle, live)`` where ``live`` marks rows the
    index actually placed (a near-full table can refuse — callers must NOT
    erase refused rows from the host tier)."""
    st = bundle.ev
    cap = cfg.capacity
    dim = spec_.dim
    index, slots, _created = ht.lookup_or_insert(st.index, keys,
                                                 cfg.max_probes)
    live = ~K.is_empty(keys) & (slots != cap)
    dest = jnp.where(live, slots, cap + 1)  # OOB -> dropped; unique
    values = st.values.at[dest].set(
        payload[:, :dim].astype(st.values.dtype), mode="drop",
        unique_indices=True)
    freqs = st.freqs.at[dest].set(
        _from_f32_bits(payload[:, dim], jnp.int32), mode="drop",
        unique_indices=True)
    versions = st.versions.at[dest].set(
        _from_f32_bits(payload[:, dim + 1], jnp.int32), mode="drop",
        unique_indices=True)
    create_steps = st.create_steps.at[dest].set(
        _from_f32_bits(payload[:, dim + 2], jnp.int32), mode="drop",
        unique_indices=True)
    o = dim + 3
    leaves = list(jax.tree_util.tree_leaves(bundle.slot))
    treedef = jax.tree_util.tree_structure(bundle.slot)
    n = keys.shape[0]
    for sl in spec_.slot_rows:
        part = payload[:, o:o + sl.width]
        part = _from_f32_bits(part, sl.dtype).reshape((n,) + sl.shape)
        leaves[sl.index] = leaves[sl.index].at[dest].set(
            part, mode="drop", unique_indices=True)
        o += sl.width
    slot = jax.tree_util.tree_unflatten(treedef, leaves)
    return bundle._replace(
        ev=st._replace(index=index, values=values, freqs=freqs,
                       versions=versions, create_steps=create_steps),
        slot=slot), live
