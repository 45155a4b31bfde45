"""On-disk checkpoint layout.

TPU-native rebuild of DeepRec's EV-aware checkpoint format: a full
checkpoint stores, per table, the same 4 logical tensors the reference's
``EmbeddingVariableSaveable`` emits — ``-keys``, ``-values``, ``-versions``,
``-freqs`` (reference: tensorflow/python/training/saving/
saveable_object_util.py:169-172, kernels/kv_variable_ops.h:149
DumpEmbeddingValues) — plus optimizer slot rows (slots share row lifetime
with the primary, slot_creator.py:82-115) and creation steps. Incremental
checkpoints store only rows touched since the previous save (reference
IncrSave, core/kernels/incr_save_restore_ops.cc:112).

Layout (one directory per save):

    <dir>/full-00000100/
        manifest.json          # kind/step/tables/time
        dense.npz              # flattened params/opt_state/step leaves
        table-<name>.npz       # keys int64[n], values [n,d], versions[n],
                               # freqs[n], create_steps[n],
                               # slot__<path> row arrays, scalar__<path>
    <dir>/incr-00000130/       # same shape, delta rows only

Restores are **mod-reshard-safe**: rows are routed to shards by the same
key hash the runtime uses (parallel/sharded._owner_of), so the shard count
may change between save and restore — the invariant the reference keeps via
mod-sharded bundle reads (embedding_var.h:196-199).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

MANIFEST = "manifest.json"
DENSE = "dense.npz"


def step_dirname(kind: str, step: int) -> str:
    return f"{kind}-{step:010d}"


def list_saves(directory: str) -> List[Dict[str, Any]]:
    """All complete saves, sorted by step then kind (full first)."""
    out = []
    if not os.path.isdir(directory):
        return out
    names = set(os.listdir(directory))
    for name in names:
        if name.endswith(".tmp"):
            continue  # in-flight save directory
        if ".old." in name:
            # superseded copy — but it is the ONLY copy if a crash hit
            # write_save between its two renames; recover it then
            if name.split(".old.")[0] in names:
                continue
        mpath = os.path.join(directory, name, MANIFEST)
        if not os.path.isfile(mpath):
            continue
        with open(mpath) as f:
            m = json.load(f)
        m["path"] = os.path.join(directory, name)
        out.append(m)
    out.sort(key=lambda m: (m["step"], 0 if m["kind"] == "full" else 1))
    return out


def restore_plan(directory: str) -> Tuple[Optional[Dict], List[Dict]]:
    """(latest full save, incrementals after it in replay order)."""
    saves = list_saves(directory)
    fulls = [m for m in saves if m["kind"] == "full"]
    if not fulls:
        return None, []
    base = fulls[-1]
    incrs = [m for m in saves
             if m["kind"] == "incr" and m["step"] > base["step"]]
    return base, incrs


def write_save(path: str, manifest: Dict[str, Any],
               dense_leaves: List[np.ndarray],
               tables: Dict[str, Dict[str, np.ndarray]],
               part: Optional[int] = None, n_parts: int = 1,
               barrier=None) -> None:
    """Atomic-ish: write into <path>.tmp then rename (manifest last).

    Crash-safety: when ``path`` already exists (re-save of the same step)
    it is renamed aside BEFORE the tmp dir takes its place; if a crash
    lands between the two renames, :func:`list_saves` recovers the
    ``.old.*`` copy (it only skips .old dirs whose base still exists), so
    that step's previously-valid save is never lost. The .old copy is
    deleted here once the new directory's manifest verifies.

    Multi-process saves (``part``/``n_parts``/``barrier`` set): every
    process writes its own ``table-<name>.part<k>.npz`` holding the rows
    of its addressable shards (the per-PS-task bundle shards of the
    reference); process 0 writes dense/manifest and renames, after the
    barrier confirms all parts are on disk. :func:`read_table` merges
    parts transparently."""
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    suffix = "" if part is None else f".part{part:03d}"
    for name, arrays in tables.items():
        np.savez(os.path.join(tmp, f"table-{name}{suffix}.npz"),
                 **_encode_dtypes(arrays))
    primary = part is None or part == 0
    if primary:
        np.savez(os.path.join(tmp, DENSE), **_encode_dtypes(
            {f"d{i:05d}": leaf for i, leaf in enumerate(dense_leaves)}))
    if barrier is not None:
        barrier(f"write_save:{os.path.basename(path)}:parts")
    if primary:
        manifest = dict(manifest, time=time.time(),
                        parts=(1 if part is None else n_parts))
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f)
        old = None
        if os.path.isdir(path):
            old = path + f".old.{os.getpid()}"
            os.rename(path, old)
        os.rename(tmp, path)
        if old is not None and os.path.isfile(os.path.join(path, MANIFEST)):
            import shutil
            shutil.rmtree(old, ignore_errors=True)
    if barrier is not None:
        barrier(f"write_save:{os.path.basename(path)}:done")


# npz cannot represent ml_dtypes (bfloat16) natively: such arrays ride as
# uint16 bit patterns under a name suffix and decode on read.
_BF16 = "__bf16raw"


def _encode_dtypes(arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    import ml_dtypes
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        if v.dtype == ml_dtypes.bfloat16:
            out[k + _BF16] = v.view(np.uint16)
        else:
            out[k] = v
    return out


def _decode_dtypes(arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    import ml_dtypes
    out = {}
    for k, v in arrays.items():
        if k.endswith(_BF16):
            out[k[: -len(_BF16)]] = v.view(ml_dtypes.bfloat16)
        else:
            out[k] = v
    return out


def read_dense(path: str) -> List[np.ndarray]:
    with np.load(os.path.join(path, DENSE)) as z:
        d = _decode_dtypes({k: z[k] for k in z.files})
        return [d[k] for k in sorted(d)]


def read_table(path: str, name: str) -> Dict[str, np.ndarray]:
    """Read one table's arrays; multi-process part files are merged (row
    arrays concatenated, scalars taken from the first part)."""
    single = os.path.join(path, f"table-{name}.npz")
    if os.path.isfile(single):
        with np.load(single) as z:
            return _decode_dtypes({k: z[k] for k in z.files})
    import glob
    parts = sorted(glob.glob(os.path.join(path, f"table-{name}.part*.npz")))
    if not parts:
        raise FileNotFoundError(single)
    merged: Dict[str, list] = {}
    scalars: Dict[str, np.ndarray] = {}
    n_rows_key = None
    for p in parts:
        with np.load(p) as z:
            nk = int(z["keys"].shape[0]) if "keys" in z.files else None
            for k in z.files:
                v = z[k]
                row_like = (nk is not None and v.ndim >= 1
                            and v.shape[0] == nk
                            and not k.startswith(("scalar__", "cbf")))
                if k == "keys" or row_like:
                    merged.setdefault(k, []).append(v)
                else:
                    scalars.setdefault(k, v)
    out = {k: np.concatenate(v) for k, v in merged.items()}
    out.update(scalars)
    return _decode_dtypes(out)


def slot_leaf_names(slot_state) -> List[Tuple[str, Any]]:
    """Stable (name, leaf) pairs for an optimizer slot pytree."""
    flat = jax.tree_util.tree_flatten_with_path(slot_state)[0]
    out = []
    for kp, leaf in flat:
        name = "".join(str(k) for k in kp).replace("/", "_")
        out.append((name, leaf))
    return out
