"""Checkpointing: full + incremental saves, reshard-safe restore.

See :mod:`deeprec_tpu.checkpoint.saver` for the manager and
:mod:`deeprec_tpu.checkpoint.format` for the on-disk layout.
"""
from .format import list_saves, restore_plan
from .saver import CheckpointManager, table_snapshot_host

__all__ = ["CheckpointManager", "table_snapshot_host", "list_saves",
           "restore_plan", "BundleReader", "import_tables", "import_dense"]


def __getattr__(name):
    # lazy: the migration path (clean-room TensorBundle reader) is only
    # needed when importing reference checkpoints
    if name == "BundleReader":
        from .bundle_reader import BundleReader
        return BundleReader
    if name in ("import_tables", "import_dense", "scan"):
        from . import migrate
        return getattr(migrate, name)
    raise AttributeError(name)
