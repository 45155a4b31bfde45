"""Checkpointing: full + incremental saves, reshard-safe restore.

See :mod:`deeprec_tpu.checkpoint.saver` for the manager and
:mod:`deeprec_tpu.checkpoint.format` for the on-disk layout.
"""
from .format import list_saves, restore_plan
from .saver import CheckpointManager, table_snapshot_host

__all__ = ["CheckpointManager", "table_snapshot_host", "list_saves",
           "restore_plan"]
