"""Distributed runtime: row-sharded tables over a device mesh, tiered
variants, the second KV stack, and multi-host utilities."""
from .hash_table import DistributedHashTable
from .tiered import TieredShardedTrainer
from .trainer import ShardedTrainer, make_mesh

__all__ = ["DistributedHashTable", "ShardedTrainer", "TieredShardedTrainer",
           "make_mesh"]
