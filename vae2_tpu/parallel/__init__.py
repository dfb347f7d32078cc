"""SPMD parallelism: device mesh, shardings, distributed init."""

from .mesh import make_mesh, shard_batch_fn, shard_state

__all__ = ["make_mesh", "shard_batch_fn", "shard_state"]
