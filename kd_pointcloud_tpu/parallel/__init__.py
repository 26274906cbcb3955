"""Parallelism: mesh construction + data-parallel shardings (SURVEY.md §2.4)."""

from .mesh import (batch_sharding, data_parallel_plan,
                   data_parallel_sharding, make_mesh, replicate, replicated,
                   resolve_global_batch, shard_batch)

__all__ = ["batch_sharding", "data_parallel_plan", "data_parallel_sharding",
           "make_mesh", "replicate", "replicated", "resolve_global_batch",
           "shard_batch"]
