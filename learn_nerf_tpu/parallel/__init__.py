"""Device-mesh parallelism utilities."""

from .mesh import batch_sharding, default_mesh, replicated_sharding

__all__ = ["default_mesh", "batch_sharding", "replicated_sharding"]
