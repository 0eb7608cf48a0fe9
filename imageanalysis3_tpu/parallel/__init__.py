"""Device-mesh parallelism helpers."""

from .mesh import make_mesh, data_sharding

__all__ = ["make_mesh", "data_sharding"]
