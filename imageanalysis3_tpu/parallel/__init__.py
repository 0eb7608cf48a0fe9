"""Device-mesh parallelism helpers."""

from .mesh import make_mesh, data_sharding
from .input_pipeline import (shard_fovs, FovPrefetcher, PrefetchItem,
                             assemble_global_batch, prefetch_to_device)

__all__ = ["make_mesh", "data_sharding",
           "shard_fovs", "FovPrefetcher", "PrefetchItem",
           "assemble_global_batch", "prefetch_to_device"]
