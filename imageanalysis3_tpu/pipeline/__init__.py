"""Pipeline orchestration: per-FOV processing, batching, checkpointing."""

from .fov import FovPipeline, RoundResult

__all__ = ["FovPipeline", "RoundResult"]
