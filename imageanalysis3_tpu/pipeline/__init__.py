"""Pipeline orchestration: per-FOV processing, batching, checkpointing."""

from .fov import FovPipeline, RoundResult
from .experiment import ExperimentDriver, RoundPlan, StageTimes
from .dax_processer import DaxProcesser, batch_process_image_quick
from .field_of_view import FieldOfView

__all__ = ["FovPipeline", "RoundResult", "ExperimentDriver", "RoundPlan",
           "StageTimes", "DaxProcesser", "batch_process_image_quick",
           "FieldOfView"]
