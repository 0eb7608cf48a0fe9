"""imageanalysis3_tpu: a TPU-native chromatin-tracing FISH framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
ImageAnalysis3 package (multiplexed DNA/RNA-FISH chromatin tracing):
raw microscope z-stack IO, camera/optics corrections, drift registration,
3D Gaussian spot fitting, MERFISH/sequential decoding, chromosome tracing,
segmentation-gated partitioning, and polymer post-analysis.

Global experiment constants mirror the reference defaults
(reference: ``__init__.py:17-40``) but live in a typed config tree
(:mod:`imageanalysis3_tpu.config`) rather than module globals.
"""

from .config import (
    DEFAULT_PIXEL_SIZE_NM,
    DEFAULT_SIGMA_ZXY,
    DEFAULT_IMAGE_SIZE,
    ALLOWED_COLORS,
    CORR_CHANNELS,
    CorrectionConfig,
    DriftConfig,
    SeedConfig,
    FitConfig,
    ExperimentConfig,
)

# subpackages (imported lazily by most users; listed for discoverability):
#   io, ops, pipeline, decode, analysis, segmentation, parallel, figures,
#   library, legacy, spots, synthetic

__version__ = "0.2.0"

__all__ = [
    "DEFAULT_PIXEL_SIZE_NM",
    "DEFAULT_SIGMA_ZXY",
    "DEFAULT_IMAGE_SIZE",
    "ALLOWED_COLORS",
    "CORR_CHANNELS",
    "CorrectionConfig",
    "DriftConfig",
    "SeedConfig",
    "FitConfig",
    "ExperimentConfig",
]
