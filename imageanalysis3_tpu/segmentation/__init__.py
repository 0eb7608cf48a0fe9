"""Segmentation: nuclei labeling, chromosome candidates, mask adapters."""

from .nuclei import (otsu_threshold, segment_nuclei, propagate_labels,
                     label_sizes)
from .chromosome import find_candidate_chromosomes, assign_seeds_to_nuclei

__all__ = ["otsu_threshold", "segment_nuclei", "propagate_labels",
           "label_sizes", "find_candidate_chromosomes",
           "assign_seeds_to_nuclei"]
