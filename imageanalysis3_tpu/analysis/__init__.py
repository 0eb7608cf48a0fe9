"""Polymer post-analysis: distance maps, domains, compartments."""

from .distmap import spots_to_zxy_nm, distance_map, median_distance_map

__all__ = ["spots_to_zxy_nm", "distance_map", "median_distance_map"]
