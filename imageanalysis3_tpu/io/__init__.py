"""Host-side I/O: dax movies, experiment metadata, spot/result stores."""

from .dax import (DaxMetadata, read_inf, read_dax, write_dax,
                  split_channels, get_num_frames_and_colors)
from .color_usage import ColorUsage, load_color_usage, find_hyb_folders

__all__ = [
    "DaxMetadata", "read_inf", "read_dax", "write_dax", "split_channels",
    "get_num_frames_and_colors",
    "ColorUsage", "load_color_usage", "find_hyb_folders",
]
