"""Figure tools: distance maps, domains, projections, decode statistics.

Behavior targets (reference figure_tools/):
  * distance-map rendering     figure_tools/distmap.py:17-155
  * domain boundary overlay    figure_tools/domain.py (plot_boundaries)
  * image projections          figure_tools/image.py:27-190
  * decode statistics          figure_tools/plot_decode.py:66+
  * partition / segmentation   figure_tools/plot_{partition,segmentation}.py

Matplotlib only (Agg-safe); the interactive GUIs of the reference
(visual_tools.imshow_mark_3d_v2, domain_tools/manual.py) are deliberately
out of scope for a headless TPU pipeline — their outputs (manual picks)
enter through the ordinary array APIs instead.
"""

from .plots import (plot_distance_map, plot_boundaries, plot_projection,
                    plot_decode_stats, plot_spot_overlay,
                    plot_segmentation_labels, plot_cell_spot_counts)
from .render3d import (normalize_center_spots,
                       chromosome_structure_3d_rendering,
                       visualize_chromosome_3d_cloud, spots_to_density)

__all__ = ["plot_distance_map", "plot_boundaries", "plot_projection",
           "plot_decode_stats", "plot_spot_overlay",
           "plot_segmentation_labels", "plot_cell_spot_counts",
           "normalize_center_spots", "chromosome_structure_3d_rendering",
           "visualize_chromosome_3d_cloud", "spots_to_density"]
