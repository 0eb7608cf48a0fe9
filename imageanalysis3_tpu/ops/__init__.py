"""Device-side numerical kernels (JAX/XLA/Pallas)."""

from .corrections import (remove_hot_pixels, z_shift_correct,
                          illumination_correct, bleedthrough_unmix,
                          correct_channel_stack)
from .drift import (subpixel_phase_correlation, generate_drift_crops,
                    consensus_drift, align_image, fft3d_from2d,
                    prepare_ref_spectrum,
                    subpixel_phase_correlation_prepared)
from .filters import (gaussian_filter, maximum_filter, minimum_filter,
                      gaussian_highpass, gaussian_deconvolution,
                      counting_median)
from .gaussian_fit import (iter_fit_seed_points, fit_fov_image,
                           get_centers, select_sparse_centers,
                           find_image_background, FitResult, gfit_fast)
from .cell_fitting import (fit_spots_in_crops, fit_spots_by_segmentation,
                           fit_spots_around_centers,
                           segmentation_bounding_boxes)
from .matching import (find_paired_centers, check_paired_centers,
                       align_beads, accumulate_sequential_drifts,
                       rigid_transform_from_points, align_manual_points,
                       translate_spot_coordinates, select_matched_spots,
                       generate_recombined_spots, fit_matched_centers)
from .profiles import (IlluminationProfiler, generate_bleed_profile,
                       generate_chromatic_constants, counting_quantile,
                       fit_spot_pair_regressions, invert_mixing_profile)
from .seeding import get_seeds, Seeds
from .legacy_fit import (get_seed_points_base, fitsinglegaussian_fixed_width,
                         fit_seed_points_base, get_STD_centers,
                         fit_multi_gaussian)
from .warp import (warp_image, warp_image_drift, warp_spot_coords,
                   fit_chromatic_constants, trilinear_map_coordinates)

__all__ = [
    "remove_hot_pixels", "z_shift_correct", "illumination_correct",
    "bleedthrough_unmix", "correct_channel_stack",
    "subpixel_phase_correlation", "generate_drift_crops",
    "consensus_drift", "align_image", "fft3d_from2d",
    "prepare_ref_spectrum", "subpixel_phase_correlation_prepared",
    "gaussian_filter", "maximum_filter", "minimum_filter",
    "gaussian_highpass", "gaussian_deconvolution", "counting_median",
    "iter_fit_seed_points", "fit_fov_image", "get_centers",
    "select_sparse_centers", "find_image_background", "FitResult",
    "gfit_fast",
    "fit_spots_in_crops", "fit_spots_by_segmentation",
    "fit_spots_around_centers", "segmentation_bounding_boxes",
    "find_paired_centers", "check_paired_centers", "align_beads",
    "accumulate_sequential_drifts", "rigid_transform_from_points",
    "align_manual_points", "translate_spot_coordinates",
    "select_matched_spots", "generate_recombined_spots",
    "fit_matched_centers",
    "IlluminationProfiler", "generate_bleed_profile",
    "generate_chromatic_constants", "counting_quantile",
    "fit_spot_pair_regressions", "invert_mixing_profile",
    "get_seeds", "Seeds",
    "get_seed_points_base", "fitsinglegaussian_fixed_width",
    "fit_seed_points_base", "get_STD_centers", "fit_multi_gaussian",
    "warp_image", "warp_image_drift", "warp_spot_coords",
    "fit_chromatic_constants", "trilinear_map_coordinates",
]
