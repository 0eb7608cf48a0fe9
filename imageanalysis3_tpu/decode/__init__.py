"""Decoding & picking: spots -> genomic loci -> chromosome traces."""

from .picking import (naive_pick_spots, dynamic_pick_spots, em_pick_spots,
                      em_pick_spots_for_chromosomes,
                      em_pick_spots_exclusive, build_candidate_table,
                      take_trace, EMPickResult, merge_spot_lists,
                      assign_spots_to_chromosomes)
from .scoring import (ChromRefStats, chromosome_ref_stats, score_candidates,
                      local_centers, neighboring_dists,
                      ChromRefArrays, chromosome_ref_arrays,
                      chromosomal_spot_scores, radius_of_gyration,
                      cum_prob, cdf_distance_score, cdf_intensity_score,
                      generate_cdf_scores, log_distance_scores,
                      exp_distance_scores, normalize_intensities,
                      sort_ref_values, candidate_neighbor_dists)
from .merfish import (Codebook, build_codebook, MerfishDecoder,
                      find_neighbors, SpotGroups)
from .dna_decoder import DNAMerfishDecoder, batch_decode
from .homolog import (init_homolog_centers, assign_groups_to_homologs,
                      decode_chromosome_homologs, HomologResult)
from .picker import (SpotPicker, batch_pick_spots, cdf_scores,
                     prepare_score_metrics_by_chr)
from .population_picking import (pick_spots_by_intensities,
                                 pick_spots_by_scores,
                                 em_pick_spots_in_population,
                                 generate_reference_from_population,
                                 chromosome_center_dists,
                                 local_center_dists, spots_to_hzxys,
                                 PopulationReference,
                                 PopulationPickResult, PopulationEMResult,
                                 evaluate_differences,
                                 screen_rna_based_on_refs)

__all__ = [
    "naive_pick_spots", "dynamic_pick_spots", "em_pick_spots",
    "em_pick_spots_for_chromosomes", "em_pick_spots_exclusive",
    "build_candidate_table", "take_trace",
    "EMPickResult",
    "ChromRefStats", "chromosome_ref_stats", "score_candidates",
    "local_centers", "neighboring_dists",
    "Codebook", "build_codebook", "MerfishDecoder", "find_neighbors",
    "SpotGroups",
    "DNAMerfishDecoder", "batch_decode", "init_homolog_centers",
    "assign_groups_to_homologs", "decode_chromosome_homologs",
    "HomologResult",
    "SpotPicker", "batch_pick_spots", "cdf_scores",
    "prepare_score_metrics_by_chr",
    "pick_spots_by_intensities", "pick_spots_by_scores",
    "em_pick_spots_in_population", "generate_reference_from_population",
    "chromosome_center_dists", "local_center_dists", "spots_to_hzxys",
    "PopulationReference", "PopulationPickResult", "PopulationEMResult",
    "merge_spot_lists", "assign_spots_to_chromosomes",
    "ChromRefArrays", "chromosome_ref_arrays", "chromosomal_spot_scores",
    "radius_of_gyration", "cum_prob", "cdf_distance_score",
    "cdf_intensity_score", "generate_cdf_scores", "log_distance_scores",
    "exp_distance_scores", "normalize_intensities", "sort_ref_values",
    "candidate_neighbor_dists",
    "evaluate_differences", "screen_rna_based_on_refs",
]
