"""Host-side I/O: dax movies, experiment metadata, spot/result stores."""

from .dax import (DaxMetadata, read_inf, read_dax, write_dax,
                  split_channels, interleave_channels,
                  get_num_frames_and_colors, channel_start_frames,
                  read_dax_window, read_channel_crops,
                  remove_dax_channels)
from .native_loader import (load_dax_channels, split_channels_native,
                            native_loader_available)
from .color_usage import (ColorUsage, load_color_usage, find_hyb_folders,
                          load_encoding_scheme, load_region_positions,
                          load_rna_info, load_gene_info, load_chip_data,
                          match_peaks_to_regions, match_rna_to_dna,
                          match_gene_to_dna, match_enhancers_to_dna)
from .store import (FovStore, AsyncFovWriter, FLAG_EMPTY, FLAG_RAW,
                    FLAG_CORRECTED)
from .crop import ImageCrop3D, generate_neighboring_crop
from .profiles_io import load_correction_profile, save_correction_profile
from .microscope import (read_microscope_json, microscope_correct_image,
                         microscope_translate_spots, load_position_file)
from .spots import (spots_to_dataframe, dataframe_to_cand_spots,
                    spot_groups_to_dataframe, dataframe_to_spot_groups,
                    save_dataframe_hdf5, load_dataframe_hdf5,
                    spaligner_to_chr_homologs,
                    SPOT3D_COLUMNS)

__all__ = [
    "DaxMetadata", "read_inf", "read_dax", "write_dax", "split_channels",
    "interleave_channels", "get_num_frames_and_colors",
    "channel_start_frames", "load_dax_channels", "split_channels_native",
    "native_loader_available",
    "read_dax_window", "read_channel_crops", "remove_dax_channels",
    "ColorUsage", "load_color_usage", "find_hyb_folders",
    "load_encoding_scheme", "load_region_positions",
    "load_rna_info", "load_gene_info", "load_chip_data",
    "match_peaks_to_regions", "match_rna_to_dna", "match_gene_to_dna",
    "match_enhancers_to_dna",
    "FovStore", "AsyncFovWriter", "FLAG_EMPTY", "FLAG_RAW",
    "FLAG_CORRECTED",
    "ImageCrop3D", "generate_neighboring_crop",
    "load_correction_profile", "save_correction_profile",
    "read_microscope_json", "microscope_correct_image", "load_position_file",
    "microscope_translate_spots",
    "spots_to_dataframe", "dataframe_to_cand_spots",
    "spot_groups_to_dataframe", "dataframe_to_spot_groups",
    "save_dataframe_hdf5", "load_dataframe_hdf5", "SPOT3D_COLUMNS",
    "spaligner_to_chr_homologs",
]
