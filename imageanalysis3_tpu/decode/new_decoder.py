"""DataFrame-facing decode facades: SpotDecoder (combinatorial) and
SpotMapper (sequential).

Behavior targets (reference classes/new_decoder.py):
  * SpotDecoder (:19-407): candidate-spot DataFrame + codebook DataFrame
    -> valid pair tables -> radius pair search -> usage-capped tuple
    selection -> persisted spot-group DataFrame
  * SpotMapper (:408-556): sequential ("unique") codes — match bits to
    single-on-bit codebook rows, filter candidate spots to matched bits,
    annotate genomic region info
  * batch front doors (:721-768)

These wrap the device programs in decode/merfish.py and the DataFrame
interchange in io/spots.py; persistence uses the columnar HDF5 writer
(pytables-free stand-in for the reference's blosc to_hdf).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..io.spots import (dataframe_to_cand_spots, save_dataframe_hdf5,
                        load_dataframe_hdf5, spot_groups_to_dataframe)
from .merfish import MerfishDecoder, SpotGroups, build_codebook

DEFAULT_META_COLS = ("name", "id", "chr", "chr_order")


def codebook_dataframe_to_tables(codebook_df: pd.DataFrame,
                                 meta_cols: Sequence[str]
                                 = DEFAULT_META_COLS):
    """Codebook DataFrame -> (Codebook tables, meta DataFrame).

    Bit columns are every non-meta column (reference _load_codebook,
    classes/decode.py:163-176); values > 0 are on-bits.
    """
    meta = [c for c in codebook_df.columns
            if str(c).lower() in {m.lower() for m in meta_cols}]
    bit_cols = [c for c in codebook_df.columns if c not in meta]
    matrix = codebook_df[bit_cols].to_numpy()
    ids = (codebook_df["id"].to_numpy(np.int64)
           if "id" in codebook_df else np.arange(len(codebook_df)))
    bit_values = []
    for c in bit_cols:
        try:
            bit_values.append(int(c))
        except (TypeError, ValueError):
            bit_values.append(len(bit_values))
    cb = build_codebook((matrix > 0).astype(np.int8), ids=ids,
                        bit_values=bit_values)
    return cb, codebook_df[meta]


class SpotDecoder:
    """Combinatorial decoding over candidate-spot DataFrames
    (reference SpotDecoder, classes/new_decoder.py:19-407)."""

    def __init__(self, cand_spots_df: pd.DataFrame,
                 codebook_df: pd.DataFrame,
                 save_file: Optional[str] = None,
                 search_th: float = 250.0,
                 pixel_sizes=(200.0, 108.0, 108.0),
                 auto: bool = True, verbose: bool = False,
                 **decode_kwargs):
        self.cand_spots_df = cand_spots_df
        self.codebook_df = codebook_df
        self.save_file = save_file
        self.verbose = verbose
        self.codebook, self.codebook_meta = codebook_dataframe_to_tables(
            codebook_df)
        (self.cand_spots, self.bits, self.channels,
         px) = dataframe_to_cand_spots(cand_spots_df)
        self.decoder = MerfishDecoder(self.codebook,
                                      pixel_size_nm=pixel_sizes,
                                      search_th=search_th)
        self.spot_groups: Optional[SpotGroups] = None
        self._decode_kwargs = decode_kwargs
        if auto:
            self.run()

    def run(self) -> SpotGroups:
        """Pair search + tuple selection + completion (reference
        _search_candidate_pairs + _select_spot_tuples)."""
        self.spot_groups = self.decoder.decode(
            self.cand_spots, self.bits, **self._decode_kwargs)
        return self.spot_groups

    def groups_dataframe(self) -> pd.DataFrame:
        if self.spot_groups is None:
            self.run()
        fov = (self.cand_spots_df["fov_id"].iloc[0]
               if "fov_id" in self.cand_spots_df and
               len(self.cand_spots_df) else None)
        cell = (self.cand_spots_df["cell_id"].iloc[0]
                if "cell_id" in self.cand_spots_df and
                len(self.cand_spots_df) else None)
        return spot_groups_to_dataframe(self.spot_groups, self.cand_spots,
                                        self.bits, fov_id=fov,
                                        cell_id=cell)

    def save(self) -> None:
        """Persist cand spots + decoded groups (reference _save,
        classes/new_decoder.py:316-391)."""
        if not self.save_file:
            raise ValueError("no save_file configured")
        save_dataframe_hdf5(self.cand_spots_df, self.save_file,
                            "cand_spots", mode="a")
        save_dataframe_hdf5(self.groups_dataframe(), self.save_file,
                            "spot_groups", mode="a")

    @classmethod
    def load_groups(cls, save_file: str) -> pd.DataFrame:
        return load_dataframe_hdf5(save_file, "spot_groups")


class SpotMapper:
    """Sequential ('unique') bit-to-region mapping (reference SpotMapper,
    classes/new_decoder.py:408-556)."""

    def __init__(self, cand_spots_df: pd.DataFrame,
                 codebook_df: pd.DataFrame,
                 save_file: Optional[str] = None,
                 auto: bool = True, verbose: bool = False):
        self.cand_spots_df = cand_spots_df
        self.codebook_df = codebook_df
        self.save_file = save_file
        self.verbose = verbose
        if auto:
            self.run()

    def run(self) -> pd.DataFrame:
        cb, meta = codebook_dataframe_to_tables(self.codebook_df)
        # sequential codes: exactly one on-bit per row
        self.bit_2_region: Dict[int, dict] = {}
        for gi in range(len(cb.matrix)):
            on = np.where(cb.matrix[gi] > 0)[0]
            if len(on) != 1:
                continue
            bit = int(cb.bit_values[on[0]])
            info = {"region_id": int(cb.ids[gi])}
            if "name" in meta.columns:
                name = str(meta["name"].iloc[gi])
                info["region_name"] = name
                # 'chr:start-end' names annotate genomic coordinates
                if ":" in name and "-" in name.split(":")[-1]:
                    chrom, span = name.split(":")
                    start, end = span.split("-")[:2]
                    info.update(chr=chrom, start=float(start),
                                end=float(end))
            self.bit_2_region[bit] = info
        keep = self.cand_spots_df["bit"].map(
            lambda b: int(b) in self.bit_2_region)
        df = self.cand_spots_df.loc[keep].copy()
        df["region_id"] = [self.bit_2_region[int(b)]["region_id"]
                           for b in df["bit"]]
        for col in ("region_name", "chr", "start", "end"):
            if any(col in v for v in self.bit_2_region.values()):
                df[col] = [self.bit_2_region[int(b)].get(col)
                           for b in df["bit"]]
        self.filtered_spots_df = df
        if self.save_file:
            save_dataframe_hdf5(df, self.save_file, "sequential_spots")
        return df

    def spots_by_region(self) -> Dict[int, np.ndarray]:
        """region id -> (n, 11) rows, ready for build_candidate_table."""
        from ..io.spots import SPOT3D_COLUMNS

        out: Dict[int, np.ndarray] = {}
        for rid, sub in self.filtered_spots_df.groupby("region_id"):
            out[int(rid)] = sub[SPOT3D_COLUMNS].to_numpy(np.float32)
        return out
