"""DNA MERFISH decoding front door: candidate spots -> homolog traces.

Behavior target: reference classes/decode.py DNA_Merfish_Decoder +
batch_decode_BB_like (:694-2199): decode candidate spots against a
chromosome-annotated codebook (pair search + tuple selection), then per
chromosome initialize homolog centers ("BB"), iteratively assign decoded
groups to homologs, and summarize per-homolog zxy traces and distance
maps.

This module composes the device programs in decode/merfish.py and
decode/homolog.py per chromosome; a codebook DataFrame with a `chr`
column drives the partition (reference extract_chr_region_ids).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import DEFAULT_PIXEL_SIZE_NM
from .homolog import HomologResult, decode_chromosome_homologs
from .merfish import MerfishDecoder, SpotGroups
from .new_decoder import codebook_dataframe_to_tables


class DNAMerfishDecoder:
    """Decode a cell's candidate spots into per-chromosome homolog traces.

    Parameters mirror batch_decode_BB_like (classes/decode.py:2139-2199):
    `codebook_df` must carry `id` + per-bit columns and a `chr` column;
    `keep_ratio_th` gates cells with too few candidates.
    """

    def __init__(self, codebook_df: pd.DataFrame,
                 pixel_sizes=DEFAULT_PIXEL_SIZE_NM,
                 pair_search_radius: float = 250.0,
                 num_homologs: int = 2,
                 keep_ratio_th: float = 0.5):
        self.codebook_df = codebook_df
        self.codebook, meta = codebook_dataframe_to_tables(codebook_df)
        if "chr" not in codebook_df.columns:
            raise ValueError("codebook needs a `chr` column for homolog "
                             "decoding")
        self.region_2_chr = {int(rid): str(ch) for rid, ch in
                             zip(self.codebook.ids, codebook_df["chr"])}
        self.pixel_sizes = np.asarray(pixel_sizes, np.float32)
        self.num_homologs = int(num_homologs)
        self.keep_ratio_th = float(keep_ratio_th)
        self.decoder = MerfishDecoder(self.codebook,
                                      pixel_size_nm=pixel_sizes,
                                      search_th=pair_search_radius)

    def decode(self, spots: np.ndarray, bits: np.ndarray,
               spot_bucket: Optional[int] = 4096,
               group_bucket: Optional[int] = 256,
               **assign_kwargs) -> Optional[Dict[str, HomologResult]]:
        """Full pipeline: tuples -> per-chromosome homolog assignment.

        Returns chr name -> HomologResult (zxys (H, R_chr, 3) nm), or
        None when the cell has too few candidates (reference keep_ratio
        gate, decode.py:2158-2160).

        Shape bucketing (compile-count control — the decode and E/M
        programs are shape-specialized, and a production run decodes
        thousands of cells whose candidate/group counts all differ):
        `spot_bucket` rounds the candidate count up with invalid rows;
        `group_bucket` rounds each chromosome's group count up with
        ``ok=False`` rows, so every chromosome with the same region
        count shares one compiled E/M program per bucket.
        """
        import time as _time

        spots = np.asarray(spots, np.float32)
        min_needed = (self.num_homologs * self.codebook.matrix.sum()
                      * self.keep_ratio_th)
        if len(spots) < min_needed:
            return None
        t0 = _time.perf_counter()
        groups = self.decoder.decode(spots, bits, bucket=spot_bucket)
        jax.block_until_ready(groups.ok)
        #: per-stage wall times (SURVEY §5 structured timing record):
        #: `tuples` = pair search + select + tuple completion,
        #: `homolog` = all per-chromosome E/M assignments
        self.stage_seconds = {"tuples": _time.perf_counter() - t0}
        t0 = _time.perf_counter()
        self.spot_groups = groups
        if spot_bucket and len(spots) % spot_bucket:
            # match the decoder's padded spot table (padding rows are
            # never members of any ok group)
            spots = np.pad(spots, ((0, spot_bucket
                                    - len(spots) % spot_bucket), (0, 0)))
        ok = np.asarray(groups.ok)
        regions = np.asarray(groups.region)
        out: Dict[str, HomologResult] = {}
        for chr_name in sorted(set(self.region_2_chr.values())):
            chr_rids = {rid for rid, c in self.region_2_chr.items()
                        if c == chr_name}
            sel = ok & np.isin(regions, list(chr_rids))
            k = int(sel.sum())
            if k < 2 * self.num_homologs:
                continue
            pad = ((group_bucket - k % group_bucket) % group_bucket
                   if group_bucket else 0)

            def _take(a, fill=0):
                a = np.asarray(a)[sel]
                if pad:
                    a = np.concatenate([
                        a, np.full((pad,) + a.shape[1:], fill, a.dtype)])
                return a

            rid_sel = _take(regions, fill=int(regions[sel][0]))
            sub = SpotGroups(
                spot_idx=jnp.asarray(_take(groups.spot_idx, fill=-1)),
                region=jnp.asarray(rid_sel),
                n_spots=jnp.asarray(_take(groups.n_spots)),
                ok=jnp.asarray(_take(groups.ok, fill=False)),
                spot_usage=groups.spot_usage)
            out[chr_name] = decode_chromosome_homologs(
                sub, spots, rid_sel,
                pixel_size_nm=self.pixel_sizes,
                n_homologs=self.num_homologs, **assign_kwargs)
        self.stage_seconds["homolog"] = _time.perf_counter() - t0
        self.chr_2_homologs = out
        return out

    def summarize_zxys_all_chromosomes(self
                                       ) -> Tuple[np.ndarray, list]:
        """Stack per-homolog traces over chromosomes -> ((sum_R*H, 3)
        zxys, labels ['chr_homolog', ...]) in codebook order (reference
        summarize_zxys_all_chromosomes, decode.py:1214-1285)."""
        zxys, labels = [], []
        for chr_name, res in self.chr_2_homologs.items():
            arr = np.asarray(res.zxys)
            for h in range(arr.shape[0]):
                zxys.append(arr[h])
                labels.extend([f"{chr_name}_{h}"] * arr.shape[1])
        return (np.concatenate(zxys) if zxys else np.zeros((0, 3)),
                labels)


def batch_decode(cells: Dict, codebook_df: pd.DataFrame,
                 **kwargs) -> Dict:
    """Decode many cells: cell id -> {'spots': (N, 11), 'bits': (N,)}
    (reference batch_decode_BB_like looping over cell files)."""
    dec = DNAMerfishDecoder(codebook_df, **{
        k: v for k, v in kwargs.items()
        if k in ("pixel_sizes", "pair_search_radius", "num_homologs",
                 "keep_ratio_th")})
    assign_kwargs = {k: v for k, v in kwargs.items()
                     if k in ("max_iters", "flag_diff_th", "weights",
                              "score_th_percentile", "n_neighbors")}
    out = {}
    for cid, payload in cells.items():
        out[cid] = dec.decode(payload["spots"], payload["bits"],
                              **assign_kwargs)
    return out
