"""Genome-wide (multi-chromosome) distance summaries and interactions.

Behavior targets (reference ImageAnalysis3):
  * per-chr-pair summary distances    structure_tools/distance.py:12-123
    (Chr2ZxysList_2_summaryDist_by_key / Chr2ZxysList_2_summaryDict:
    cis = same homolog pdist, trans = ordered homolog permutations,
    inter-chromosome = all homolog cross pairs; reduced across cells
    with nanmedian; missing pairs yield all-NaN blocks sized by the
    codebook's per-chromosome region counts)
  * chromosome sort key / plot order  structure_tools/distance.py:125-162
    (sort_chr, Generate_PlotOrder)
  * matrix assembly + chr edges       structure_tools/distance.py:164-229
    (assemble_ChrDistDict_2_Matrix, generate_plot_chr_edges)
  * contact probability               structure_tools/distance.py:231-232
  * merged cell coordinates           figure_tools/plot_decode.py:110-143
    (Centering_Chr2ZxysListDict, summarize_chr2Zxys)
  * multi-way interaction groups      structure_tools/contact.py:3-34
    (find_interaction_groups: >=3-way mutual-radius contacts spanning
    >=min_chrs distinct chromosomes)
  * per-homolog density clouds        structure_tools/chromosome.py:5-57
    (convert_chr2Zxys_2_Cloud)

TPU-first design: each chromosome pair's per-cell homolog distance
matrices broadcast-stack into one (N, R1, R2) tensor reduced in a single
nanmedian pass -- the reference's mp.Pool fan-out over chromosome pairs
becomes vectorized tensor math.  The density-cloud render reuses the
jitted summed-Gaussian grid evaluation from analysis/compartments.
Host-side pandas drives the codebook bookkeeping, as everywhere else in
``analysis/``.
"""

from __future__ import annotations

from itertools import combinations_with_replacement, permutations
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# Chromosome ordering
# ---------------------------------------------------------------------------


def sort_chr(name: str) -> int:
    """Sort key for chromosome names: numeric order, then X=23, Y=24,
    anything else after (reference sort_chr,
    structure_tools/distance.py:125-134, which raises on other names --
    here unknown names sort last, alphabetically via a stable sort)."""
    try:
        return int(name)
    except (TypeError, ValueError):
        pass
    if name == "X":
        return 23
    if name == "Y":
        return 24
    return 25


def _sorted_chrs(names) -> List[str]:
    return sorted((str(n) for n in np.unique(np.asarray(names, dtype=object))),
                  key=lambda c: (sort_chr(c), c))


# ---------------------------------------------------------------------------
# Pairwise summary distances
# ---------------------------------------------------------------------------


def _cross_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(R1, 3) x (R2, 3) -> (R1, R2) Euclidean distances (NaN passes
    through so missing regions stay missing)."""
    return np.linalg.norm(np.asarray(a, np.float32)[:, None, :]
                          - np.asarray(b, np.float32)[None, :, :], axis=-1)


def _reduce(stacks: List[np.ndarray], function, axis):
    if isinstance(function, str):
        function = getattr(np, function)
    arr = np.stack(stacks, axis=0).astype(np.float32)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices
        return function(arr, axis=axis)


def summarize_chr_pair(chr_2_zxys_list: Sequence[Dict[str, np.ndarray]],
                       c1: str, c2: str,
                       chr_sizes: Dict[str, int],
                       function="nanmedian", axis=0) -> Dict:
    """Summary distances for one chromosome pair across cells (reference
    Chr2ZxysList_2_summaryDist_by_key, structure_tools/distance.py:12-68).

    chr_2_zxys_list: per-cell dicts chr -> (H, R_chr, 3) homolog traces.
    Same-chromosome pairs produce ``cis_<chr>`` (per-homolog pdist) and
    ``trans_<chr>`` (ordered homolog permutations); distinct chromosomes
    produce one ``(c1, c2)`` entry over all homolog cross pairs.  Pairs
    never observed reduce to all-NaN blocks sized from ``chr_sizes``.
    """
    c1, c2 = str(c1), str(c2)
    out: Dict = {}
    if c1 != c2:
        stacks = []
        for cell in chr_2_zxys_list:
            z1, z2 = cell.get(c1), cell.get(c2)
            if z1 is None or z2 is None:
                continue
            for a in np.asarray(z1, np.float32):
                for b in np.asarray(z2, np.float32):
                    stacks.append(_cross_dist(a, b))
        out[(c1, c2)] = (_reduce(stacks, function, axis) if stacks else
                         np.full((chr_sizes[c1], chr_sizes[c2]), np.nan,
                                 np.float32))
        return out
    cis, trans = [], []
    for cell in chr_2_zxys_list:
        z = cell.get(c1)
        if z is None:
            continue
        homologs = list(np.asarray(z, np.float32))
        cis.extend(_cross_dist(h, h) for h in homologs)
        if len(homologs) > 1:
            trans.extend(_cross_dist(homologs[i], homologs[j])
                         for i, j in permutations(range(len(homologs)), 2))
    empty = np.full((chr_sizes[c1], chr_sizes[c1]), np.nan, np.float32)
    out[f"cis_{c1}"] = _reduce(cis, function, axis) if cis else empty
    out[f"trans_{c1}"] = _reduce(trans, function, axis) if trans else empty
    return out


def genome_summary_dict(chr_2_zxys_list: Sequence[Dict[str, np.ndarray]],
                        codebook_df: pd.DataFrame,
                        function="nanmedian", axis=0) -> Dict:
    """All-pairs summary distance dictionary (reference
    Chr2ZxysList_2_summaryDict, structure_tools/distance.py:69-123,
    without the mp.Pool -- the stacked-tensor reduction replaces it)."""
    chrs = _sorted_chrs(codebook_df["chr"].values)
    sizes = {c: int(np.sum(codebook_df["chr"].astype(str) == c))
             for c in chrs}
    summary: Dict = {}
    for c1, c2 in combinations_with_replacement(chrs, 2):
        summary.update(summarize_chr_pair(chr_2_zxys_list, c1, c2, sizes,
                                          function=function, axis=axis))
    return summary


# ---------------------------------------------------------------------------
# Plot order + matrix assembly
# ---------------------------------------------------------------------------


def generate_plot_order(total_codebook: pd.DataFrame,
                        sel_codebook: Optional[pd.DataFrame] = None,
                        sort_by_region: bool = True,
                        ) -> Tuple[Dict[str, np.ndarray],
                                   Dict[str, np.ndarray]]:
    """Map each chromosome to its row indices in the assembled matrix and
    its within-chromosome region orders (reference Generate_PlotOrder,
    structure_tools/distance.py:136-162)."""
    if sel_codebook is None:
        sel_codebook = total_codebook
    chr_2_plot_indices: Dict[str, np.ndarray] = {}
    chr_2_chr_orders: Dict[str, np.ndarray] = {}
    sel_ids = sel_codebook["id"].values
    n_sel = 0
    for chrom in _sorted_chrs(total_codebook["chr"].values):
        sub = total_codebook[total_codebook["chr"].astype(str) == chrom]
        inds, orders = [], []
        for rid, order in zip(sub["id"].values, sub["chr_order"].values):
            hit = np.nonzero(sel_ids == rid)[0]
            if hit.size:
                inds.append(int(hit[0]))
                orders.append(int(order))
        if not inds:
            continue
        if sort_by_region:
            chr_2_plot_indices[chrom] = np.asarray(inds)
            chr_2_chr_orders[chrom] = np.asarray(orders)
        else:
            chr_2_plot_indices[chrom] = np.arange(n_sel, n_sel + len(inds))
            chr_2_chr_orders[chrom] = np.arange(len(inds))
        n_sel += len(inds)
    return chr_2_plot_indices, chr_2_chr_orders


def generate_plot_chr_edges(sel_codebook: pd.DataFrame,
                            chr_2_plot_inds: Optional[Dict] = None,
                            sort_by_region: bool = True,
                            ) -> Tuple[np.ndarray, List[str]]:
    """Chromosome block edges + labels along the assembled matrix axis
    (reference generate_plot_chr_edges,
    structure_tools/distance.py:207-229)."""
    if chr_2_plot_inds is None or not isinstance(chr_2_plot_inds, dict):
        chr_2_plot_inds, _ = generate_plot_order(
            sel_codebook, sel_codebook, sort_by_region=sort_by_region)
    edges: List[int] = []
    names: List[str] = []
    if sort_by_region:
        prev = None
        for pos, chrom in enumerate(sel_codebook["chr"].astype(str).values):
            if chrom != prev:
                edges.append(pos)
                names.append(chrom)
            prev = chrom
        edges.append(len(sel_codebook))
    else:
        for chrom, inds in chr_2_plot_inds.items():
            edges.append(int(inds[0]))
            names.append(chrom)
        edges.append(len(sel_codebook))
    return np.asarray(edges), names


def assemble_dist_dict_to_matrix(dist_dict: Dict,
                                 total_codebook: pd.DataFrame,
                                 sel_codebook: Optional[pd.DataFrame] = None,
                                 use_cis: bool = True,
                                 use_trans: bool = False,
                                 sort_by_region: bool = True,
                                 ) -> Tuple[np.ndarray, np.ndarray,
                                            List[str]]:
    """Assemble a genome-wide matrix from a summary dict (reference
    assemble_ChrDistDict_2_Matrix, structure_tools/distance.py:164-205):
    diagonal blocks take cis (or trans) maps, off-diagonal blocks take
    the inter-chromosome map in either key order, indexed through the
    plot order so partial selections land in the right rows."""
    if sel_codebook is None:
        sel_codebook = total_codebook
    plot_inds, chr_orders = generate_plot_order(
        total_codebook, sel_codebook, sort_by_region=sort_by_region)
    n = len(sel_codebook)
    matrix = np.full((n, n), np.nan, np.float32)
    chrs = [c for c in _sorted_chrs(total_codebook["chr"].values)
            if c in plot_inds]
    for c1 in chrs:
        i1 = plot_inds[c1]
        o1 = chr_orders[c1].astype(np.int32)
        for c2 in chrs:
            i2 = plot_inds[c2]
            o2 = chr_orders[c2].astype(np.int32)
            if c1 == c2:
                key = f"cis_{c1}" if use_cis else f"trans_{c1}"
                if (use_cis and f"cis_{c1}" in dist_dict):
                    block = dist_dict[f"cis_{c1}"]
                elif (use_trans and f"trans_{c1}" in dist_dict):
                    block = dist_dict[f"trans_{c1}"]
                else:
                    continue
                matrix[i1[:, None], i2] = block[o1[:, None], o2]
            elif (c1, c2) in dist_dict:
                block = dist_dict[(c1, c2)]
                matrix[i1[:, None], i2] = block[o1[:, None], o2]
                matrix[i2[:, None], i1] = block[o1[:, None], o2].T
            elif (c2, c1) in dist_dict:
                block = dist_dict[(c2, c1)]
                matrix[i1[:, None], i2] = block[o2[:, None], o1].T
                matrix[i2[:, None], i1] = block[o2[:, None], o1]
    edges, names = generate_plot_chr_edges(sel_codebook, plot_inds,
                                           sort_by_region)
    return matrix, edges, names


def contact_prob(mat: np.ndarray, contact_th: float = 0.6,
                 axis: int = 0) -> np.ndarray:
    """Fraction of finite entries at or below the contact threshold
    (reference contact_prob, structure_tools/distance.py:231-232)."""
    mat = np.asarray(mat, np.float32)
    finite = np.isfinite(mat)
    with np.errstate(invalid="ignore", divide="ignore"):
        return (np.sum((mat <= contact_th) & finite, axis=axis)
                / np.sum(finite, axis=axis))


# ---------------------------------------------------------------------------
# Merged cell coordinates + multi-way interactions
# ---------------------------------------------------------------------------


def center_chr_traces(chr_2_zxys: Dict[str, np.ndarray]
                      ) -> Dict[str, np.ndarray]:
    """Subtract the cell's whole-genome mean position from every homolog
    trace (reference Centering_Chr2ZxysListDict,
    figure_tools/plot_decode.py:110-120)."""
    pooled = np.concatenate([np.asarray(z, np.float32).reshape(-1, 3)
                             for z in chr_2_zxys.values()], axis=0)
    center = np.nanmean(pooled, axis=0)
    return {c: np.asarray(z, np.float32) - center[None, None]
            for c, z in chr_2_zxys.items()}


def merge_chr_traces(chr_2_zxys: Dict[str, np.ndarray],
                     codebook_df: pd.DataFrame,
                     keep_valid: bool = False,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Flatten every homolog trace into one (N, 3) array with matching
    region indices in chromosome-sorted plot order (reference
    summarize_chr2Zxys, figure_tools/plot_decode.py:122-143)."""
    plot_inds, _ = generate_plot_order(codebook_df, codebook_df,
                                       sort_by_region=False)
    zxys, rids = [], []
    for chrom, inds in plot_inds.items():
        if chrom not in chr_2_zxys:
            continue
        for trace in np.asarray(chr_2_zxys[chrom], np.float32):
            if keep_valid:
                ok = np.isfinite(trace).all(axis=1)
                zxys.append(trace[ok])
                rids.append(inds[ok])
            else:
                zxys.append(trace)
                rids.append(inds)
    return (np.concatenate(zxys, axis=0),
            np.concatenate(rids, axis=0).astype(np.int64))


def find_interaction_groups(chr_2_zxys: Dict[str, np.ndarray],
                            codebook_df: pd.DataFrame,
                            search_radius: float = 0.5,
                            min_chrs: int = 3,
                            ) -> Tuple[List[np.ndarray], List[np.ndarray],
                                       List[np.ndarray]]:
    """Multi-way trans-chromosome contact hubs for one cell (reference
    find_interaction_groups, structure_tools/contact.py:3-34): groups of
    >= max(3, min_chrs) loci all mutually within ``search_radius`` whose
    members span >= ``min_chrs`` distinct chromosomes.

    Returns (coords, region_ids, chr_names) per surviving group.
    """
    from scipy.spatial import cKDTree

    zxys, rids = merge_chr_traces(chr_2_zxys, codebook_df, keep_valid=True)
    chr_per_region = codebook_df["chr"].astype(str).values
    if len(zxys) == 0:
        return [], [], []
    tree = cKDTree(zxys)
    raw = tree.query_ball_point(zxys, search_radius)
    groups = {tuple(np.sort(g)) for g in raw
              if len(g) >= min(int(min_chrs), 3)}
    coords_out, rids_out, chrs_out = [], [], []
    for g in sorted(groups):
        idx = np.asarray(g)
        pts = zxys[idx]
        diffs = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        if not (diffs[np.triu_indices(len(pts), 1)] < search_radius).all():
            continue
        g_rids = rids[idx]
        g_chrs = chr_per_region[g_rids]
        if len(np.unique(g_chrs)) >= int(min_chrs):
            coords_out.append(pts)
            rids_out.append(g_rids)
            chrs_out.append(g_chrs)
    return coords_out, rids_out, chrs_out


# ---------------------------------------------------------------------------
# Per-homolog density clouds
# ---------------------------------------------------------------------------


def chr_to_density_clouds(chr_2_zxys: Dict[str, np.ndarray],
                          pixel_size: float = 0.1,
                          im_radius: float = 5.0,
                          gaussian_sigma: float = 0.5,
                          allowed_homolog_num: Sequence[int] = (1, 2),
                          min_valid_spots: int = 20,
                          min_valid_per: float = 0.25,
                          normalize_counts: bool = False,
                          normalize_pdf: bool = False,
                          return_empty: bool = False,
                          ) -> Dict[str, np.ndarray]:
    """Render each chromosome's homolog traces as 3D Gaussian density
    grids around the cell center (reference convert_chr2Zxys_2_Cloud,
    structure_tools/chromosome.py:5-57).

    Returns chr -> (H_kept, G, G, G) float32 arrays on a grid of extent
    ``2*im_radius`` and voxel ``pixel_size``; homologs failing the
    valid-spot screens render as zeros and are dropped unless
    ``return_empty``.  The summed-Gaussian evaluation is the jitted grid
    kernel from analysis/compartments (one fused program per homolog)
    instead of the reference's per-spot add_source loop.
    """
    import jax.numpy as jnp

    from .compartments import spots_to_density

    centered = center_chr_traces(chr_2_zxys)
    grid_radius = int(round(im_radius / pixel_size))
    out: Dict[str, np.ndarray] = {}
    for chrom, homologs in centered.items():
        homologs = np.asarray(homologs, np.float32)
        if homologs.ndim != 3 or len(homologs) not in set(
                int(h) for h in allowed_homolog_num):
            continue
        arrs = []
        for trace in homologs:
            ok = np.isfinite(trace).all(axis=1)
            n_ok = int(ok.sum())
            if n_ok <= min_valid_spots or ok.mean() < min_valid_per:
                arrs.append(np.zeros((2 * grid_radius,) * 3, np.float32))
                continue
            dens = np.asarray(spots_to_density(
                jnp.asarray(trace), jnp.asarray(ok),
                grid_radius=grid_radius,
                sigma=float(gaussian_sigma),
                voxel=float(pixel_size)))
            # spots_to_density returns the pdf (sums to 1); the reference
            # sums unit-height Gaussians, whose total mass is
            # n_ok * (2*pi)^1.5 * sigma_vox^3 -- rescale accordingly
            sigma_vox = float(gaussian_sigma) / float(pixel_size)
            raw_mass = n_ok * (2.0 * np.pi) ** 1.5 * sigma_vox ** 3
            if normalize_pdf:
                pass                                  # already the pdf
            elif normalize_counts:
                dens = dens * (raw_mass / n_ok)
            else:
                dens = dens * raw_mass
            arrs.append(dens.astype(np.float32))
        stack = np.stack(arrs, axis=0)
        kept = stack.any(axis=(1, 2, 3))
        if return_empty:
            out[chrom] = stack
        elif kept.any():
            out[chrom] = stack[kept]
    return out
