"""New-generation DataFrame picker: score-based iterative homolog
assignment over decoded spot-group tables.

Behavior target: reference classes/picker.py (SpotPicker :15-538,
batch_pick_spots :539-632, prepare_score_metrics_by_chr :560-600,
cdf_scores :601-612).  This is the reference's current production path for
turning decoded spot groups (combinatorial libraries) and candidate spots
(sequential libraries) into per-chromosome homolog traces:

  1. merge per-library codebooks + decoded coordinates, ordering regions
     along each chromosome by genomic midpoint (`chr_order`);
  2. initialize per-chromosome homolog centers (weighted k-means, one
     cluster per expected chromosome copy);
  3. score every candidate against every homolog with three weighted
     log-CDF metrics — intensity (greater is better), distance to the
     homolog center, and distance to the local neighborhood of the
     previous picked trace (both smaller is better), with the CDF pooled
     over ALL chromosomes (reference _calculate_scores :233-270);
  4. per region, pick the best per-homolog assignment by exhaustive
     permutation of candidates (reference _assign_homologs_by_scores
     :271-343);
  5. shrink homolog centers toward the picked means, re-score and
     re-assign until the changed fraction per chromosome drops below
     `change_th` (reference _update_assignment / _iterative_assignment
     :430-470), skipping chromosomes that have settled;
  6. filter picked spots whose score falls below
     sum(weights) * log(0.05) (reference _filter_selected_by_scores).

TPU note: this facade is deliberately host-side NumPy — it post-processes
10^3-10^5 table rows, far from the device-scale hot path, and the heavy
decode/E-M machinery it sits on top of (decode/homolog.py,
decode/merfish.py) already runs on device.  The vectorized CDF scoring
here replaces the reference's per-value `percentileofscore` loop (O(N^2)
in table size) with one sort + searchsorted.
"""

from __future__ import annotations

import math
from itertools import permutations, product
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np
import pandas as pd

#: reference picker.py:10-12
AXIS3D_INFOS = ("z", "x", "y")
DEFAULT_WEIGHTS = (5.0, 2.0, 1.0)
DEFAULT_SCORE_TH = math.log(0.05)
DEFAULT_COORDS_COLUMNS = [
    "region_name", "chr", "start", "end", "center_z", "center_x",
    "center_y", "center_intensity", "center_internal_dist"]


# ---------------------------------------------------------------------------
# Scoring primitives (reference picker.py:560-612)
# ---------------------------------------------------------------------------


def cdf_scores(values: np.ndarray, refs: np.ndarray,
               greater: bool = True) -> np.ndarray:
    """Weak-percentile CDF mapped into the open interval (0, 1).

    Reference cdf_scores (classes/picker.py:601-612):
    `percentileofscore(refs, v, kind='weak') / 100 * n/(n+2) + 1/(n+2)`
    (complemented when `greater=False`).  `refs` may contain NaNs: the
    reference passes `refs[np.isreal(refs)]`, and `np.isreal` is True for
    NaN floats, so NaNs stay in the pool — they never compare <= v but DO
    count in the denominator.  Reproduced here with one sort +
    searchsorted instead of the reference's per-value loop.
    """
    refs = np.ravel(np.asarray(refs, np.float64))
    values = np.asarray(values, np.float64)
    if refs.size == 0 or np.isnan(refs).all():
        return np.full(values.shape, np.nan)
    n = refs.size                                 # NaNs included
    finite = np.sort(refs[~np.isnan(refs)])
    # weak percentile: fraction of refs <= v (NaN values yield count 0,
    # exactly like percentileofscore's elementwise comparison)
    counts = np.searchsorted(finite, values, side="right").astype(np.float64)
    counts = np.where(np.isnan(values), 0.0, counts)
    p = counts / n
    if greater:
        return p * n / (n + 2) + 1.0 / (n + 2)
    return 1.0 - p * n / (n + 2) - 1.0 / (n + 2)


def prepare_score_metrics_by_chr(hzxys: np.ndarray, region_ids: np.ndarray,
                                 homolog_center_zxys: np.ndarray,
                                 prev_homolog_hzxys: Optional[np.ndarray]
                                 = None,
                                 local_range: int = 5) -> np.ndarray:
    """(3, n_homologs, n_cands) metric tensor for one chromosome.

    Reference prepare_score_metrics_by_chr (classes/picker.py:560-600):
      metric 0: candidate intensity (same for every homolog);
      metric 1: euclidean distance to each homolog center;
      metric 2: distance to the local neighborhood — first round: the
        nanmean of OTHER candidates whose region id is within
        +-local_range; later rounds: per homolog, the nanmean of the
        previous picked trace over region indices
        [id-local_range, id+local_range] (the reference excludes the
        candidate's own row index `_i` from the region-index window — a
        mixed-index quirk kept for parity).
    """
    hzxys = np.asarray(hzxys, np.float64)
    region_ids = np.asarray(region_ids)
    centers = np.atleast_2d(np.asarray(homolog_center_zxys, np.float64))
    n_homologs = len(centers)
    n = len(hzxys)
    if n == 0:
        return np.zeros((3, n_homologs, 0))
    metrics = np.full((3, n_homologs, n), np.nan)
    metrics[0, :, :] = hzxys[:, 0][None]
    d = np.linalg.norm(centers[:, None, :] - hzxys[None, :, 1:], axis=-1)
    metrics[1, :, :] = d
    if prev_homolog_hzxys is None:
        for i, rid in enumerate(region_ids):
            sel = np.where((region_ids >= rid - local_range)
                           & (region_ids <= rid + local_range))[0]
            sel = np.setdiff1d(sel, [i])
            if len(sel) > 0:
                ctr = np.nanmean(hzxys[sel, 1:], axis=0)
                metrics[2, :, i] = np.linalg.norm(hzxys[i, 1:] - ctr)
    else:
        prev = np.asarray(prev_homolog_hzxys, np.float64)
        if len(prev) != n_homologs:
            raise IndexError("length of prev_homolog_hzxys doesn't match")
        n_reg = prev.shape[1]
        for i, rid in enumerate(region_ids):
            sel = np.arange(max(0, int(rid) - local_range),
                            min(n_reg, int(rid) + local_range + 1))
            sel = np.setdiff1d(sel, [i])
            if len(sel) == 0:
                continue
            for h in range(n_homologs):
                ctr = np.nanmean(prev[h][sel, 1:], axis=0)
                metrics[2, h, i] = np.linalg.norm(hzxys[i, 1:] - ctr)
    return metrics


def weighted_kmeans(points: np.ndarray, weights: np.ndarray, k: int,
                    n_iters: int = 50) -> np.ndarray:
    """Deterministic weighted Lloyd k-means (reference uses sklearn
    KMeans(random_state=0) with sample weights, picker.py:186-194; this
    farthest-point-seeded variant is deterministic without the sklearn
    dependency — centers converge to the same local structure for the
    well-separated homolog clusters this is applied to)."""
    pts = np.asarray(points, np.float64)
    w = np.asarray(weights, np.float64)
    ok = ~np.isnan(pts).any(axis=1)
    pts, w = pts[ok], w[ok]
    if len(pts) < k:
        raise ValueError(f"need >= {k} points for k-means")
    centers = [pts[int(np.argmax(w))]]
    for _ in range(k - 1):
        d2 = np.min([np.sum((pts - c) ** 2, 1) for c in centers], axis=0)
        centers.append(pts[int(np.argmax(d2 * w))])
    centers = np.asarray(centers)
    for _ in range(n_iters):
        lab = np.argmin(((pts[:, None] - centers[None]) ** 2).sum(-1), 1)
        for j in range(k):
            m = lab == j
            if np.any(m):
                centers[j] = np.average(pts[m], axis=0, weights=w[m])
    return centers


# ---------------------------------------------------------------------------
# The picker facade
# ---------------------------------------------------------------------------


class SpotPicker:
    """Score-based iterative homolog picking over decoded DataFrames
    (reference SpotPicker, classes/picker.py:15-538).

    Parameters
    ----------
    coords : merged candidate table — one row per decoded group /
        candidate spot with at least `region_name`, `chr`, `center_z/x/y`,
        `center_intensity` (missing columns of
        DEFAULT_COORDS_COLUMNS are filled with NaN); alternatively pass
        `decoded_file`.
    codebook : merged codebook with `name` ('chr:start-end') and `chr`
        columns; region order along each chromosome comes from the
        genomic midpoint parsed from `name`.
    decoded_file : HDF5 written by decode.new_decoder (library groups
        holding `spotGroups`/`candSpots` + `codebook` columnar tables).
    chr_2_copy_num : chromosome -> expected homolog count; default 2 with
        X/Y overridden by `male` (reference
        _generate_default_chr_copyNum).
    """

    def __init__(self, coords: Optional[pd.DataFrame] = None,
                 codebook: Optional[pd.DataFrame] = None,
                 decoded_file: Optional[str] = None,
                 metric_weights: Sequence[float] = DEFAULT_WEIGHTS,
                 valid_score_th: float = DEFAULT_SCORE_TH,
                 chr_2_copy_num: Optional[Dict[str, int]] = None,
                 male: bool = True,
                 save_file: Optional[str] = None,
                 verbose: bool = False):
        self.decoded_file = decoded_file
        self.save_file = save_file
        self.male = male
        self.metric_weights = np.asarray(metric_weights, np.float64)
        self.valid_score_th = float(valid_score_th)
        self.verbose = verbose
        self.chr_2_copy_num = (dict(chr_2_copy_num)
                               if isinstance(chr_2_copy_num, dict) else None)
        self._coords_in = coords
        self._codebook_in = codebook
        # iteration history (reference history_* buffers)
        self.history_homolog_centers: List[Dict] = []
        self.history_homolog_hzxys: List[Dict] = []
        self.history_homolog_inds: List[Dict] = []
        self.chr_2_homolog_centers: Dict[str, np.ndarray] = {}
        self.chr_2_homolog_hzxys: Dict[str, np.ndarray] = {}
        self.chr_2_homolog_inds: Dict[str, np.ndarray] = {}
        self.chr_2_scores: Dict[str, np.ndarray] = {}
        self.chr_2_change: Dict[str, bool] = {}
        self.chr_2_change_fraction: Dict[str, float] = {}

    # -- loading / merging ------------------------------------------------

    def _load_decoded(self) -> Tuple[List[pd.DataFrame], List[pd.DataFrame]]:
        """Scan the decoded file for per-library groups (reference
        _load_decoded, picker.py:54-100: `spotGroups` => combo libraries,
        `candSpots` => unique libraries, each with a sibling codebook)."""
        from ..io.spots import load_dataframe_hdf5

        codebooks, coords = [], []
        with h5py.File(self.decoded_file, "r") as fh:
            names = [k for k in fh.keys() if k != "picked"
                     and isinstance(fh[k], h5py.Group)]
            plans = []
            for name in names:
                keys = set(fh[name].keys())
                if "spotGroups" in keys:
                    plans.append((name, "spotGroups", "combo"))
                elif "candSpots" in keys:
                    plans.append((name, "candSpots", "unique"))
        for name, key, dtype in plans:
            cb = load_dataframe_hdf5(self.decoded_file,
                                     f"{name}/codebook")
            cb["library"] = name
            cb["dtype"] = dtype
            codebooks.append(cb)
            df = load_dataframe_hdf5(self.decoded_file, f"{name}/{key}")
            if len(df) == 0:
                continue
            sel = pd.DataFrame(index=df.index)
            for c in DEFAULT_COORDS_COLUMNS:
                sel[c] = df[c] if c in df.columns else np.nan
            sel["codebook_name"] = name
            sel["data_type"] = dtype
            h_cols = [c for c in df.columns if "height" in str(c)]
            sel["num_spots"] = ((~df[h_cols].isna()).sum(axis=1)
                                if h_cols else 1)
            coords.append(sel)
        return codebooks, coords

    def _merge_decoded(self) -> None:
        """Merge codebooks + coords; order regions along chromosomes by
        genomic midpoint (reference _merge_decoded, picker.py:101-141)."""
        if self._coords_in is not None:
            codebooks = [self._codebook_in.copy()]
            coords = [self._coords_in.copy()]
        else:
            codebooks, coords = self._load_decoded()
        if not codebooks or not coords:
            self.merged_codebook = pd.DataFrame()
            self.merged_coords = pd.DataFrame()
            return
        cb = pd.concat(codebooks, axis=0, join="outer",
                       ignore_index=True).fillna(0)
        spans = [str(n).split(":")[1].split("-") for n in cb["name"]]
        cb["reg_mid"] = [(int(s[0]) + int(s[1])) / 2 for s in spans]
        cb["chr_order"] = 0
        for chrom in np.unique(cb["chr"]):
            idx = cb.index[cb["chr"] == chrom]
            order = np.argsort(cb.loc[idx, "reg_mid"].to_numpy())
            cb.loc[idx[order], "chr_order"] = np.arange(len(idx),
                                                        dtype=np.int32)
        self.merged_codebook = cb[[c for c in cb.columns
                                   if not str(c).startswith("reg_")]]
        name_to_order = dict(zip(cb["name"], cb["chr_order"]))
        name_to_ind = dict(zip(cb["name"], cb.index))
        mc = pd.concat(coords, axis=0, join="outer", ignore_index=True)
        mc["index"] = [name_to_ind[r] for r in mc["region_name"]]
        mc["chr_order"] = [int(name_to_order[r])
                           for r in mc["region_name"]]
        self.merged_coords = mc
        if self.verbose:
            print(f"{len(mc)} candidates for {len(cb)} regions")

    def _generate_default_copy_num(self) -> None:
        """Autosomes 2; X/Y 1/1 (male) or 2/0 (reference
        _generate_default_chr_copyNum, picker.py:142-155)."""
        if self.chr_2_copy_num is not None:
            return
        self.chr_2_copy_num = {str(c): 2
                               for c in np.unique(self.merged_codebook["chr"])}
        if "X" in self.chr_2_copy_num or "Y" in self.chr_2_copy_num or True:
            self.chr_2_copy_num["X"] = 1 if self.male else 2
            self.chr_2_copy_num["Y"] = 1 if self.male else 0

    # -- per-chromosome candidate views ----------------------------------

    def _chr_candidates(self, chrom: str):
        df = self.merged_coords
        m = (df["chr"].astype(str) == str(chrom)).to_numpy()
        rows = np.where(m)[0]
        hzxys = df.loc[df.index[m],
                       ["center_intensity"] +
                       [f"center_{a}" for a in AXIS3D_INFOS]].to_numpy(
            np.float64)
        ids = df.loc[df.index[m], "chr_order"].to_numpy(np.int64)
        return rows, hzxys, ids

    def _init_homolog_centers(self, min_spot_num: int = 2) -> None:
        """Weighted k-means (weight 1/count-per-region) per chromosome
        (reference _init_homolog_centers, picker.py:156-194)."""
        self.chr_2_cand_rows = {}
        self.chr_2_cand_hzxys = {}
        self.chr_2_cand_ids = {}
        for chrom, copy_num in self.chr_2_copy_num.items():
            rows, hzxys, ids = self._chr_candidates(chrom)
            if len(rows) < max(min_spot_num, copy_num) or copy_num == 0:
                continue
            self.chr_2_cand_rows[chrom] = rows
            self.chr_2_cand_hzxys[chrom] = hzxys
            self.chr_2_cand_ids[chrom] = ids
            u, c = np.unique(ids, return_counts=True)
            wmap = dict(zip(u, 1.0 / c))
            w = np.array([wmap[i] for i in ids])
            self.chr_2_homolog_centers[chrom] = weighted_kmeans(
                hzxys[:, 1:], w, int(copy_num))

    # -- scoring ----------------------------------------------------------

    def _prepare_score_metrics(self, local_range: int = 5) -> None:
        self.chr_2_metrics = {}
        for chrom, centers in self.chr_2_homolog_centers.items():
            prev = self.chr_2_homolog_hzxys.get(chrom)
            self.chr_2_metrics[chrom] = prepare_score_metrics_by_chr(
                self.chr_2_cand_hzxys[chrom], self.chr_2_cand_ids[chrom],
                centers, prev_homolog_hzxys=prev, local_range=local_range)

    def _calculate_scores(self) -> None:
        """Pooled-CDF weighted log scores (reference _calculate_scores,
        picker.py:233-270): the CDF reference pool for each metric is the
        concatenation across ALL chromosomes."""
        if not self.chr_2_metrics:
            return
        pools = [np.concatenate([np.ravel(m[k])
                                 for m in self.chr_2_metrics.values()])
                 for k in range(3)]
        self.chr_2_scores = {}
        w = self.metric_weights
        for chrom, m in self.chr_2_metrics.items():
            shape = m.shape[1:]
            parts = [
                np.log(cdf_scores(np.ravel(m[0]), pools[0],
                                  greater=True)).reshape(shape) * w[0],
                np.log(cdf_scores(np.ravel(m[1]), pools[1],
                                  greater=False)).reshape(shape) * w[1],
                np.log(cdf_scores(np.ravel(m[2]), pools[2],
                                  greater=False)).reshape(shape) * w[2],
            ]
            self.chr_2_scores[chrom] = np.nansum(parts, axis=0)
            for h in range(len(self.chr_2_homolog_centers[chrom])):
                col = f"score_h{h}"
                if col not in self.merged_coords.columns:
                    self.merged_coords[col] = np.nan
                self.merged_coords.loc[
                    self.merged_coords.index[self.chr_2_cand_rows[chrom]],
                    col] = self.chr_2_scores[chrom][h]

    # -- assignment -------------------------------------------------------

    def _assign_homologs_by_scores(self, allow_overlap: bool = False
                                   ) -> None:
        """Per-region exhaustive best assignment (reference
        _assign_homologs_by_scores, picker.py:271-343).  NOTE: the
        reference's allow_overlap=True branch calls
        `product(arange(n), k)` (a TypeError); here overlap enumerates
        `product(range(n), repeat=k)` — the evidently intended
        semantics."""
        if self.chr_2_homolog_hzxys:
            self.history_homolog_hzxys.append(dict(self.chr_2_homolog_hzxys))
            self.history_homolog_inds.append(dict(self.chr_2_homolog_inds))
        new_hzxys, new_inds = {}, {}
        for chrom, scores in self.chr_2_scores.items():
            if self.chr_2_change.get(chrom) is False:
                new_hzxys[chrom] = self.history_homolog_hzxys[-1][chrom]
                new_inds[chrom] = self.history_homolog_inds[-1][chrom]
                continue
            rows = self.chr_2_cand_rows[chrom]
            hzxys = self.chr_2_cand_hzxys[chrom]
            ids = self.chr_2_cand_ids[chrom]
            n_homologs = len(self.chr_2_homolog_centers[chrom])
            n_regions = int((self.merged_codebook["chr"].astype(str)
                             == str(chrom)).sum())
            picked = np.full((n_homologs, n_regions, 4), np.nan)
            picked_inds = np.full((n_homologs, n_regions), -1, np.int64)
            for r in range(n_regions):
                cand = np.where(ids == r)[0]
                if len(cand) == 0:
                    continue
                cs = scores[:, cand]                 # (H, n_cand)
                if len(cand) >= n_homologs:
                    if allow_overlap:
                        assigns = list(product(range(len(cand)),
                                               repeat=n_homologs))
                    else:
                        assigns = list(permutations(range(len(cand)),
                                                    n_homologs))
                    means = [np.nanmean([cs[h, a[h]]
                                         for h in range(n_homologs)])
                             for a in assigns]
                    best = assigns[int(np.argmax(means))]
                    for h, j in enumerate(best):
                        picked[h, r] = hzxys[cand[j]]
                        picked_inds[h, r] = rows[cand[j]]
                else:
                    if allow_overlap:
                        assigns = list(product(range(n_homologs),
                                               repeat=len(cand)))
                    else:
                        assigns = list(permutations(range(n_homologs),
                                                    len(cand)))
                    means = [np.nanmean([cs[a[j], j]
                                         for j in range(len(cand))])
                             for a in assigns]
                    best = assigns[int(np.argmax(means))]
                    for j, h in enumerate(best):
                        picked[h, r] = hzxys[cand[j]]
                        picked_inds[h, r] = rows[cand[j]]
            new_hzxys[chrom] = picked
            new_inds[chrom] = picked_inds
        self.chr_2_homolog_hzxys = new_hzxys
        self.chr_2_homolog_inds = new_inds

    def _update_homolog_centers(self, change_shrink: float = 0.8) -> None:
        """centers += shrink * (picked nanmean - centers) (reference
        _update_homolog_centers, picker.py:344-357)."""
        self.history_homolog_centers.append(
            dict(self.chr_2_homolog_centers))
        for chrom, picked in self.chr_2_homolog_hzxys.items():
            old = self.chr_2_homolog_centers[chrom]
            import warnings
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                mean = np.nanmean(picked[:, :, 1:], axis=1)
            delta = np.where(np.isnan(mean), 0.0, mean - old)
            self.chr_2_homolog_centers[chrom] = old + change_shrink * delta

    def _determine_selection_changes(self, change_th: float = 0.01) -> None:
        if not self.chr_2_change_fraction:
            self.chr_2_change_fraction = {
                c: 1.0 for c in self.chr_2_homolog_centers}
            self.chr_2_change = {c: True
                                 for c in self.chr_2_homolog_centers}
        if not self.history_homolog_inds:
            return
        for chrom, inds in self.chr_2_homolog_inds.items():
            frac = float(np.mean(
                self.history_homolog_inds[-1][chrom] != inds))
            self.chr_2_change_fraction[chrom] = frac
            self.chr_2_change[chrom] = frac > change_th

    def _filter_selected_by_scores(self) -> None:
        """Invalidate picks scoring below sum(weights)*log(0.05)
        (reference _filter_selected_by_scores, picker.py:370-400)."""
        th = float(np.sum(self.metric_weights)) * self.valid_score_th
        self.chr_2_filtered_hzxys = {}
        self.chr_2_filtered_inds = {}
        for chrom, picked in self.chr_2_homolog_hzxys.items():
            inds = self.chr_2_homolog_inds[chrom]
            sc = np.full(inds.shape, np.nan)
            for h in range(inds.shape[0]):
                ok = inds[h] >= 0
                sc[h, ok] = self.merged_coords[f"score_h{h}"].to_numpy()[
                    inds[h, ok]]
            neg = sc < th
            fh = picked.copy()
            fh[neg] = np.nan
            fi = inds.copy()
            fi[neg] = -1
            self.chr_2_filtered_hzxys[chrom] = fh
            self.chr_2_filtered_inds[chrom] = fi

    # -- composite drivers -------------------------------------------------

    def first_assignment(self, min_spot_num: int = 2, local_range: int = 5,
                         allow_overlap: bool = False) -> None:
        self._merge_decoded()
        if len(getattr(self, "merged_coords", ())) == 0:
            return
        self._generate_default_copy_num()
        self._init_homolog_centers(min_spot_num=min_spot_num)
        self._prepare_score_metrics(local_range=local_range)
        self._calculate_scores()
        self._assign_homologs_by_scores(allow_overlap=allow_overlap)

    def update_assignment(self, change_shrink: float = 0.8,
                          local_range: int = 5,
                          allow_overlap: bool = False,
                          change_th: float = 0.01) -> None:
        self._update_homolog_centers(change_shrink=change_shrink)
        self._prepare_score_metrics(local_range=local_range)
        self._calculate_scores()
        self._assign_homologs_by_scores(allow_overlap=allow_overlap)
        self._determine_selection_changes(change_th=change_th)

    def iterative_assignment(self, max_niter: int = 10,
                             min_spot_num: int = 2,
                             change_shrink: float = 0.8,
                             local_range: int = 5,
                             allow_overlap: bool = False,
                             change_th: float = 0.01,
                             filter_by_score: bool = True) -> "SpotPicker":
        """Full picking loop (reference _iterative_assignment,
        picker.py:441-478)."""
        if not self.chr_2_homolog_hzxys:
            self.first_assignment(min_spot_num=min_spot_num,
                                  local_range=local_range,
                                  allow_overlap=allow_overlap)
            if not self.chr_2_homolog_hzxys:
                return self
        self.n_iterations = 0
        for _ in range(max_niter):
            self.update_assignment(change_shrink=change_shrink,
                                   local_range=local_range,
                                   allow_overlap=allow_overlap,
                                   change_th=change_th)
            self.n_iterations += 1
            if not any(self.chr_2_change.values()):
                break
        if filter_by_score:
            self._filter_selected_by_scores()
        return self

    # -- outputs -----------------------------------------------------------

    def picked_dataframe(self, filtered: bool = True) -> pd.DataFrame:
        """Long-format picked table: one row per (chr, homolog, region)
        with the picked hzxy, source row index, and score."""
        src = (self.chr_2_filtered_hzxys if filtered and
               hasattr(self, "chr_2_filtered_hzxys")
               else self.chr_2_homolog_hzxys)
        inds = (self.chr_2_filtered_inds if filtered and
                hasattr(self, "chr_2_filtered_inds")
                else self.chr_2_homolog_inds)
        rows = []
        for chrom, picked in src.items():
            for h in range(picked.shape[0]):
                for r in range(picked.shape[1]):
                    rows.append({
                        "chr": chrom, "homolog": h, "chr_order": r,
                        "center_intensity": picked[h, r, 0],
                        "center_z": picked[h, r, 1],
                        "center_x": picked[h, r, 2],
                        "center_y": picked[h, r, 3],
                        "coord_index": int(inds[chrom][h, r]),
                    })
        return pd.DataFrame(rows)

    def save_picked(self, path: Optional[str] = None) -> None:
        """Persist picked results under a `picked/` group (reference
        _save_picked, picker.py:480-516; h5py datasets, no pytables)."""
        from ..io.spots import save_dataframe_hdf5

        path = path or self.save_file
        if not path:
            raise ValueError("no save_file configured")
        with h5py.File(path, "a") as fh:
            for sub, d in [
                    ("chr_2_homolog_hzxys", self.chr_2_homolog_hzxys),
                    ("chr_2_homolog_inds", self.chr_2_homolog_inds),
                    ("chr_2_homolog_centers", self.chr_2_homolog_centers),
                    ("chr_2_scores", self.chr_2_scores),
                    ("chr_2_filtered_hzxys",
                     getattr(self, "chr_2_filtered_hzxys", {})),
                    ("chr_2_filtered_inds",
                     getattr(self, "chr_2_filtered_inds", {})),
                    ("chr_2_copyNum",
                     {c: np.array([n]) for c, n in
                      (self.chr_2_copy_num or {}).items()})]:
                grp = fh.require_group(f"picked/{sub}")
                for key, arr in d.items():
                    if key in grp:
                        del grp[key]
                    grp.create_dataset(str(key), data=np.asarray(arr))
        save_dataframe_hdf5(self.merged_codebook, path,
                            "picked/merged_codebook")
        save_dataframe_hdf5(self.merged_coords, path,
                            "picked/merged_coords")

    @classmethod
    def load_picked(cls, path: str) -> "SpotPicker":
        """Rehydrate a saved picker (reference _load_picked,
        picker.py:517-538)."""
        from ..io.spots import load_dataframe_hdf5

        self = cls()
        with h5py.File(path, "r") as fh:
            def rd(sub):
                if f"picked/{sub}" not in fh:
                    return {}
                return {k: v[:] for k, v in fh[f"picked/{sub}"].items()}
            self.chr_2_homolog_hzxys = rd("chr_2_homolog_hzxys")
            self.chr_2_homolog_inds = rd("chr_2_homolog_inds")
            self.chr_2_homolog_centers = rd("chr_2_homolog_centers")
            self.chr_2_scores = rd("chr_2_scores")
            self.chr_2_filtered_hzxys = rd("chr_2_filtered_hzxys")
            self.chr_2_filtered_inds = rd("chr_2_filtered_inds")
            self.chr_2_copy_num = {k: int(v[0]) for k, v in
                                   rd("chr_2_copyNum").items()}
        self.merged_codebook = load_dataframe_hdf5(
            path, "picked/merged_codebook")
        self.merged_coords = load_dataframe_hdf5(
            path, "picked/merged_coords")
        return self


def batch_pick_spots(decoded_file: str, picked_file: str,
                     num_expected_lib: Optional[int] = None,
                     weights: Sequence[float] = DEFAULT_WEIGHTS,
                     score_th: float = DEFAULT_SCORE_TH,
                     max_niter: int = 10,
                     **picker_kwargs) -> Optional[SpotPicker]:
    """Decoded file -> picked file (reference batch_pick_spots,
    classes/picker.py:539-558): bail out unless the expected number of
    libraries is present, then run the full iterative assignment and
    save."""
    with h5py.File(decoded_file, "r") as fh:
        n_lib = len([k for k in fh.keys() if k != "picked"])
    if num_expected_lib is not None and n_lib != num_expected_lib:
        return None
    picker = SpotPicker(decoded_file=decoded_file,
                        metric_weights=weights,
                        valid_score_th=score_th,
                        save_file=picked_file, **picker_kwargs)
    picker.iterative_assignment(max_niter=max_niter)
    if picker.chr_2_homolog_hzxys and len(picker.merged_coords) > 0:
        picker.save_picked()
    return picker
