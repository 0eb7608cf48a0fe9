"""Spot scoring against a chromosome's selected trace.

Behavior targets (reference spot_tools/scoring.py):
  * linear distance score      distance_score (:6-51): -w * d / ref_d, with
    an extra penalty for d beyond the distance limit
  * CDF scores                 distance_score metric='cdf' (:31-42) /
    intensity_score metric='cdf' (:67-73) over the windowed weak CDF
    _cum_prob (:81-107)
  * intensity score            intensity_score (:53-79): w * log(I/(I+ref))
  * center / local distances   _center_distance (:111), _local_distance
    (:126-156): distance to chromosome center and to the mean of selected
    spots in a +-(local_size//2) region-id window (self excluded)
  * neighboring distances      _neighboring_distance (:157-179),
    neighboring_distances (:180-205)
  * reference statistics       generate_ref_from_chromosome (:217-305):
    medians (or the raw populations, ref_dist_metric='cdf') of the above
    over the currently selected trace
  * combined scores            spot_score_in_chromosome (:306-410):
    w_ctdist * ct + w_lcdist * lc + w_int * int;
    chromosomal_spot_scores (:423-518): the 4-metric CDF variant adding
    the candidate-cloud neighboring-distance score
  * utilities                  radius_of_gyration (:411-420),
    Normalize_Intensities (:522-527), generate_cdf_scores (:530-540),
    log/exp_distance_scores (:542-546)

TPU-first design: the reference loops per spot with per-id `np.where`
lookups; here selected traces are dense (R, ...) arrays indexed by sorted
region id, so local centers are a masked window-sum (one small convolution)
and every candidate in the (R, M) table scores in one fused program.  CDF
references are fixed-capacity sorted rows (+inf padded) with valid counts,
looked up by `searchsorted` instead of the reference's per-value
percentile loops.  NaN-free where possible: validity masks replace NaN
sentinels.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DEFAULT_PIXEL_SIZE_NM

NAN_MASK = 0.0        # score for spots whose metric is undefined (ref nan_mask)
INF_MASK = -1000.0    # score for -inf outcomes (ref inf_mask)


class ChromRefStats(NamedTuple):
    """Reference statistics of a chromosome's selected trace (nm)."""

    ct_dist: jnp.ndarray    # () median distance to chromosome center
    lc_dist: jnp.ndarray    # () median distance to local center
    nb_dist: jnp.ndarray    # () median distance between neighboring regions
    intensity: jnp.ndarray  # () median intensity


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray,
                   default: float) -> jnp.ndarray:
    x = jnp.where(mask, x, jnp.nan)
    med = jnp.nanmedian(x)
    return jnp.where(jnp.isnan(med), default, med)


def local_centers(sel_zxys: jnp.ndarray, sel_valid: jnp.ndarray,
                  local_size: int = 5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean of selected spots in a +-(local_size//2) id window, self excluded.

    sel_zxys: (R, 3) nm; returns ((R, 3) centers, (R,) has_center).
    Behavior target: _local_distance (scoring.py:126-156) with the dense
    region-id grid replacing per-id lookups.
    """
    half = (local_size - 1) // 2
    r = sel_zxys.shape[0]
    w = jnp.where(sel_valid[:, None], sel_zxys, 0.0)
    cnt = sel_valid.astype(jnp.float32)
    sums = jnp.zeros_like(w)
    counts = jnp.zeros_like(cnt)
    for off in range(-half, half + 1):
        if off == 0:
            continue
        rolled_w = jnp.roll(w, -off, axis=0)
        rolled_c = jnp.roll(cnt, -off, axis=0)
        idx = jnp.arange(r) + off
        inb = (idx >= 0) & (idx < r)
        sums = sums + jnp.where(inb[:, None], rolled_w, 0.0)
        counts = counts + jnp.where(inb, rolled_c, 0.0)
    has = counts > 0
    centers = sums / jnp.maximum(counts, 1.0)[:, None]
    return centers, has


def neighboring_dists(sel_zxys: jnp.ndarray, sel_valid: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distance from region i to region i+1 ((R,), validity mask).
    Behavior target: _neighboring_distance (scoring.py:157-179)."""
    d = jnp.linalg.norm(sel_zxys[1:] - sel_zxys[:-1], axis=1)
    ok = sel_valid[1:] & sel_valid[:-1]
    pad = jnp.zeros(1, d.dtype)
    return jnp.concatenate([d, pad]), jnp.concatenate([ok, jnp.zeros(1, bool)])


@partial(jax.jit, static_argnames=("local_size",))
def chromosome_ref_stats(sel_spots: jnp.ndarray, sel_valid: jnp.ndarray,
                         chrom_center: Optional[jnp.ndarray] = None,
                         pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                         local_size: int = 5) -> ChromRefStats:
    """Median reference stats from a selected trace (reference
    generate_ref_from_chromosome, scoring.py:217-305, ref_dist_metric=median).

    sel_spots: (R, 11) natural rows indexed by sorted region id.
    """
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    zxys = sel_spots[:, 1:4] * px[None]
    if chrom_center is None:
        cnt = jnp.maximum(jnp.sum(sel_valid), 1)
        center = jnp.sum(jnp.where(sel_valid[:, None], zxys, 0.0), axis=0) \
            / cnt
    else:
        center = chrom_center * px
    ct = jnp.linalg.norm(zxys - center[None], axis=1)
    ct_med = _masked_median(ct, sel_valid, 1000.0)

    lc_centers, lc_has = local_centers(zxys, sel_valid, local_size)
    lc = jnp.linalg.norm(zxys - lc_centers, axis=1)
    lc_med = _masked_median(lc, sel_valid & lc_has, jnp.inf)

    nb, nb_ok = neighboring_dists(zxys, sel_valid)
    nb_med = _masked_median(nb, nb_ok, jnp.inf)

    ints = sel_spots[:, 0]
    int_med = _masked_median(ints, sel_valid & (ints > 0), 1.0)
    return ChromRefStats(ct_dist=ct_med, lc_dist=lc_med, nb_dist=nb_med,
                         intensity=int_med)


def linear_distance_score(dist: jnp.ndarray, ref_dist: jnp.ndarray,
                          weight: float = 1.0,
                          max_limit: float = jnp.inf) -> jnp.ndarray:
    """-w * d/ref, with an extra -w*(d-max)/ref beyond the limit
    (reference distance_score, scoring.py:23-30, metric='linear')."""
    ref = jnp.maximum(ref_dist, 1e-6)
    s = -weight * dist / ref
    over = jnp.maximum(dist - max_limit, 0.0)
    return s - weight * over / ref


def intensity_score(intensity: jnp.ndarray, ref_intensity: jnp.ndarray,
                    weight: float = 1.0) -> jnp.ndarray:
    """w * log(I / (I + ref)); I <= 0 maps to INF_MASK
    (reference intensity_score, scoring.py:63-66, metric='linear')."""
    ref = jnp.maximum(ref_intensity, 1e-6)
    pos = intensity > 0
    s = weight * jnp.log(jnp.maximum(intensity, 1e-12)
                         / (jnp.maximum(intensity, 1e-12) + ref))
    return jnp.where(pos, s, INF_MASK)


@partial(jax.jit, static_argnames=("local_size",))
def score_candidates(cand_spots: jnp.ndarray, cand_valid: jnp.ndarray,
                     sel_spots: jnp.ndarray, sel_valid: jnp.ndarray,
                     chrom_center: Optional[jnp.ndarray] = None,
                     ref_stats: Optional[ChromRefStats] = None,
                     pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                     local_size: int = 5,
                     w_ctdist: float = 2.0, w_lcdist: float = 1.0,
                     w_int: float = 1.0,
                     max_distance_limit: float = 3000.0) -> jnp.ndarray:
    """Score every candidate in the (R, M) table -> (R, M) scores.

    The E-step scoring of the EM picker (reference
    spot_score_in_chromosome, scoring.py:306-410, metric='linear'):
    score = w_ct * ct + w_lc * lc + w_int * int, with undefined metrics
    contributing NAN_MASK.
    """
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    if ref_stats is None:
        ref_stats = chromosome_ref_stats(sel_spots, sel_valid, chrom_center,
                                         pixel_size_nm, local_size)
    sel_zxys = sel_spots[:, 1:4] * px[None]
    if chrom_center is None:
        cnt = jnp.maximum(jnp.sum(sel_valid), 1)
        center = jnp.sum(jnp.where(sel_valid[:, None], sel_zxys, 0.0),
                         axis=0) / cnt
    else:
        center = chrom_center * px

    zxys = cand_spots[..., 1:4] * px[None, None]        # (R, M, 3)
    ct = jnp.linalg.norm(zxys - center[None, None], axis=-1)
    ct_s = linear_distance_score(ct, ref_stats.ct_dist, w_ctdist,
                                 max_distance_limit)

    lc_centers, lc_has = local_centers(sel_zxys, sel_valid, local_size)
    lc = jnp.linalg.norm(zxys - lc_centers[:, None], axis=-1)
    lc_ref_ok = jnp.isfinite(ref_stats.lc_dist)
    lc_s = jnp.where(lc_has[:, None] & lc_ref_ok,
                     linear_distance_score(lc, ref_stats.lc_dist, w_lcdist,
                                           max_distance_limit),
                     NAN_MASK)

    int_s = intensity_score(cand_spots[..., 0], ref_stats.intensity, w_int)
    total = ct_s + lc_s + int_s
    return jnp.where(cand_valid, total, -jnp.inf)


# ---------------------------------------------------------------------------
# CDF-metric scoring (reference metric='cdf' paths) and utilities
# ---------------------------------------------------------------------------


def radius_of_gyration(zxys: jnp.ndarray,
                       valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sqrt(mean |r - <r>|^2) over valid rows (reference
    radius_of_gyration, scoring.py:411-420; NaN rows ignored)."""
    if valid is None:
        valid = jnp.ones(zxys.shape[0], bool)
    valid = valid & jnp.all(jnp.isfinite(zxys), axis=-1)
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(jnp.where(valid[:, None], zxys, 0.0), axis=0) / n
    r2 = jnp.sum((zxys - mean[None]) ** 2, axis=-1)
    return jnp.sqrt(jnp.sum(jnp.where(valid, r2, 0.0)) / n)


def sort_ref_values(values: jnp.ndarray,
                    valid: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Metric population -> (+inf-padded ascending row, valid count): the
    fixed-capacity device form of the reference's NaN-dropped ref arrays
    (generate_ref_from_chromosome :254-276, ref_dist_metric='cdf')."""
    keep = jnp.isfinite(values)
    if valid is not None:
        keep = keep & valid
    row = jnp.sort(jnp.where(keep, values, jnp.inf).reshape(-1))
    return row, jnp.sum(keep).astype(jnp.int32)


def cum_prob(sorted_ref: jnp.ndarray, count: jnp.ndarray,
             targets: jnp.ndarray, vmin: float = -jnp.inf,
             vmax: float = jnp.inf) -> jnp.ndarray:
    """Windowed weak CDF P(ref <= target) (reference _cum_prob,
    scoring.py:81-107): rescaled to the [vmin, vmax] probability window,
    clipped to [0, 1]; NaN targets count as +inf (CDF 1)."""
    cnt = jnp.maximum(count.astype(jnp.float32), 1.0)

    def weak(t):
        # clamp to the valid count: side='right' on a +inf target would
        # land past the +inf padding, inflating the denominator window
        r = jnp.minimum(jnp.searchsorted(sorted_ref, t, side="right"),
                        count).astype(jnp.float32)
        return jnp.where(jnp.isnan(t), cnt, r) / cnt

    p = weak(targets)
    min_p = weak(jnp.asarray(vmin, jnp.float32))
    max_p = weak(jnp.asarray(vmax, jnp.float32))
    span = max_p - min_p
    p = jnp.where(span > 0, (p - min_p) / jnp.maximum(span, 1e-12),
                  p - min_p)
    return jnp.clip(p, 0.0, 1.0)


def cdf_distance_score(dist: jnp.ndarray, sorted_ref: jnp.ndarray,
                       count: jnp.ndarray, weight: float = 1.0,
                       distance_limits=(-jnp.inf, jnp.inf),
                       nan_mask: float = -1000.0) -> jnp.ndarray:
    """w * log(1 - CDF(d)) with -inf where the survival mass is zero and
    `nan_mask` for NaN distances (reference distance_score metric='cdf',
    scoring.py:31-47)."""
    surv = 1.0 - cum_prob(sorted_ref, count, dist,
                          vmin=float(min(distance_limits)),
                          vmax=float(max(distance_limits)))
    s = jnp.where(surv > 0, weight * jnp.log(jnp.maximum(surv, 1e-30)),
                  -jnp.inf)
    return jnp.where(jnp.isnan(dist), nan_mask, s)


def cdf_intensity_score(intensity: jnp.ndarray, sorted_ref: jnp.ndarray,
                        count: jnp.ndarray, weight: float = 1.0,
                        intensity_th: float = 0.0,
                        nan_mask: float = 0.0,
                        inf_mask: float = -1000.0) -> jnp.ndarray:
    """w * log(CDF(I)) over the [intensity_th, inf) window, with
    zero-mass outcomes mapped to `inf_mask` (reference intensity_score
    metric='cdf', scoring.py:67-76)."""
    p = cum_prob(sorted_ref, count, intensity, vmin=intensity_th)
    s = jnp.where(p > 0, weight * jnp.log(jnp.maximum(p, 1e-30)), -jnp.inf)
    s = jnp.where(jnp.isnan(s), nan_mask, s)
    return jnp.where(jnp.isinf(s), inf_mask, s)


class ChromRefArrays(NamedTuple):
    """Raw metric populations of a selected trace, sorted (+inf padded):
    the ref_dist_metric='cdf' branch of generate_ref_from_chromosome
    (reference scoring.py:296-300)."""
    ct: jnp.ndarray
    ct_count: jnp.ndarray
    lc: jnp.ndarray
    lc_count: jnp.ndarray
    nb: jnp.ndarray
    nb_count: jnp.ndarray
    ints: jnp.ndarray
    int_count: jnp.ndarray


@partial(jax.jit, static_argnames=("local_size",))
def chromosome_ref_arrays(sel_spots: jnp.ndarray, sel_valid: jnp.ndarray,
                          chrom_center: Optional[jnp.ndarray] = None,
                          pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                          local_size: int = 5,
                          intensity_th: float = 0.0) -> ChromRefArrays:
    """CDF reference populations from a selected trace (R, 11)."""
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    zxys = sel_spots[:, 1:4] * px[None]
    if chrom_center is None:
        cnt = jnp.maximum(jnp.sum(sel_valid), 1)
        center = jnp.sum(jnp.where(sel_valid[:, None], zxys, 0.0),
                         axis=0) / cnt
    else:
        center = chrom_center * px
    ct = jnp.linalg.norm(zxys - center[None], axis=1)
    ct_row, ct_n = sort_ref_values(ct, sel_valid)

    lc_centers, lc_has = local_centers(zxys, sel_valid, local_size)
    lc = jnp.linalg.norm(zxys - lc_centers, axis=1)
    lc_row, lc_n = sort_ref_values(lc, sel_valid & lc_has)

    nb, nb_ok = neighboring_dists(zxys, sel_valid)
    nb_row, nb_n = sort_ref_values(nb, nb_ok)

    ints = sel_spots[:, 0]
    int_row, int_n = sort_ref_values(ints, sel_valid & (ints > intensity_th))
    return ChromRefArrays(ct_row, ct_n, lc_row, lc_n, nb_row, nb_n,
                          int_row, int_n)


def candidate_neighbor_dists(cand_zxys: jnp.ndarray,
                             cand_valid: jnp.ndarray) -> jnp.ndarray:
    """(R, M) mean of forward/backward candidate-cloud neighbor distances.

    Per candidate at region r: the median distance to the valid
    candidates of region r+1 (forward) and r-1 (backward), averaged;
    the reference gates BOTH directions on the forward region being
    populated (neighboring_distances :192-203 only fills either when
    `id+1 in ids`), and that quirk is preserved so scores match.
    """
    r = cand_zxys.shape[0]
    d = jnp.linalg.norm(cand_zxys[:-1, :, None] - cand_zxys[1:, None],
                        axis=-1)                          # (R-1, M, M')
    nxt_ok = cand_valid[1:]                                # (R-1, M')
    d = jnp.where(nxt_ok[:, None, :], d, jnp.nan)
    med_next = jnp.nanmedian(d, axis=-1)                   # (R-1, M) fwd
    prv_ok = cand_valid[:-1]
    d2 = jnp.where(prv_ok[:, :, None], d, jnp.nan)
    med_prev = jnp.nanmedian(d2, axis=1)                   # (R-1, M') rev
    nanrow = jnp.full((1, cand_zxys.shape[1]), jnp.nan)
    fwd = jnp.concatenate([med_next, nanrow], axis=0)      # (R, M)
    rev = jnp.concatenate([nanrow, med_prev], axis=0)
    has_fwd = jnp.concatenate([jnp.any(nxt_ok, -1),
                               jnp.zeros(1, bool)])        # (R,)
    both = jnp.stack([fwd, rev])
    nb = jnp.nanmean(both, axis=0)
    return jnp.where(has_fwd[:, None], nb, jnp.nan)


@partial(jax.jit, static_argnames=("local_size", "return_separate"))
def chromosomal_spot_scores(cand_spots: jnp.ndarray,
                            cand_valid: jnp.ndarray,
                            sel_spots: jnp.ndarray,
                            sel_valid: jnp.ndarray,
                            chrom_center: Optional[jnp.ndarray] = None,
                            ref_arrays: Optional[ChromRefArrays] = None,
                            pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                            local_size: int = 5,
                            w_ctdist: float = 1.0, w_lcdist: float = 1.0,
                            w_int: float = 1.0, w_nbdist: float = 1.0,
                            intensity_th: float = 1.0,
                            distance_limits=(0.0, jnp.inf),
                            return_separate: bool = False):
    """4-metric CDF scores of every candidate in the (R, M) table
    (reference chromosomal_spot_scores, scoring.py:423-518): center-dist,
    local-dist, candidate-cloud neighbor-dist, and intensity, each scored
    against the selected trace's CDF reference populations."""
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    if ref_arrays is None:
        ref_arrays = chromosome_ref_arrays(sel_spots, sel_valid,
                                           chrom_center, pixel_size_nm,
                                           local_size, intensity_th)
    sel_zxys = sel_spots[:, 1:4] * px[None]
    if chrom_center is None:
        cnt = jnp.maximum(jnp.sum(sel_valid), 1)
        center = jnp.sum(jnp.where(sel_valid[:, None], sel_zxys, 0.0),
                         axis=0) / cnt
    else:
        center = chrom_center * px

    zxys = cand_spots[..., 1:4] * px[None, None]           # (R, M, 3)
    zxys = jnp.where(cand_valid[..., None], zxys, jnp.nan)
    ct = jnp.linalg.norm(zxys - center[None, None], axis=-1)
    ct_s = cdf_distance_score(ct, ref_arrays.ct, ref_arrays.ct_count,
                              w_ctdist, distance_limits)

    lc_centers, lc_has = local_centers(sel_zxys, sel_valid, local_size)
    lc = jnp.linalg.norm(zxys - lc_centers[:, None], axis=-1)
    lc = jnp.where(lc_has[:, None], lc, jnp.nan)
    lc_s = cdf_distance_score(lc, ref_arrays.lc, ref_arrays.lc_count,
                              w_lcdist, distance_limits)

    nb = candidate_neighbor_dists(zxys, cand_valid)
    nb_s = cdf_distance_score(nb, ref_arrays.nb, ref_arrays.nb_count,
                              w_nbdist, distance_limits)

    int_s = cdf_intensity_score(cand_spots[..., 0], ref_arrays.ints,
                                ref_arrays.int_count, w_int, intensity_th)
    if return_separate:
        return ct_s, lc_s, nb_s, int_s
    total = ct_s + lc_s + nb_s + int_s
    return jnp.where(cand_valid, total, -jnp.inf)


def generate_cdf_scores(values: jnp.ndarray, pos_sorted: jnp.ndarray,
                        pos_count: jnp.ndarray,
                        neg_sorted: Optional[jnp.ndarray] = None,
                        neg_count: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """Weak-CDF log odds used by the decoders (reference
    generate_cdf_scores, scoring.py:530-540): log(P(pos <= v) + 0.5/n+),
    normalized by its floor; minus the matching negative-reference term
    when given."""
    n_pos = jnp.maximum(pos_count.astype(jnp.float32), 1.0)
    p = jnp.searchsorted(pos_sorted, values,
                         side="right").astype(jnp.float32) / n_pos
    floor = 0.5 / n_pos
    score = jnp.log(p + floor) - jnp.log(floor)
    if neg_sorted is not None:
        n_neg = jnp.maximum(neg_count.astype(jnp.float32), 1.0)
        q = jnp.searchsorted(neg_sorted, values,
                             side="right").astype(jnp.float32) / n_neg
        neg_floor = 0.5 / n_neg
        score = score - (jnp.log(1.0 - q + neg_floor)
                         - jnp.log(neg_floor))
    return score


def log_distance_scores(values: jnp.ndarray,
                        ref_length: float = 2000.0) -> jnp.ndarray:
    """log(d/ref + 1) (reference scoring.py:542-543)."""
    return jnp.log(jnp.asarray(values, jnp.float32) / ref_length + 1.0)


def exp_distance_scores(values: jnp.ndarray,
                        ref_length: float = 2000.0) -> jnp.ndarray:
    """-exp(d/ref) (reference scoring.py:545-546)."""
    return -jnp.exp(jnp.asarray(values, jnp.float32) / ref_length)


def normalize_intensities(spots: jnp.ndarray, all_intensities: jnp.ndarray,
                          valid: Optional[jnp.ndarray] = None,
                          method: str = "median") -> jnp.ndarray:
    """Divide spot heights by the population's median/mean intensity
    (reference Normalize_Intensities, scoring.py:522-527)."""
    vals = jnp.where(valid, all_intensities, jnp.nan) \
        if valid is not None else all_intensities
    if method == "median":
        norm = jnp.nanmedian(vals)
    elif method == "mean":
        norm = jnp.nanmean(vals)
    else:
        raise ValueError(f"unsupported method: {method}")
    norm = jnp.maximum(norm, 1e-12)
    return spots.at[..., 0].set(spots[..., 0] / norm)
