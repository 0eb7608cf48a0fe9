"""Domain calling on single-chromosome traces: boundaries, merging,
insulation.

Behavior targets (reference ImageAnalysis3):
  * sliding-window boundary signal   domain_tools/distance.py:19-68
    (_sliding_window_dist: median/mean/insulation separation between
    intra-window and inter-window distances at each position)
  * candidate boundaries             domain_tools/calling.py:23-66
    (generate_candidate_domain_boundary: peaks of the sliding-window
    signal matched against peaks of the correlation-map discontinuity)
  * domain distances                 domain_tools/distance.py:70-205
    (domain_distance / domain_pdists: median-separation statistic between
    domain segments)
  * merging                          domain_tools/calling.py:68-139
    (merge_domains: iteratively absorb the most-similar adjacent domain)
  * insulation calling               domain_tools/calling.py:760-824
    (insulation_domain_calling: peaks of the insulation signal)

TPU-first design: the per-position python loops become one gathered
(R, 2w, 2w) window tensor with masked-median reductions (vmapped sorts on
tiny windows); peak finding is branch-free local-max + greedy distance
suppression.  Domain-level statistics, whose count is tiny (~10-60), stay
host-side over jitted segment kernels.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Masked helpers
# ---------------------------------------------------------------------------


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x[mask] (nan if empty), along the last axis."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big, axis=-1)
    n = jnp.sum(mask, axis=-1)
    half = jnp.maximum((n - 1) // 2, 0)
    lo = jnp.take_along_axis(s, half[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(s, jnp.maximum(n - 1 - half, 0)[..., None],
                             axis=-1)[..., 0]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, jnp.nan)


def _masked_mean(x, mask):
    n = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    return jnp.where(jnp.sum(mask, axis=-1) > 0,
                     jnp.sum(jnp.where(mask, x, 0.0), axis=-1) / n, jnp.nan)


# ---------------------------------------------------------------------------
# Sliding-window boundary signal
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("window", "metric"))
def sliding_window_dist(distmap: jnp.ndarray, window: int,
                        metric: str = "median",
                        valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Boundary signal at every position of a (R, R) distance map.

    Behavior target: _sliding_window_dist (domain_tools/distance.py:19-68):
    at position i compare intra distances (upper triangles of the
    [i-w, i) and [i, i+w) blocks) against inter distances (the
    [i-w, i) x [i, i+w) block).  Positions within w/2 of either end are 0.
    Metrics: 'median' ((m_inter-m_intra)/sqrt(v_inter+v_intra) with median
    stats), 'mean' (same with moments), 'insulation' (m_inter/m_intra),
    'normed_insulation' ((m_intra-m_inter)/(m_intra+m_inter)).
    """
    r = distmap.shape[0]
    w = int(window)
    if valid is None:
        valid = jnp.ones(r, bool)
    dm = distmap.astype(jnp.float32)
    ok2 = valid[:, None] & valid[None, :] & jnp.isfinite(dm)

    # pad so every window gather is in-bounds
    pad_dm = jnp.pad(dm, ((w, w), (w, w)))
    pad_ok = jnp.pad(ok2, ((w, w), (w, w)))

    a = jnp.arange(2 * w)
    tri = a[:, None] < a[None, :]                      # strict upper
    left = (a < w)
    intra_mask = tri & ((left[:, None] & left[None, :])
                        | (~left[:, None] & ~left[None, :]))
    inter_mask = left[:, None] & ~left[None, :]

    def one(i):
        blk = jax.lax.dynamic_slice(pad_dm, (i, i), (2 * w, 2 * w))
        okb = jax.lax.dynamic_slice(pad_ok, (i, i), (2 * w, 2 * w))
        intra = blk.ravel()
        mask_i = (okb & intra_mask).ravel() & (intra > 0)
        mask_o = (okb & inter_mask).ravel()
        if metric == "median":
            m_i = _masked_median(intra, mask_i)
            m_o = _masked_median(intra, mask_o)
            v_i = _masked_median((intra - m_i) ** 2, mask_i)
            v_o = _masked_median((intra - m_o) ** 2, mask_o)
            out = (m_o - m_i) / jnp.sqrt(jnp.maximum(v_o + v_i, 1e-12))
        elif metric == "mean":
            m_i = _masked_mean(intra, mask_i)
            m_o = _masked_mean(intra, mask_o)
            v_i = _masked_mean((intra - m_i) ** 2, mask_i)
            v_o = _masked_mean((intra - m_o) ** 2, mask_o)
            out = (m_o - m_i) / jnp.sqrt(jnp.maximum(v_o + v_i, 1e-12))
        elif metric == "insulation":
            out = _masked_mean(intra, mask_o) \
                / jnp.maximum(_masked_mean(intra, mask_i), 1e-12)
        elif metric == "normed_insulation":
            m_i = _masked_mean(intra, mask_i)
            m_o = _masked_mean(intra, mask_o)
            out = (m_i - m_o) / jnp.maximum(m_i + m_o, 1e-12)
        else:
            raise ValueError(metric)
        return jnp.where(jnp.isnan(out), 0.0, out)

    dists = jax.vmap(one)(jnp.arange(r))
    # zero out the boundary band (reference: i -/+ w/2 out of range -> 0)
    i = jnp.arange(r)
    inside = (i - w // 2 >= 0) & (i + w // 2 < r)
    return jnp.where(inside, dists, 0.0)


@partial(jax.jit, static_argnames=("distance", "max_peaks"))
def find_peaks_1d(x: jnp.ndarray, distance: int = 1,
                  min_height: float = -jnp.inf,
                  max_peaks: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local maxima with minimum-separation suppression -> (idx, mask).

    scipy.signal.find_peaks(distance=...) semantics: strict local maxima,
    then greedy suppression from the highest peak down.
    """
    n = x.shape[0]
    xl = jnp.roll(x, 1).at[0].set(jnp.inf)
    xr = jnp.roll(x, -1).at[-1].set(jnp.inf)
    is_peak = (x > xl) & (x > xr) & (x >= min_height)
    score = jnp.where(is_peak, x, -jnp.inf)
    k = min(max_peaks, n)
    vals, idx = jax.lax.top_k(score, k)
    ok0 = jnp.isfinite(vals)

    def body(t, kept):
        # suppress peak t if a taller kept peak is within `distance`
        close = (jnp.abs(idx - idx[t]) < distance) & kept \
            & (jnp.arange(k) < t)
        return kept.at[t].set(ok0[t] & ~jnp.any(close))

    kept = jax.lax.fori_loop(0, k, body, ok0)
    order = jnp.argsort(jnp.where(kept, idx, n + 1))
    return idx[order], kept[order]


def candidate_domain_boundaries(zxys: np.ndarray,
                                min_domain_size: int = 5,
                                match_boundary_dist: int = 3,
                                max_peaks: int = 64) -> np.ndarray:
    """Initial candidate boundary starts (always includes 0).

    Behavior target: generate_candidate_domain_boundary
    (domain_tools/calling.py:23-66): keep correlation-discontinuity peaks
    confirmed by a sliding-window distance peak within
    `match_boundary_dist`.
    """
    zxys = np.asarray(zxys, np.float64)
    valid = np.all(np.isfinite(zxys), axis=1)
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    r = len(dm)
    w = int(min_domain_size)

    slide = np.asarray(sliding_window_dist(jnp.asarray(dm), w,
                                           metric="median",
                                           valid=jnp.asarray(valid)))
    sp_idx, sp_ok = find_peaks_1d(jnp.asarray(slide), distance=w,
                                  max_peaks=max_peaks)
    slide_peaks = np.asarray(sp_idx)[np.asarray(sp_ok)]

    # correlation-map discontinuity
    dmm = np.where(np.isfinite(dm), dm, np.nan)
    mu = np.nanmean(dmm, axis=1, keepdims=True)
    sd = np.nanstd(dmm, axis=1, keepdims=True) + 1e-12
    zn = np.where(np.isfinite(dmm), (dmm - mu) / sd, 0.0)
    corr = (zn @ zn.T) / dm.shape[0]
    corr_dists = np.zeros(r)
    for i in range(w, r - w):
        corr_dists[i] = np.linalg.norm(corr[i - w:i] - corr[i:i + w])
    cp_idx, cp_ok = find_peaks_1d(jnp.asarray(corr_dists), distance=w,
                                  max_peaks=max_peaks)
    corr_peaks = np.asarray(cp_idx)[np.asarray(cp_ok)]

    kept = [0]
    for p in corr_peaks:
        if len(slide_peaks) and (np.abs(slide_peaks - p)
                                 <= match_boundary_dist).any():
            kept.append(int(p))
    return np.unique(kept)


def domain_segment_distance(dm: np.ndarray, b1: Tuple[int, int],
                            b2: Tuple[int, int]) -> float:
    """Median-separation distance between two domains of a distance map
    (reference domain_distance, domain_tools/distance.py:70-160,
    metric='median')."""
    i0, i1 = b1
    j0, j1 = b2
    intra1 = dm[i0:i1, i0:i1][np.triu_indices(i1 - i0, 1)]
    intra2 = dm[j0:j1, j0:j1][np.triu_indices(j1 - j0, 1)]
    intra = np.concatenate([intra1, intra2])
    inter = dm[i0:i1, j0:j1].ravel()
    intra = intra[np.isfinite(intra)]
    inter = inter[np.isfinite(inter)]
    if len(intra) == 0 or len(inter) == 0:
        return np.nan
    m_i, m_o = np.median(intra), np.median(inter)
    v_i = np.median((intra - m_i) ** 2)
    v_o = np.median((inter - m_o) ** 2)
    return (m_o - m_i) / np.sqrt(max(v_o + v_i, 1e-12))


def domain_pdists(zxys: np.ndarray, starts: Sequence[int]) -> np.ndarray:
    """Condensed pairwise domain distances (reference domain_pdists,
    domain_tools/distance.py:161-205)."""
    zxys = np.asarray(zxys, np.float64)
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    starts = np.asarray(sorted(starts), int)
    ends = np.append(starts[1:], len(zxys))
    out = []
    for i in range(len(starts)):
        for j in range(i + 1, len(starts)):
            out.append(domain_segment_distance(
                dm, (starts[i], ends[i]), (starts[j], ends[j])))
    return np.asarray(out)


def merge_domains(zxys: np.ndarray, starts: Sequence[int],
                  dist_th: float = 0.65,
                  max_iter: int = 64) -> np.ndarray:
    """Iteratively absorb the most-similar adjacent domain pair until all
    adjacent separations exceed `dist_th` (reference merge_domains,
    domain_tools/calling.py:68-139, distance criterion).
    """
    zxys = np.asarray(zxys, np.float64)
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    starts = list(np.asarray(sorted(starts), int))
    for _ in range(max_iter):
        if len(starts) <= 1:
            break
        ends = starts[1:] + [len(zxys)]
        adj = [domain_segment_distance(dm, (starts[i], ends[i]),
                                       (starts[i + 1], ends[i + 1]))
               for i in range(len(starts) - 1)]
        adj = np.asarray(adj)
        if not np.any(adj < dist_th):
            break
        worst = int(np.nanargmin(adj))
        del starts[worst + 1]
    return np.asarray(starts, int)


def basic_domain_calling(zxys: np.ndarray, min_domain_size: int = 5,
                         match_boundary_dist: int = 3,
                         dist_th: float = 0.65) -> np.ndarray:
    """Candidate boundaries + iterative merging -> domain start ids
    (reference basic_domain_calling, domain_tools/calling.py:140-293)."""
    starts = candidate_domain_boundaries(zxys, min_domain_size,
                                         match_boundary_dist)
    return merge_domains(zxys, starts, dist_th=dist_th)


def arrowhead_transform(distmap: np.ndarray) -> np.ndarray:
    """Arrowhead transform A[i, j] = (d(i, i-k) - d(i, i+k)) /
    (d(i, i-k) + d(i, i+k)) with k = j - i, mapping domain blocks to
    arrow-shaped sign patterns (reference External/DomainTools.py:265-330,
    the Rao et al. transform adapted to distance maps: inside-domain
    entries come out positive since d(i, i+k) < d(i, i-k) across a
    boundary-free span).
    """
    dm = np.asarray(distmap, float)
    r = len(dm)
    a = np.full((r, r), np.nan)
    for i in range(r):
        for j in range(i, r):
            k = j - i
            if i - k < 0:
                continue
            left = dm[i, i - k]
            right = dm[i, j]
            denom = left + right
            if np.isfinite(denom) and denom > 0:
                a[i, j] = (left - right) / denom
                a[j, i] = a[i, j]
    return a


def insulation_domain_calling(distmap: np.ndarray,
                              min_domain_size: int = 5,
                              window_size: Optional[int] = None,
                              use_distance: Optional[bool] = None,
                              max_peaks: int = 64) -> np.ndarray:
    """Insulation-signal domain calling (reference
    insulation_domain_calling, domain_tools/calling.py:760-824)."""
    dm = np.asarray(distmap, np.float64)
    w = int(window_size) if window_size else 2 * int(min_domain_size)
    dists = np.asarray(sliding_window_dist(jnp.asarray(dm), w,
                                           metric="insulation"))
    if use_distance is None:
        # distance map: inter > intra at boundaries -> ratio peaks there;
        # contact map: ratio dips instead
        use_distance = bool(np.nanmedian(dists[dists != 0]) >= 1.0)
    sig = dists if use_distance else -dists
    idx, ok = find_peaks_1d(jnp.asarray(sig), distance=min_domain_size - 1,
                            max_peaks=max_peaks)
    peaks = np.asarray(idx)[np.asarray(ok)]
    peaks = peaks[(peaks > 0) & (peaks < len(dm))]
    return np.unique(np.concatenate([[0], peaks]))


# ---------------------------------------------------------------------------
# Peak prominences (scipy.signal.peak_prominences semantics, host-side)
# ---------------------------------------------------------------------------


def _peak_prominences_np(x: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    """Prominence of each peak: height minus the higher of the two lowest
    points between the peak and the nearest higher terrain on each side
    (scipy.signal.peak_prominences semantics, used by the reference's
    find_peaks(prominence=...) calls)."""
    x = np.asarray(x, float)
    n = len(x)
    proms = np.zeros(len(peaks))
    for k, p in enumerate(np.asarray(peaks, int)):
        h = x[p]
        # walk left until terrain exceeds h (or the signal ends)
        i = p
        left_min = h
        while i > 0 and x[i - 1] <= h:
            i -= 1
            left_min = min(left_min, x[i])
        # walk right likewise
        j = p
        right_min = h
        while j < n - 1 and x[j + 1] <= h:
            j += 1
            right_min = min(right_min, x[j])
        proms[k] = h - max(left_min, right_min)
    return proms


def _find_peaks_np(x: np.ndarray, distance: int = 1,
                   min_prominence: Optional[float] = None) -> np.ndarray:
    """scipy.signal.find_peaks(distance=..., prominence=...) equivalent:
    strict local maxima, prominence screen, then highest-first suppression
    within `distance`."""
    x = np.asarray(x, float)
    n = len(x)
    idx = [i for i in range(1, n - 1)
           if x[i] > x[i - 1] and x[i] > x[i + 1]]
    idx = np.asarray(idx, int)
    if min_prominence is not None and len(idx):
        proms = _peak_prominences_np(x, idx)
        idx = idx[proms >= min_prominence]
    if distance > 1 and len(idx):
        keep = np.ones(len(idx), bool)
        order = np.argsort(-x[idx])
        for oi in order:
            if not keep[oi]:
                continue
            close = np.abs(idx - idx[oi]) < distance
            close[oi] = False
            keep &= ~(close & (x[idx] <= x[idx[oi]]))
            keep[oi] = True
        idx = idx[keep]
    return np.sort(idx)


# ---------------------------------------------------------------------------
# Domain-calling variants (reference domain_tools/calling.py:294-881)
# ---------------------------------------------------------------------------


def iterative_domain_calling(zxys: np.ndarray, dom_sz: int = 5,
                             split_level: int = 1, num_iter: int = 5,
                             dist_th: float = 0.65,
                             dist_th_scaling: float = 1.0,
                             match_boundary_dist: int = 3) -> np.ndarray:
    """Split-merge refinement of basic domain calling.

    Behavior target: iterative_domain_calling
    (domain_tools/calling.py:294-542): start from basic calling, then per
    iteration (a) re-run candidate calling *inside* every domain longer
    than 2*dom_sz and union the sub-boundaries (`split_level` times),
    (b) merge the union, (c) stop when the boundary set is unchanged.
    """
    zxys = np.asarray(zxys, np.float64)
    starts = basic_domain_calling(zxys, min_domain_size=dom_sz,
                                  match_boundary_dist=match_boundary_dist,
                                  dist_th=dist_th)
    for _ in range(int(num_iter)):
        split = list(starts)
        for _ in range(int(split_level)):
            ends = np.append(np.sort(np.unique(split))[1:], len(zxys))
            new = []
            for s, e in zip(np.sort(np.unique(split)), ends):
                if e - s > 2 * dom_sz:
                    sub = candidate_domain_boundaries(
                        zxys[s:e], min_domain_size=dom_sz,
                        match_boundary_dist=match_boundary_dist)
                    new += [s + int(b) for b in sub]
            split = np.unique(list(split) + new).astype(int)
        merged = merge_domains(zxys, split,
                               dist_th=dist_th * dist_th_scaling)
        if len(merged) == len(starts) and (merged == starts).all():
            break
        starts = merged
    return np.asarray(starts, int)


def sliding_window_domain_calling(coordinates: np.ndarray,
                                  window_size: int = 5,
                                  distance_metric: str = "median",
                                  min_domain_size: int = 4,
                                  min_prominence: float = 0.25,
                                  reproduce_ratio: float = 0.6,
                                  merge_candidates: bool = True,
                                  dist_th: float = 0.65,
                                  merge_strength_th: float = 1.0,
                                  return_strength: bool = False):
    """Multi-window reproducibility domain calling.

    Behavior target: Domain_Calling_Sliding_Window
    (domain_tools/calling.py:543-679): compute the sliding-window boundary
    signal for every window in [window_size, 2*window_size), find
    prominence-screened peaks per window, keep peaks reproduced (within
    ceil(min_domain_size/2)) in >= reproduce_ratio of the windows at the
    mean matched position, then optionally merge — a boundary survives the
    merge if merge keeps it OR its mean strength exceeds
    `merge_strength_th`.  `coordinates`: (R, 3) zxys in nm or an (R, R)
    distance map.
    """
    coords = np.asarray(coordinates, np.float64)
    if coords.ndim == 2 and coords.shape[0] == coords.shape[1]:
        mat = coords
        zxys = None
    else:
        zxys = coords
        mat = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    valid = jnp.asarray(np.all(np.isfinite(
        zxys if zxys is not None else mat), axis=1))

    dist_list = [np.asarray(sliding_window_dist(
        jnp.asarray(np.nan_to_num(mat)), int(w), metric=distance_metric,
        valid=valid)) for w in range(window_size, 2 * window_size)]
    peak_list = [_find_peaks_np(d, distance=min_domain_size,
                                min_prominence=min_prominence)
                 for d in dist_list]

    cand = peak_list[0]
    r = int(np.ceil(min_domain_size / 2))
    coords_mat = np.full((len(peak_list), len(cand)), np.nan)
    coords_mat[0] = cand
    for i, peaks in enumerate(peak_list[1:]):
        for j, p in enumerate(cand):
            hit = peaks[(peaks >= p - r) & (peaks <= p + r)]
            if len(hit):
                coords_mat[i + 1, j] = hit[0]
    keep = (np.isfinite(coords_mat).sum(0)
            >= reproduce_ratio * len(peak_list))
    sel = (np.round(np.nanmean(coords_mat, axis=0)).astype(int)[keep]
           if keep.any() else np.zeros(0, int))
    starts = np.unique(np.concatenate([[0], sel]))
    strengths = np.nanmean([d[starts] for d in dist_list], axis=0)

    if merge_candidates and zxys is not None and len(starts) > 1:
        merged = merge_domains(zxys, starts, dist_th=dist_th)
        kept = np.array([s for i, s in enumerate(starts)
                         if s in merged or strengths[i] > merge_strength_th],
                        int)
    else:
        kept = starts
    if return_strength:
        ks = np.array([s for st, s in zip(starts, strengths) if st in kept])
        return kept, ks
    return kept


# ---------------------------------------------------------------------------
# Contact-correlation domain calling (reference calling.py:806-881)
# ---------------------------------------------------------------------------


def neighboring_distance(zxys: np.ndarray, radius: int = 5) -> np.ndarray:
    """Distance of each point to the mean of its +-radius neighbors
    (reference _neighboring_distance, domain_tools/distance.py:444-462)."""
    zxys = np.asarray(zxys, np.float64)
    n = len(zxys)
    out = np.full(n, np.nan)
    for i in range(n):
        lo, hi = max(0, i - radius), min(n, i + radius + 1)
        nb = [j for j in range(lo, hi) if j != i]
        if nb:
            out[i] = np.linalg.norm(np.nanmean(zxys[nb], axis=0) - zxys[i])
    return out


def merge_domain_by_contact_correlation(zxys: np.ndarray,
                                        starts: Sequence[int],
                                        contact_th: float = 500.0,
                                        corr_th: float = 0.5) -> np.ndarray:
    """Merge adjacent domains while any adjacent-pair contact frequency
    exceeds `corr_th` (reference merge_domain_by_contact_correlation,
    domain_tools/calling.py:806-853)."""
    from .structure import domain_contact_freq

    zxys = np.asarray(zxys, np.float64)
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    starts = np.sort(np.asarray(starts, int))
    if 0 not in starts:
        starts = np.concatenate([[0], starts])
    while len(starts) > 1:
        cfreq = domain_contact_freq(dm, starts, contact_th)
        adj = np.diag(cfreq, 1)
        if not (adj > corr_th).any():
            break
        starts = np.delete(starts, int(np.argmax(adj)) + 1)
    return starts


def contact_correlation_domain_calling(zxys: np.ndarray,
                                       remove_outlier_th: float = 750.0,
                                       domain_size: int = 5,
                                       cand_domain_th: float = 0.3,
                                       contact_th: float = 500.0,
                                       corr_th: float = 0.5) -> np.ndarray:
    """Contact-frequency merged domain calling (reference
    contact_correlation_domain_calling, domain_tools/calling.py:855-881):
    drop NaN points and neighbor-distance outliers, call candidate
    boundaries from the sliding-window signal, merge by adjacent contact
    frequency, and map boundaries back to original region indices."""
    zxys = np.asarray(zxys, np.float64)
    good = np.where(np.isfinite(zxys).all(1))[0]
    gz = zxys[good]
    nb = neighboring_distance(gz)
    outliers = _find_peaks_np(np.nan_to_num(nb),
                              min_prominence=remove_outlier_th)
    kept = np.setdiff1d(np.arange(len(gz)), outliers)
    kz = gz[kept]
    dm = np.linalg.norm(kz[:, None] - kz[None], axis=-1)
    sig = np.asarray(sliding_window_dist(jnp.asarray(dm), domain_size))
    cand = _find_peaks_np(sig, distance=max(int(domain_size / 2), 1),
                          min_prominence=cand_domain_th)
    merged = merge_domain_by_contact_correlation(kz, cand, contact_th,
                                                 corr_th)
    return good[kept[merged]]


def find_matched_starts(starts, ref_starts, dom_sz: int = 5,
                        ignore_multi_match: bool = True) -> np.ndarray:
    """Match called domain starts to reference starts within dom_sz/2
    (reference domain_tools/manual.py:262-280: the manual-vs-automatic
    boundary reproducibility metric; a start matching multiple
    references is dropped when `ignore_multi_match`, else takes the
    first)."""
    ref = np.asarray(ref_starts, int)
    out = []
    for s in np.asarray(starts, int):
        hits = np.where(np.abs(ref - s) <= dom_sz // 2)[0]
        if len(hits) == 1 or (len(hits) > 1 and not ignore_multi_match):
            out.append(ref[hits[0]])
    return np.asarray(out, int)


# ---------------------------------------------------------------------------
# Domain difference statistics (KS / t-test)
# ---------------------------------------------------------------------------


def domain_stat(coordinates: np.ndarray,
                dom1_bounds: Sequence[int], dom2_bounds: Sequence[int],
                method: str = "ks",
                normalization_mat: Optional[np.ndarray] = None,
                return_pval: bool = True):
    """Signed separation statistic between two domain segments (reference
    domain_stat, domain_tools/distance.py:285-380): pool the two segments'
    intra distances against their inter distances, compare the samples
    with a two-sample KS statistic (signed by median(inter)-median(intra))
    or a t-test on distances normalized by the pooled median.

    `coordinates` is either an (R, 3) trace or an (R, R) distance matrix;
    `normalization_mat` optionally divides every distance by an expected
    matrix before comparison.
    """
    coords = np.asarray(coordinates, np.float64)
    method = str(method).lower()
    if method not in ("ks", "ttest"):
        raise ValueError(f"method must be ks|ttest, got {method}")
    s1, e1 = (int(b) for b in dom1_bounds)
    s2, e2 = (int(b) for b in dom2_bounds)
    if coords.ndim != 2:
        raise ValueError("coordinates must be 2D")
    if coords.shape[0] == coords.shape[1]:   # square wins, as in the ref
        mat = coords
    elif coords.shape[1] == 3:
        mat = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
    else:
        raise ValueError("coordinates must be (R, 3) or a square matrix")
    b1 = mat[s1:e1, s1:e1]
    b2 = mat[s2:e2, s2:e2]
    intra = [b1[np.triu_indices(len(b1), 1)],
             b2[np.triu_indices(len(b2), 1)]]
    inter = mat[s1:e1, s2:e2].ravel()
    if normalization_mat is not None:
        norm = np.asarray(normalization_mat, np.float64)
        n1 = norm[s1:e1, s1:e1]
        n2 = norm[s2:e2, s2:e2]
        intra = [intra[0] / n1[np.triu_indices(len(n1), 1)],
                 intra[1] / n2[np.triu_indices(len(n2), 1)]]
        inter = inter / norm[s1:e1, s2:e2].ravel()
    intra = np.concatenate(intra)
    kept_intra = intra[np.isfinite(intra)]
    kept_inter = inter[np.isfinite(inter)]
    if len(kept_intra) == 0 or len(kept_inter) == 0:
        return (0.0, 1.0) if return_pval else 0.0
    if method == "ks":
        from scipy.stats import ks_2samp
        sign = np.sign(np.nanmedian(inter) - np.nanmedian(intra))
        stat, pval = ks_2samp(kept_inter, kept_intra)
        stat = sign * stat
    else:
        from scipy.stats import ttest_ind
        scale = np.mean([np.nanmedian(kept_inter), np.nanmedian(kept_intra)])
        stat, pval = ttest_ind(kept_inter / scale, kept_intra / scale)
    return (float(stat), float(pval)) if return_pval else float(stat)


def domain_neighboring_stats(coordinates: np.ndarray,
                             domain_starts: Sequence[int],
                             method: str = "ks",
                             use_local: bool = True,
                             min_dom_sz: int = 5,
                             normalization_mat: Optional[np.ndarray] = None,
                             return_pval: bool = True):
    """Per-boundary separation statistics between adjacent domains
    (reference domain_neighboring_stats,
    domain_tools/distance.py:382-443).  With `use_local`, each side is
    clipped to at most twice the other domain's size around the shared
    boundary so long domains don't wash out the local signal."""
    starts = np.sort(np.asarray(domain_starts, int))
    coords = np.asarray(coordinates, np.float64)
    ends = np.concatenate([starts[1:], [len(coords)]])
    stats, pvals = [], []
    for i in range(len(starts) - 1):
        s1, e1 = int(starts[i]), int(ends[i])
        s2, e2 = int(starts[i + 1]), int(ends[i + 1])
        if use_local:
            ns1 = max(s1, e1 - 2 * max(e2 - s2, min_dom_sz))
            ne2 = min(e2, s2 + 2 * max(e1 - s1, min_dom_sz))
            s1, e2 = ns1, ne2
        res = domain_stat(coords, (s1, e1), (s2, e2), method=method,
                          normalization_mat=normalization_mat,
                          return_pval=return_pval)
        if return_pval:
            stats.append(res[0])
            pvals.append(res[1])
        else:
            stats.append(res)
    if return_pval:
        return np.asarray(stats), np.asarray(pvals)
    return np.asarray(stats)
