"""Spot scoring against a chromosome's selected trace.

Behavior targets (reference spot_tools/scoring.py):
  * linear distance score      distance_score (:6-51): -w * d / ref_d, with
    an extra penalty for d beyond the distance limit
  * intensity score            intensity_score (:53-79): w * log(I/(I+ref))
  * center / local distances   _center_distance (:111), _local_distance
    (:126-156): distance to chromosome center and to the mean of selected
    spots in a +-(local_size//2) region-id window (self excluded)
  * neighboring distances      _neighboring_distance (:157-179)
  * reference statistics       generate_ref_from_chromosome (:217-305):
    medians (or means) of the above over the currently selected trace
  * combined score             spot_score_in_chromosome (:306-410):
    w_ctdist * ct + w_lcdist * lc + w_int * int

TPU-first design: the reference loops per spot with per-id `np.where`
lookups; here selected traces are dense (R, ...) arrays indexed by sorted
region id, so local centers are a masked window-sum (one small convolution)
and every candidate in the (R, M) table scores in one fused program.
NaN-free: validity masks replace NaN sentinels.
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
