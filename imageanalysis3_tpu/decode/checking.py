"""Picked-spot sanity checks and candidate filtering.

Behavior targets (reference spot_tools/checking.py):
  * check_spot_scores (:9-169): score the picked trace against its own
    reference statistics, drop picks below
    max(check_th * sum(weights), percentile of scores) or farther than
    hard_dist_th from the chromosome center
  * filter_candidate_spots (:170-191): empirical bounds on background,
    height, and fitted sigmas
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_PIXEL_SIZE_NM
from .scoring import chromosome_ref_stats, score_candidates


def check_picked_spots(trace: jnp.ndarray, sel_valid: jnp.ndarray,
                       chrom_center: Optional[jnp.ndarray] = None,
                       pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                       check_th: float = -3.5,
                       check_percentile: float = 1.0,
                       hard_dist_th: float = 6000.0,
                       local_size: int = 5,
                       w_ctdist: float = 2.0, w_lcdist: float = 1.0,
                       w_int: float = 1.0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stringency screen on a picked trace -> (kept mask, scores).

    A pick survives iff its score >= max(check_th * (w_ct + w_lc + w_int),
    `check_percentile`-th percentile of picked scores) and it lies within
    `hard_dist_th` nm of the chromosome center (reference
    check_spot_scores, spot_tools/checking.py:9-169).
    """
    trace = jnp.asarray(trace)
    sel_valid = jnp.asarray(sel_valid)
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    safe = jnp.where(sel_valid[:, None], trace, 0.0)
    refs = chromosome_ref_stats(safe, sel_valid, chrom_center,
                                pixel_size_nm, local_size)
    scores = score_candidates(safe[:, None], sel_valid[:, None], safe,
                              sel_valid, chrom_center, refs, pixel_size_nm,
                              local_size, w_ctdist, w_lcdist, w_int)[:, 0]
    th_abs = check_th * (w_ctdist + w_lcdist + w_int)
    finite = jnp.where(sel_valid & jnp.isfinite(scores), scores, jnp.nan)
    th_pct = jnp.nanpercentile(finite, check_percentile)
    th = jnp.maximum(th_abs, jnp.where(jnp.isnan(th_pct), -jnp.inf,
                                       th_pct))
    zxys = safe[:, 1:4] * px[None]
    if chrom_center is None:
        cnt = jnp.maximum(jnp.sum(sel_valid), 1)
        center = jnp.sum(jnp.where(sel_valid[:, None], zxys, 0.0),
                         axis=0) / cnt
    else:
        center = jnp.asarray(chrom_center, jnp.float32) * px
    ct = jnp.linalg.norm(zxys - center[None], axis=1)
    keep = sel_valid & (scores >= th) & (ct <= hard_dist_th)
    return keep, jnp.where(sel_valid, scores, jnp.nan)


def filter_candidate_spots(spots: np.ndarray,
                           valid: Optional[np.ndarray] = None,
                           background_th=(100.0, np.inf),
                           height_th=(800.0, np.inf),
                           sigma_xy_th=(0.5, 3.0),
                           sigma_z_th=(0.5, 3.5)) -> np.ndarray:
    """Empirical bounds screen on (N, 11) rows -> keep mask (reference
    filter_candidate_spots, spot_tools/checking.py:170-191)."""
    spots = np.atleast_2d(np.asarray(spots))
    keep = ((spots[:, 4] >= min(background_th))
            & (spots[:, 4] <= max(background_th))
            & (spots[:, 0] >= min(height_th))
            & (spots[:, 0] <= max(height_th))
            & (spots[:, 6] >= min(sigma_xy_th))
            & (spots[:, 6] <= max(sigma_xy_th))
            & (spots[:, 7] >= min(sigma_xy_th))
            & (spots[:, 7] <= max(sigma_xy_th))
            & (spots[:, 5] >= min(sigma_z_th))
            & (spots[:, 5] <= max(sigma_z_th)))
    if valid is not None:
        keep = keep & np.asarray(valid, bool)
    return keep
