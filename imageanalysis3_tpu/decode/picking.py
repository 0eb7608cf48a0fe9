"""Spot picking: per-region candidate spots -> per-chromosome traces.

Behavior targets (reference spot_tools/picking.py):
  * naive picker (:14, :797-901): per region pick the candidate maximizing
    intensity (optionally weighted against distance to the chromosome
    center).
  * (dynamic / EM pickers land in later iterations of this module.)

Data model: candidate spots per region are fixed-capacity (R, K, 11) arrays
with validity masks; traces are (R, 11) rows with NaN for unpicked regions.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DEFAULT_PIXEL_SIZE_NM


@partial(jax.jit, static_argnames=("use_center_dist",))
def naive_pick_spots(cand_spots: jnp.ndarray, cand_valid: jnp.ndarray,
                     chrom_center: Optional[jnp.ndarray] = None,
                     pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                     w_int: float = 1.0, w_ctdist: float = 1.0,
                     use_center_dist: bool = True,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick one spot per region -> (trace (R, 11), picked mask (R,)).

    Score = w_int * log(h / median_h) - w_ctdist * log(dist_to_center /
    median_dist); highest-scoring valid candidate wins (the naive scoring of
    reference spot_tools/picking.py:797-901 simplified to its intensity +
    center-distance core).  Regions with no valid candidates return NaN rows.
    """
    r, k, _ = cand_spots.shape
    heights = cand_spots[..., 0]
    if chrom_center is not None and use_center_dist:
        px = jnp.asarray(pixel_size_nm, jnp.float32)
        zxy_nm = cand_spots[..., 1:4] * px
        d = jnp.linalg.norm(zxy_nm - chrom_center[None, None] * px, axis=-1)
        med_d = jnp.nanmedian(jnp.where(cand_valid, d, jnp.nan))
        med_h = jnp.nanmedian(jnp.where(cand_valid, heights, jnp.nan))
        score = (w_int * jnp.log(jnp.maximum(heights, 1e-6)
                                 / jnp.maximum(med_h, 1e-6))
                 - w_ctdist * jnp.log(jnp.maximum(d, 1e-6)
                                      / jnp.maximum(med_d, 1e-6)))
    else:
        score = heights
    score = jnp.where(cand_valid, score, -jnp.inf)
    best = jnp.argmax(score, axis=1)                       # (R,)
    picked = jnp.take_along_axis(cand_spots, best[:, None, None],
                                 axis=1)[:, 0]
    has = jnp.any(cand_valid, axis=1)
    picked = jnp.where(has[:, None], picked, jnp.nan)
    return picked, has
