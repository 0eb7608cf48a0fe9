"""Local-maximum seeding with dynamic thresholding, fixed-capacity output.

Behavior target: reference spot_tools/fitting.py:20-154 (get_seeds):
  * foreground = gaussian(0.75); candidate iff equal to its 3^3 maximum
  * background = gaussian(7.5); candidate iff not equal to its 3^3 minimum
  * signal = foreground - background must exceed th_seed
  * dynamic threshold decay th*(1 - i/n) until >= min_dynamic_seeds found
  * edge seeds (< min_edge_distance from borders) removed
  * "hot pixel" seeds (same xy in >= 3 z-layers) removed
  * sort by height, cap at max_num_seeds

TPU-first design: the reference's Python retry loop over thresholds becomes
a single pass — each candidate pixel is assigned the smallest decay level at
which it qualifies, a cumulative histogram over levels picks the level
reaching `min_dynamic_seeds`, and the xy-duplicate filter is a z-sum
counting image instead of string matching.  Output is a fixed-capacity seed
table with a validity count, so downstream fitting has static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .filters import gaussian_filter, maximum_filter, minimum_filter


class Seeds(NamedTuple):
    """Fixed-capacity seed table."""

    coords: jnp.ndarray    # (cap, 3) int32 zxy, padded with -1
    heights: jnp.ndarray   # (cap,) f32, padded with 0
    valid: jnp.ndarray     # (cap,) bool
    count: jnp.ndarray     # () int32 — number of valid seeds
    threshold: jnp.ndarray  # () f32 — the dynamic threshold actually used
    saturated: jnp.ndarray  # () bool — candidate capacity overflowed


@partial(jax.jit, static_argnames=(
    "max_num_seeds", "gfilt_size", "background_gfilt_size",
    "filt_size", "min_edge_distance", "use_dynamic_th", "dynamic_niters",
    "min_dynamic_seeds", "remove_hot_pixel", "hot_pixel_th", "cand_capacity"))
def get_seeds(im: jnp.ndarray,
              max_num_seeds: int = 1024,
              th_seed=150.0,
              gfilt_size: float = 0.75,
              background_gfilt_size: float = 7.5,
              filt_size: int = 3,
              min_edge_distance: int = 2,
              use_dynamic_th: bool = True,
              dynamic_niters: int = 10,
              min_dynamic_seeds: int = 1,
              remove_hot_pixel: bool = True,
              hot_pixel_th: int = 3,
              cand_capacity: int = 16384) -> Seeds:
    """Seed local maxima of `im` (Z, X, Y) -> fixed-capacity table."""
    imf = im.astype(jnp.float32)
    shape = imf.shape

    max_im = gaussian_filter(imf, gfilt_size) if gfilt_size else imf
    max_ft = maximum_filter(max_im, filt_size) == max_im
    min_im = (gaussian_filter(imf, background_gfilt_size)
              if background_gfilt_size else imf)
    min_ft = minimum_filter(min_im, filt_size) != min_im
    local_max = max_ft & min_ft
    diff = max_im - min_im

    # edge mask (reference remove_edge_points: keep distance <= c <= n - distance)
    d = min_edge_distance
    if d > 0:
        zi = jnp.arange(shape[0])[:, None, None]
        xi = jnp.arange(shape[1])[None, :, None]
        yi = jnp.arange(shape[2])[None, None, :]
        edge_ok = ((zi >= d) & (zi <= shape[0] - d)
                   & (xi >= d) & (xi <= shape[1] - d)
                   & (yi >= d) & (yi <= shape[2] - d))
        qualify = local_max & edge_ok
    else:
        qualify = local_max

    n_lvl = dynamic_niters if use_dynamic_th else 1
    # level(p) = smallest i with diff >= th*(1 - i/n); level n_lvl-1 is the
    # weakest threshold the reference would ever try
    frac = 1.0 - diff / th_seed                       # <= i/n  ->  qualifies
    level = jnp.ceil(frac * n_lvl).astype(jnp.int32)
    level = jnp.clip(level, 0, n_lvl)                 # n_lvl = never qualifies
    level = jnp.where(qualify, level, n_lvl)
    counts = jnp.bincount(level.ravel(), length=n_lvl + 1)[:n_lvl]
    cum = jnp.cumsum(counts)
    # chosen level: first reaching min_dynamic_seeds, else the last level
    reach = cum >= min_dynamic_seeds
    chosen = jnp.where(jnp.any(reach), jnp.argmax(reach), n_lvl - 1)
    chosen_th = th_seed * (1.0 - chosen.astype(jnp.float32) / n_lvl)
    sel = qualify & (level <= chosen)

    if remove_hot_pixel:
        xy_counts = jnp.sum(sel.astype(jnp.int32), axis=0)   # (X, Y)
        sel = sel & (xy_counts[None] < hot_pixel_th)

    n_sel = jnp.sum(sel.astype(jnp.int32))
    zc, xc, yc = jnp.nonzero(sel, size=cand_capacity, fill_value=-1)
    cand_valid = zc >= 0
    heights = jnp.where(cand_valid,
                        diff[jnp.clip(zc, 0, None), jnp.clip(xc, 0, None),
                             jnp.clip(yc, 0, None)],
                        -jnp.inf)
    # brightest-first, capped at max_num_seeds
    order = jnp.argsort(-heights)[:max_num_seeds]
    coords = jnp.stack([zc, xc, yc], axis=1)[order]
    hts = heights[order]
    valid = jnp.isfinite(hts)
    hts = jnp.where(valid, hts, 0.0)
    coords = jnp.where(valid[:, None], coords, -1)
    return Seeds(coords=coords.astype(jnp.int32), heights=hts, valid=valid,
                 count=jnp.minimum(n_sel, max_num_seeds).astype(jnp.int32),
                 threshold=chosen_th,
                 saturated=n_sel > cand_capacity)
