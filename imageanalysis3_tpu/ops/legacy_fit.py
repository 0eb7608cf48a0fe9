"""Old-generation seeding/fitting API adapters.

The reference ships two pipeline generations; its *old* spot engine is
the module-level function surface of ``visual_tools.py`` that legacy
notebooks call directly:

  * ``get_seed_points_base``            visual_tools.py:348-382
  * ``fitsinglegaussian_fixed_width``   visual_tools.py:151-203
  * ``fit_seed_points_base``            visual_tools.py:204-259
  * ``get_STD_centers``                 visual_tools.py:260-347
  * ``fit_multi_gaussian``              visual_tools.py:1969-2072

These adapters keep those call signatures and return formats working
against the new batched engine — one engine, two API generations, not
a second implementation.  Differences from the reference, by design:

  * seeds come back sorted by height (the new seeder's order), not in
    raster order — no reference caller depends on raster order;
  * ``fit_seed_points_base``'s sequential subtract-refit becomes the
    same block-synchronous Jacobi iteration the new engine uses
    (convergence criterion preserved: max squared center move below
    ``max_dist_th``), with genuinely fitted heights/backgrounds and the
    caller's FIXED widths, like the reference;
  * ``fit_multi_gaussian`` returns the new engine's full 11-column
    natural rows (the reference's own return format, via Fitting_v3's
    ``to_natural_paramaters``) — its ``height_sensitivity`` /
    ``expect_*`` regularizer knobs are accepted and ignored (they tuned
    a MINPACK objective that no longer exists);
  * no pickle side-channel: ``get_STD_centers``'s save/load kwargs are
    accepted for signature compatibility but saving goes to ``.npy``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .seeding import get_seeds
from .gaussian_fit import (ball_offsets, gather_blocks, neighbor_lists,
                           iter_fit_seed_points)

__all__ = ["get_seed_points_base", "fitsinglegaussian_fixed_width",
           "fit_seed_points_base", "get_STD_centers",
           "fit_multi_gaussian"]


def get_seed_points_base(im, gfilt_size: float = 0.75,
                         background_gfilt_size: float = 10.0,
                         filt_size: int = 3, th_seed: float = 300.0,
                         hot_pix_th: int = 0, return_h: bool = False,
                         max_num_seeds: int = 4096) -> np.ndarray:
    """Old seeding entry (visual_tools.py:348-382): DoG local-max
    classifier at a single threshold.  Returns ``(3, N)`` int seed
    coordinates ``[z; x; y]`` (``(4, N)`` with the height row appended
    when ``return_h``), sorted by height."""
    seeds = get_seeds(jnp.asarray(im, jnp.float32),
                      max_num_seeds=max_num_seeds, th_seed=th_seed,
                      gfilt_size=gfilt_size,
                      background_gfilt_size=background_gfilt_size,
                      filt_size=filt_size, min_edge_distance=0,
                      use_dynamic_th=False,
                      remove_hot_pixel=hot_pix_th > 0,
                      hot_pixel_th=max(hot_pix_th, 1))
    valid = np.asarray(seeds.valid)
    coords = np.asarray(seeds.coords)[valid].T.astype(np.int64)
    if return_h:
        h = np.asarray(seeds.heights)[valid]
        return np.vstack([coords, h[None]])
    return coords


# ---------------------------------------------------------------------------
# Fixed-width single-Gaussian fit (Gauss-Newton on (h, cz, cx, cy, bk))
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_approx", "iters"))
def _fixed_width_fit(pixels: jnp.ndarray, coords: jnp.ndarray,
                     mask: jnp.ndarray, center0: jnp.ndarray,
                     widths: jnp.ndarray, n_approx: int = 10,
                     iters: int = 15) -> jnp.ndarray:
    """One fixed-width Gaussian on a gathered pixel block.  Parameters
    ``(h, cz, cx, cy, bk)``; widths are constants (the reference pins
    them and appends them to the result, visual_tools.py:171-201).
    Vmapped by callers over spots."""
    big = jnp.where(mask, pixels, jnp.inf)
    small = jnp.where(mask, pixels, -jnp.inf)
    lo = jnp.sort(big)[:n_approx]
    hi = jnp.sort(small)[-n_approx:]
    bk0 = jnp.median(lo)
    h0 = jnp.maximum(jnp.median(hi) - bk0, 1e-3)
    p0 = jnp.concatenate([jnp.array([h0]), center0.astype(jnp.float32),
                          jnp.array([bk0])])

    m = mask.astype(jnp.float32)
    inv_w2 = 1.0 / (widths.astype(jnp.float32) ** 2)

    def step(_, p):
        h, c, bk = p[0], p[1:4], p[4]
        d = coords - c[None]                              # (P, 3)
        e = jnp.exp(-0.5 * jnp.sum(d * d * inv_w2[None], axis=1))
        r = (pixels - (bk + h * e)) * m
        jc = (h * e)[:, None] * d * inv_w2[None]          # d/dc
        J = jnp.concatenate([e[:, None], jc,
                             jnp.ones_like(e)[:, None]], axis=1)
        J = J * m[:, None]
        jtj = J.T @ J
        jtr = J.T @ r
        damp = 1e-6 * jnp.trace(jtj) + 1e-12
        delta = jnp.linalg.solve(jtj + damp * jnp.eye(5), jtr)
        return p + delta

    p = jax.lax.fori_loop(0, iters, step, p0)
    # reference returns np.abs(p) (visual_tools.py:198)
    return jnp.concatenate([jnp.abs(p[:1]), p[1:4], jnp.abs(p[4:5])])


def fitsinglegaussian_fixed_width(data, center, radius: int = 10,
                                  n_approx: int = 10,
                                  width_zxy: Sequence[float] = (1.8, 1.5,
                                                                1.5)):
    """Old single-spot fitter (visual_tools.py:151-203).  Returns
    ``(p, success)`` with ``p = [h, z, x, y, bk, wz, wx, wy]`` — the
    widths echoed from ``width_zxy`` exactly as the reference appends
    them."""
    im = jnp.asarray(data, jnp.float32)
    if center is None:
        # top-n_approx brightest voxels' median position (:159-162)
        flat = np.asarray(im).ravel()
        order = np.argsort(flat)[-n_approx:]
        zxy = np.stack(np.unravel_index(order, im.shape))
        center = np.median(zxy, axis=1)
    center = np.asarray(center, np.float64)
    pixels, coords, mask = gather_blocks(
        im, jnp.asarray(np.round(center)[None], jnp.int32), radius)
    if not bool(np.asarray(mask).any()):
        return None, None
    p5 = np.asarray(_fixed_width_fit(
        pixels[0], coords[0], mask[0],
        jnp.asarray(center, jnp.float32),
        jnp.asarray(width_zxy, jnp.float32), n_approx=n_approx))
    return np.concatenate([p5, np.asarray(width_zxy, float)]), True


# ---------------------------------------------------------------------------
# Multi-spot fixed-width fit with Jacobi subtract-refit
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("radius", "n_approx", "max_neighbors"))
def _fit_round(im: jnp.ndarray, centers: jnp.ndarray,
               heights: jnp.ndarray, widths: jnp.ndarray,
               radius: int, n_approx: int = 10,
               max_neighbors: int = 16):
    """Refit every spot with all neighbors' reconstructions subtracted
    from its pixel block (the block-synchronous replacement for the
    reference's sequential subtract loop, visual_tools.py:224-256)."""
    n = centers.shape[0]
    base = jnp.round(centers).astype(jnp.int32)
    pixels, coords, mask = gather_blocks(im, base, radius)
    nb_idx, nb_mask = neighbor_lists(base, jnp.ones(n, bool),
                                     max_neighbors=min(max_neighbors, n),
                                     radius=radius)
    inv_w2 = 1.0 / (widths.astype(jnp.float32) ** 2)

    def contribution(pix_coords, j, ok):
        d = pix_coords - centers[j][None]
        e = jnp.exp(-0.5 * jnp.sum(d * d * inv_w2[None], axis=1))
        return jnp.where(ok, heights[j] * e, 0.0)

    def clean_block(i):
        contribs = jax.vmap(lambda j, ok: contribution(coords[i], j, ok)
                            )(nb_idx[i], nb_mask[i])
        return pixels[i] - contribs.sum(0)

    cleaned = jax.vmap(clean_block)(jnp.arange(n))
    fit = jax.vmap(lambda px, co, mk, c0: _fixed_width_fit(
        px, co, mk, c0, widths, n_approx=n_approx))(
        cleaned, coords, mask, centers)
    return fit                                             # (N, 5)


def fit_seed_points_base(im, centers, width_z: float = 1.8,
                         width_xy: float = 1.5, radius_fit: int = 5,
                         n_max_iter: int = 10,
                         max_dist_th: float = 0.25) -> np.ndarray:
    """Old multi-spot fitter (visual_tools.py:204-259): fixed-width
    Gaussians with iterative neighbor-subtracted refits until the max
    squared center move drops below ``max_dist_th``.  ``centers`` is the
    seeding format ``(3, N)``; returns ``(N, 8)`` rows
    ``[h, z, x, y, bk, wz, wx, wy]``."""
    z, x, y = np.asarray(centers)[:3]
    if len(x) == 0:
        return np.array([])
    imj = jnp.asarray(im, jnp.float32)
    widths = jnp.asarray([width_z, width_xy, width_xy], jnp.float32)
    cents = jnp.asarray(np.stack([z, x, y], axis=1), jnp.float32)
    heights = jnp.zeros(cents.shape[0], jnp.float32)  # round 0: raw image
    p5 = None
    for _ in range(max(n_max_iter, 1)):
        prev = cents
        p5 = _fit_round(imj, cents, heights, widths, radius=radius_fit)
        cents = p5[:, 1:4]
        heights = p5[:, 0]
        max_d2 = float(jnp.max(jnp.sum((cents - prev) ** 2, axis=1)))
        if max_d2 < max_dist_th:
            break
    rows = np.asarray(p5)
    wrow = np.tile(np.asarray([width_z, width_xy, width_xy]),
                   (rows.shape[0], 1))
    return np.concatenate([rows, wrow], axis=1)


def get_STD_centers(im, seeds=None, th_seed: float = 150.0,
                    dynamic: bool = False, seed_by_per: bool = False,
                    th_seed_percentile: float = 95.0,
                    min_num_seeds: int = 1,
                    remove_close_pts: bool = True,
                    close_threshold: float = 0.1,
                    fit_radius: int = 5, sort_by_h: bool = False,
                    save: bool = False, save_folder: str = "",
                    save_name: str = "", plt_val: bool = False,
                    force: bool = False, verbose: bool = False,
                    max_num_seeds: int = 2048) -> Optional[np.ndarray]:
    """Old bead-fitting entry (visual_tools.py:260-347): seed + fit one
    image, return ``(N, 3)`` zxy centers with NaN / out-of-bounds /
    mutually-close points removed (close = squared distance below
    ``close_threshold``, the reference's criterion :317-321).

    ``seed_by_per``/``th_seed_percentile`` map onto the dynamic
    threshold decay; persistence goes to ``.npy`` (no pickle)."""
    imj = jnp.asarray(im, jnp.float32)
    if seeds is None:
        s = get_seeds(imj, max_num_seeds=max_num_seeds, th_seed=th_seed,
                      use_dynamic_th=dynamic or seed_by_per,
                      min_dynamic_seeds=min_num_seeds)
        seeds_zxy = s.coords.astype(jnp.float32)
        valid = s.valid
    else:
        arr = np.asarray(seeds, np.float64)
        # accept the (3|4, N) seeding-column format, but never mistake
        # N rows of (z, x, y) for it: rows with 3 columns always win
        if arr.ndim == 2 and arr.shape[0] in (3, 4) and arr.shape[1] != 3:
            arr = arr[:3].T
        seeds_zxy = jnp.asarray(arr[:, :3], jnp.float32)
        valid = jnp.ones(len(arr), bool)
    res = iter_fit_seed_points(imj, seeds_zxy, valid, radius=fit_radius)
    rows = np.asarray(res.spots)[np.asarray(res.valid)]
    if len(rows) == 0:
        return None
    if sort_by_h:
        rows = rows[np.argsort(rows[:, 0])[::-1]]
    beads = rows[:, 1:4]
    drop = np.isnan(beads).any(axis=1)
    # valid indices are [0, shape): a center exactly at the extent is out
    drop |= (beads < 0).any(axis=1) | (beads >= np.asarray(im.shape)).any(1)
    if remove_close_pts:
        d2 = ((beads[:, None] - beads[None]) ** 2).sum(-1)
        drop |= (d2 < close_threshold).sum(1) > 1     # includes self
    beads = beads[~drop]
    if save and save_name:
        import os
        os.makedirs(save_folder or ".", exist_ok=True)
        np.save(os.path.join(save_folder or ".",
                             save_name.replace(".pkl", ".npy")), beads)
    if verbose:
        print(f"- fitted {len(rows)} points, kept {len(beads)}")
    return beads


def fit_multi_gaussian(im, seeds, width_zxy=(1.5, 2.0, 2.0),
                       fit_radius: int = 5,
                       height_sensitivity: float = 100.0,
                       expect_intensity: float = 500.0,
                       expect_weight: float = 1000.0,
                       th_to_end: float = 1e-7,
                       n_max_iter: int = 10, max_dist_th: float = 0.25,
                       min_height: float = 100.0,
                       return_im: bool = False,
                       verbose: bool = False) -> np.ndarray:
    """Old multi-Gaussian fitter (visual_tools.py:1969-2072): full
    11-parameter rows (Fitting_v3 natural format) for ``(N, 3+)`` seed
    rows, filtered by ``min_height`` with the reference's dim-image
    adjustment (:1996-1998).  The MINPACK regularizer knobs are accepted
    and ignored (see module docstring)."""
    seeds = np.asarray(seeds, np.float64)
    if len(seeds) == 0:
        return np.zeros((0, 11), np.float32)
    imj = jnp.asarray(im, jnp.float32)
    if float(np.max(np.asarray(im))) * 0.1 < min_height:
        min_height = float(np.max(np.asarray(im))) * 0.05
    res = iter_fit_seed_points(
        imj, jnp.asarray(seeds[:, :3], jnp.float32),
        jnp.ones(len(seeds), bool), radius=fit_radius,
        n_max_iter=n_max_iter, max_dist_th=max_dist_th)
    rows = np.asarray(res.spots)[np.asarray(res.valid)]
    rows = rows[rows[:, 0] >= min_height]
    if verbose:
        print(f"-- Multi-Fitting: {len(seeds)} seeds -> {len(rows)} kept")
    return rows
