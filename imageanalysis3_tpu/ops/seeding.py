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

HBM discipline: images wider than ``2 * slab_x`` are swept in x-slabs
with a halo covering the total filter radius (`lax.map` over slabs),
bounding the working set for arbitrarily large planes; at the standard
2048-px width the single-shot path fits comfortably (and runs ~15%
faster) since the banded-matmul filter rewrite.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .filters import gaussian_filter, maximum_filter, minimum_filter


class Seeds(NamedTuple):
    """Fixed-capacity seed table."""

    coords: jnp.ndarray    # (cap, 3) int32 zxy, padded with -1
    heights: jnp.ndarray   # (cap,) f32, padded with 0
    valid: jnp.ndarray     # (cap,) bool
    count: jnp.ndarray     # () int32 — number of valid seeds
    threshold: jnp.ndarray  # () f32 — the dynamic threshold actually used
    saturated: jnp.ndarray  # () bool — candidate capacity overflowed


def _level_diff_hist(tile: jnp.ndarray, th_seed, x0, core_x: int,
                     full_shape, gfilt_size: float,
                     background_gfilt_size: float, filt_size: int,
                     min_edge_distance: int, n_lvl: int):
    """Per-pixel threshold level + signal height for one x-slab.

    `tile`: (Z, core_x + 2*halo, Y) f32 with `halo` columns of valid
    neighbor data (or boundary padding) on each side; `x0` is the global x
    index of the first core column.  Returns the core slab's qualified
    signal map (f32; -inf = disqualified) and the per-level histogram of
    qualifying pixels.
    """
    max_im = gaussian_filter(tile, gfilt_size) if gfilt_size else tile
    min_im = (gaussian_filter(tile, background_gfilt_size)
              if background_gfilt_size else tile)
    return _classify_from_blurs(max_im, min_im, th_seed, x0, core_x,
                                full_shape, filt_size, min_edge_distance,
                                n_lvl)


def _classify_from_blurs(max_im, min_im, th_seed, x0, core_x: int,
                         full_shape, filt_size: int,
                         min_edge_distance: int, n_lvl: int):
    """Stencil + threshold-level classification given the two blurred
    stacks (the post-blur half of `_level_diff_hist`).

    Returns (qdiff, hist): `qdiff` is the foreground-background signal
    where the voxel qualifies as a candidate (local max, inside the edge
    margin) and -inf elsewhere; `hist` counts qualifying voxels per
    threshold-decay level.
    """
    from .filters import _window_reduce_interior

    halo = (max_im.shape[1] - core_x) // 2
    if min_edge_distance >= filt_size // 2:
        # qualification is discarded within min_edge_distance of every
        # border, so the init-padded reduce_window (no materialized pad
        # copies) is exact where it matters — but only when the discarded
        # border covers the filter's reach (filt_size // 2)
        max_ft = _window_reduce_interior(max_im, filt_size, "max") == max_im
        min_ft = _window_reduce_interior(min_im, filt_size, "min") != min_im
    else:
        max_ft = maximum_filter(max_im, filt_size) == max_im
        min_ft = minimum_filter(min_im, filt_size) != min_im
    local_max = max_ft & min_ft
    diff = max_im - min_im
    if halo:
        local_max = local_max[:, halo:-halo]
        diff = diff[:, halo:-halo]

    z, _, y = full_shape
    d = min_edge_distance
    if d > 0:
        zi = jnp.arange(z)[:, None, None]
        xi = x0 + jnp.arange(core_x)[None, :, None]
        yi = jnp.arange(y)[None, None, :]
        edge_ok = ((zi >= d) & (zi <= z - d)
                   & (xi >= d) & (xi <= full_shape[1] - d)
                   & (yi >= d) & (yi <= y - d))
        qualify = local_max & edge_ok
    else:
        qualify = local_max

    # level(p) = smallest i with diff >= th*(1 - i/n); th clamped positive
    # so th <= 0 degrades to all-local-maxima (the reference's graceful
    # path) instead of NaN levels
    th = jnp.maximum(jnp.asarray(th_seed, jnp.float32), 1e-6)
    frac = 1.0 - diff / th
    level = jnp.ceil(frac * n_lvl).astype(jnp.int32)
    level = jnp.clip(level, 0, n_lvl)
    level = jnp.where(qualify, level, n_lvl).astype(jnp.int8)
    # per-level counts as unrolled compare-reduces: a scatter-add bincount
    # is ~77x slower on TPU (measured 2.24s vs 0.03s at 250M px)
    hist = jnp.stack([jnp.sum((level == i).astype(jnp.int32))
                      for i in range(n_lvl)])
    return jnp.where(qualify, diff, -jnp.inf), hist


@partial(jax.jit, static_argnames=(
    "max_num_seeds", "gfilt_size", "background_gfilt_size",
    "filt_size", "min_edge_distance", "use_dynamic_th", "dynamic_niters",
    "min_dynamic_seeds", "remove_hot_pixel", "hot_pixel_th", "cand_capacity",
    "slab_x", "pyramid_bg"))
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
              cand_capacity: int = 16384,
              slab_x: int = 1024,
              pyramid_bg: bool = False) -> Seeds:
    """Seed local maxima of `im` (Z, X, Y) -> fixed-capacity table.

    Images whose x extent exceeds ``2 * slab_x`` are processed in
    halo-overlapped x-slabs (identical results, bounded memory).
    ``cand_capacity`` is accepted for API stability but unused: the
    hierarchical top-k extraction has no intermediate candidate table.
    """
    imf = im.astype(jnp.float32)
    shape = imf.shape
    n_lvl = dynamic_niters if use_dynamic_th else 1
    assert n_lvl < 127, "dynamic_niters must fit int8 levels"

    # halo: every downstream op's reach from a core pixel
    def _radius(sigma):
        return int(4.0 * float(sigma) + 0.5) if sigma else 0

    halo = max(_radius(gfilt_size), _radius(background_gfilt_size)) \
        + (filt_size // 2)

    args = (th_seed, gfilt_size, background_gfilt_size, filt_size,
            min_edge_distance, n_lvl)

    # fused Pallas fast paths (TPU, aligned shapes, both blurs within the
    # kernel's padding reach).  The fully fused classifier streams
    # z-planes through xy-blur + 3^3 stencil in ONE kernel (blurred
    # stacks never reach HBM); the dual-blur-only kernel remains for
    # shapes/settings the classifier can't take (filt_size != 3,
    # min_edge_distance 0, z < 2).
    on_tpu_aligned = (
        jax.default_backend() == "tpu"
        and shape[1] <= 2 * slab_x
        and gfilt_size and background_gfilt_size
        and shape[1] % 8 == 0 and shape[2] % 128 == 0)
    use_fused = (
        on_tpu_aligned
        and filt_size == 3 and min_edge_distance >= 1 and shape[0] >= 2
        and _radius(gfilt_size) <= 36
        and _radius(background_gfilt_size) <= 36)
    use_pallas = (
        on_tpu_aligned
        and _radius(gfilt_size) <= 32
        and _radius(background_gfilt_size) <= 32)

    use_pyramid = (
        use_fused and pyramid_bg
        and _radius(gfilt_size) <= 12
        and shape[1] % 32 == 0 and shape[1] % 4 == 0 and shape[2] % 4 == 0)

    if use_pyramid:
        # bg blur on a 4x4-pooled grid, bilinearly upsampled in-kernel
        # (same seed sets on planted stacks; see SeedConfig.pyramid_bg)
        from .pallas_kernels import fused_seed_classify_pyramid

        qdiff, counts = fused_seed_classify_pyramid(
            imf, gfilt_size, background_gfilt_size, th_seed, n_lvl,
            min_edge_distance=min_edge_distance)
    elif use_fused:
        from .pallas_kernels import fused_seed_classify

        qdiff, counts = fused_seed_classify(
            imf, gfilt_size, background_gfilt_size, th_seed, n_lvl,
            min_edge_distance=min_edge_distance)
    elif use_pallas:
        from .pallas_kernels import dual_gaussian_blur

        max_im, min_im = dual_gaussian_blur(imf, gfilt_size,
                                            background_gfilt_size)
        qdiff, counts = _classify_from_blurs(
            max_im, min_im, th_seed, 0, shape[1], shape, filt_size,
            min_edge_distance, n_lvl)
    elif shape[1] > 2 * slab_x and shape[1] % slab_x == 0:
        n_slab = shape[1] // slab_x
        padded = jnp.pad(imf, ((0, 0), (halo, halo), (0, 0)),
                         mode="symmetric")

        def one(i):
            tile = jax.lax.dynamic_slice(
                padded, (0, i * slab_x, 0),
                (shape[0], slab_x + 2 * halo, shape[2]))
            return _level_diff_hist(tile, args[0], i * slab_x, slab_x,
                                    shape, *args[1:])

        qdiff, hists = jax.lax.map(one, jnp.arange(n_slab))
        qdiff = jnp.moveaxis(qdiff, 0, 1).reshape(shape)
        counts = jnp.sum(hists, axis=0)
    else:
        qdiff, counts = _level_diff_hist(
            imf, args[0], 0, shape[1], shape, *args[1:])

    cum = jnp.cumsum(counts)
    # chosen level: first reaching min_dynamic_seeds, else the last level
    reach = cum >= min_dynamic_seeds
    chosen = jnp.where(jnp.any(reach), jnp.argmax(reach), n_lvl - 1)
    th = jnp.maximum(jnp.asarray(th_seed, jnp.float32), 1e-6)
    chosen_th = th * (1.0 - chosen.astype(jnp.float32) / n_lvl)
    chosen_f = chosen.astype(jnp.float32)

    def in_budget(q):
        """level(q) <= chosen, with the classification's exact arithmetic
        (q = -inf maps to level +inf -> excluded; the level clip to
        [0, n_lvl] is a no-op for this comparison since chosen >= 0)."""
        return jnp.ceil((1.0 - q / th) * n_lvl) <= chosen_f

    # brightest-first extraction: 2x2x2 block-max reduce, then
    # hierarchical top_k over the 8x-smaller array (a cumsum-based
    # `nonzero` is ~30x slower on TPU — measured 1.76s vs 0.06s at
    # 250M px).  Two qualifying 3^3 local maxima are >= 2 apart in every
    # axis (an adjacent pair can both qualify only on an exact tie in
    # the blurred foreground), so each 2x2x2 block holds at most one
    # in-budget seed; the winner's exact voxel is recovered from the 8
    # block members afterwards.  Exact up to (a) such ties and (b)
    # > row_cap in-budget seeds sharing one reduced row (vanishingly
    # rare at real densities).  The reduce consumes qdiff RAW: the
    # budget threshold commutes with max (in_budget is monotone in q),
    # so it is applied to the 8x-smaller reduced array instead, and the
    # hot-pixel (xy-duplicate) screen is deferred to candidate recovery
    # — its full-image form is a second 1 GB read of qdiff to build a
    # per-(x, y) count that is only ever consulted at the <= cap*8
    # recovered voxels, where the same count is a (Z, cap, 8) column
    # gather.  Ranking consequence: a hot voxel can win its 2x2x2 block
    # and occupy a top-k slot (the seed is then recovered from the
    # block's non-hot members, or dropped); under seed saturation this
    # can displace a real block — negligible at physical hot-pixel
    # densities (a handful per FOV vs capacity 2048).
    pz, px, py = (-shape[0]) % 2, (-shape[1]) % 2, (-shape[2]) % 2
    z2, x2, y2 = [(s + p) // 2 for s, p in zip(shape, (pz, px, py))]
    red = jax.lax.reduce_window(qdiff, -jnp.inf, jax.lax.max,
                                (2, 2, 2), (2, 2, 2),
                                ((0, pz), (0, px), (0, py)))
    red = jnp.where(in_budget(red), red, -jnp.inf).ravel()
    total = red.shape[0]
    row_cap = 16
    rows = max(1, min(16384, total // row_cap))
    cols = -(-total // rows)
    flat = jnp.pad(red, (0, rows * cols - total),
                   constant_values=-jnp.inf)
    v1, i1 = jax.lax.top_k(flat.reshape(rows, cols), min(row_cap, cols))
    flat1 = (jnp.arange(rows, dtype=jnp.int32) * cols)[:, None] \
        + i1.astype(jnp.int32)
    # candidate count from the per-row top-k table (exact up to the same
    # > row_cap-per-row caveat); avoids another full-stack reduce
    n_sel = jnp.sum(jnp.isfinite(v1).astype(jnp.int32))
    k2 = min(max_num_seeds, int(v1.size))
    hts, order = jax.lax.top_k(v1.ravel(), k2)
    block_idx = flat1.ravel()[order]
    if k2 < max_num_seeds:
        hts = jnp.pad(hts, (0, max_num_seeds - k2),
                      constant_values=-jnp.inf)
        block_idx = jnp.pad(block_idx, (0, max_num_seeds - k2),
                            constant_values=0)
    bz = block_idx // (x2 * y2)
    brem = block_idx % (x2 * y2)
    bx = brem // y2
    by = brem % y2
    # winner voxel among the block's 8 members: gather qdiff + the hot
    # map at the member voxels and re-apply the budget/hot masks there
    # (the full `masked` array is never materialized)
    offs = np.indices((2, 2, 2)).reshape(3, 8).T            # (8, 3)
    cz = bz[:, None] * 2 + offs[None, :, 0]
    cx = bx[:, None] * 2 + offs[None, :, 1]
    cy = by[:, None] * 2 + offs[None, :, 2]
    inb = (cz < shape[0]) & (cx < shape[1]) & (cy < shape[2])
    czc = jnp.minimum(cz, shape[0] - 1)
    cxc = jnp.minimum(cx, shape[1] - 1)
    cyc = jnp.minimum(cy, shape[2] - 1)
    cand_q = qdiff[czc, cxc, cyc]                            # (cap, 8)
    # rows whose ranked block value is -inf are padding or beyond the
    # in-budget block count; their block_idx is arbitrary (top_k of -inf
    # rows / explicit 0-padding), so recovery must not resurrect them
    cand_ok = inb & in_budget(cand_q) & jnp.isfinite(hts)[:, None]
    if remove_hot_pixel:
        # deferred hot screen: in-budget z-count of each candidate's
        # (x, y) column (exactly the xy_counts the full-image pass built,
        # gathered only where it is read)
        col_q = qdiff[:, cxc, cyc]                           # (Z, cap, 8)
        xy_cnt = jnp.sum(in_budget(col_q).astype(jnp.int32), axis=0)
        cand_ok = cand_ok & (xy_cnt < hot_pixel_th)
    cand = jnp.where(cand_ok, cand_q, -jnp.inf)
    pick = jnp.argmax(cand, axis=1)
    coords = jnp.stack([cz[jnp.arange(cz.shape[0]), pick],
                        cx[jnp.arange(cz.shape[0]), pick],
                        cy[jnp.arange(cz.shape[0]), pick]], axis=1)
    # heights/validity from the RECOVERED voxel (exact after the hot
    # screen); a hot-dominated block reports its best surviving member
    hts_rec = jnp.max(cand, axis=1)
    valid = jnp.isfinite(hts_rec)
    if remove_hot_pixel:
        # the top-k ranking above saw pre-hot block maxima; restore the
        # by-height output contract over the surviving seeds (2048-row
        # argsort — noise next to the full-stack passes it replaces)
        order2 = jnp.argsort(-jnp.where(valid, hts_rec, -jnp.inf))
        hts_rec = hts_rec[order2]
        coords = coords[order2]
        valid = valid[order2]
    hts = jnp.where(valid, hts_rec, 0.0)
    coords = jnp.where(valid[:, None], coords, -1)
    n_out = jnp.sum(valid.astype(jnp.int32))
    return Seeds(coords=coords.astype(jnp.int32), heights=hts, valid=valid,
                 count=n_out,
                 threshold=chosen_th,
                 saturated=n_sel > max_num_seeds)
