"""Post-analysis statistics: hull-enclosure bootstrap, genomic scaling,
density-cloud scores.

Behavior targets in reference postanalysis.py:
  * is_in_hull (:158-187) — point-in-convex-hull membership;
  * Bootstrap_regions_in_domain / Bootstrap_spots_in_domain (:190-330) —
    bootstrap estimate of how much a region/spot is enclosed by a
    domain's point cloud, across chromosomes;
  * region_genomic_scaling (:330-392) — log-log power-law fit of
    physical vs genomic pairwise distance;
  * score_from_density (:665-677) and local_maximum_in_density
    (:698-713) — A/B density-cloud separation score and
    Hessian-verified density maxima.

TPU-first redesign: the reference answers each hull query by building
TWO QHull hulls per bootstrap sample and farms samples over an mp.Pool
(:318-324).  Membership in conv(X) is equivalently the convex QP
  min_{lambda in simplex} ||X^T lambda - p||^2 == 0,
which Frank-Wolfe solves in a fixed number of MXU-friendly iterations —
so the whole bootstrap (chromosomes x iterations) is ONE jitted
`vmap(vmap(...))` program with per-sample subsets drawn by
`jax.random.permutation`, no hulls, no pools.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Point-in-convex-hull via Frank-Wolfe
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_iters",))
def hull_distance(points: jnp.ndarray, valid: jnp.ndarray,
                  p: jnp.ndarray, n_iters: int = 64) -> jnp.ndarray:
    """Euclidean distance from `p` (3,) to conv(points[valid]) (N, 3).

    Away-step Frank-Wolfe on f(lam) = 0.5 ||points^T lam - p||^2 over
    the simplex restricted to valid rows.  Plain FW converges only
    O(1/k) and cannot resolve near-boundary queries; the away step
    (shrinking the weight of the worst support vertex) gives linear
    convergence on polytopes, so ~64 exact-line-search iterations reach
    well below the membership tolerance for these <= O(100)-point
    hulls.  Returns inf when fewer than 4 valid points span the hull
    (the reference's `<= 3 points -> False` degenerate case, :179-181).
    """
    pts = jnp.where(valid[:, None], points, 0.0).astype(jnp.float32)
    n_valid = jnp.sum(valid)
    # start at the valid centroid
    w0 = valid.astype(jnp.float32) / jnp.maximum(n_valid, 1)

    def body(_, w):
        x = pts.T @ w                                   # current point
        g = pts @ (x - p)                               # (N,) gradient
        gv = jnp.where(valid, g, jnp.inf)
        s = jnp.argmin(gv)                              # FW vertex
        on_support = w > 0
        ga = jnp.where(on_support, g, -jnp.inf)
        v = jnp.argmax(ga)                              # away vertex
        gap_fw = jnp.dot(g, w) - gv[s]
        gap_aw = ga[v] - jnp.dot(g, w)
        use_fw = gap_fw >= gap_aw
        e_s = jax.nn.one_hot(s, w.shape[0], dtype=w.dtype)
        e_v = jax.nn.one_hot(v, w.shape[0], dtype=w.dtype)
        d = jnp.where(use_fw, e_s - w, w - e_v)
        gmax = jnp.where(use_fw, 1.0,
                         w[v] / jnp.maximum(1.0 - w[v], 1e-12))
        step_dir = pts.T @ d
        denom = jnp.sum(step_dir * step_dir)
        gamma = jnp.clip(jnp.dot(p - x, step_dir)
                         / jnp.maximum(denom, 1e-12), 0.0, gmax)
        w = w + gamma * d
        # renormalize against drift and clamp tiny negatives
        w = jnp.maximum(w, 0.0)
        return w / jnp.maximum(jnp.sum(w), 1e-12)

    w = jax.lax.fori_loop(0, n_iters, body, w0)
    dist = jnp.linalg.norm(pts.T @ w - p)
    return jnp.where(n_valid >= 4, dist, jnp.inf)


def is_in_hull(ref_zxys, zxy, remove_self: bool = True,
               tol: float = 1e-3, n_iters: int = 64) -> bool:
    """True iff `zxy` lies inside the convex hull of `ref_zxys`
    (reference postanalysis.py:158-187: NaN rows dropped, the query
    point removed from the references when `remove_self`, and fewer
    than 4 usable points -> False).  `tol` is the hull-distance cut
    RELATIVE to the cloud's radius around the query (the QP
    replacement for QHull vertex equality — scale-free)."""
    pts = np.asarray(ref_zxys, np.float32)
    p = np.asarray(zxy, np.float32)
    if p.ndim != 1:
        raise ValueError("zxy must be one point (1d)")
    valid = ~np.isnan(pts).any(axis=1)
    if remove_self:
        valid &= ~(pts == p[None]).all(axis=1)
    d = hull_distance(jnp.asarray(np.nan_to_num(pts)),
                      jnp.asarray(valid), jnp.asarray(p),
                      n_iters=n_iters)
    scale = float(np.max(np.linalg.norm(
        np.nan_to_num(pts)[valid] - p[None], axis=1), initial=1.0))
    return bool(np.asarray(d) < tol * scale)


# ---------------------------------------------------------------------------
# Bootstrap enclosure probabilities
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("sampling_size", "n_iter", "fw_iters"))
def _bootstrap_probs(dm_zxys: jnp.ndarray, spot_zxys: jnp.ndarray,
                     sampling_size: int, n_iter: int,
                     key: jnp.ndarray, tol: float,
                     fw_iters: int) -> jnp.ndarray:
    """(C, D, 3) domain coords + (C, 3) spots -> (C,) enclosure probs.

    vmap over chromosomes x bootstrap samples; each sample draws
    `sampling_size` domain points without replacement
    (jax.random.permutation prefix) and tests hull membership."""
    c = dm_zxys.shape[0]

    def one_chrom(chrom_pts, spot, k):
        base_valid = ~jnp.isnan(chrom_pts).any(axis=1)
        # remove_self: drop domain points identical to the query
        base_valid &= ~jnp.all(chrom_pts == spot[None], axis=1)
        pts = jnp.nan_to_num(chrom_pts)

        # scale-relative membership cut (see is_in_hull)
        radius = jnp.max(jnp.where(
            base_valid, jnp.linalg.norm(pts - spot[None], axis=1), 0.0))
        cut = tol * jnp.maximum(radius, 1.0)

        def one_sample(kk):
            perm = jax.random.permutation(kk, chrom_pts.shape[0])
            sel = perm[:sampling_size]
            valid = jnp.zeros(chrom_pts.shape[0], bool).at[sel].set(True)
            d = hull_distance(pts, valid & base_valid, spot,
                              n_iters=fw_iters)
            return (d < cut).astype(jnp.float32)

        hits = jax.vmap(one_sample)(jax.random.split(k, n_iter))
        prob = jnp.mean(hits)
        return jnp.where(jnp.isnan(spot).any(), jnp.nan, prob)

    keys = jax.random.split(key, c)
    return jax.vmap(one_chrom)(dm_zxys, spot_zxys, keys)


def bootstrap_spots_in_domain(chrom_zxy_list, spot_zxy_list,
                              domain_indices: Sequence[int],
                              p_bootstrap: float = 0.25,
                              n_iter: int = 100,
                              tol: float = 1e-3,
                              fw_iters: int = 64,
                              seed: int = 0) -> np.ndarray:
    """Per-chromosome probability that a spot is enclosed by the convex
    hull of a bootstrap subsample of the domain's points.

    Behavior target: Bootstrap_spots_in_domain (postanalysis.py:257-330)
    including its sampling size ceil(len * p_bootstrap), capped one
    below the full set; NaN spots yield NaN.  One jitted program
    replaces the reference's mp.Pool-of-QHulls.
    """
    if len(chrom_zxy_list) != len(spot_zxy_list):
        raise ValueError("chromosome and spot lists differ in length")
    domain_indices = np.asarray(domain_indices, np.int32)
    n_regions = len(np.asarray(chrom_zxy_list[0]))
    if domain_indices.max() >= n_regions:
        raise ValueError("domain index out of range")
    if not 0.0 < p_bootstrap < 1.0:
        raise ValueError(f"p_bootstrap {p_bootstrap} not in (0, 1)")
    sampling_size = int(np.ceil(len(domain_indices) * p_bootstrap))
    if sampling_size == len(domain_indices):
        sampling_size -= 1
    dm = np.stack([np.asarray(z, np.float32)[domain_indices]
                   for z in chrom_zxy_list])
    spots = np.stack([np.asarray(s, np.float32)
                      for s in spot_zxy_list])
    probs = _bootstrap_probs(jnp.asarray(dm), jnp.asarray(spots),
                             sampling_size, int(n_iter),
                             jax.random.PRNGKey(seed), float(tol),
                             int(fw_iters))
    return np.asarray(probs)


def bootstrap_regions_in_domain(chrom_zxy_list, region_index: int,
                                domain_indices: Sequence[int],
                                **kwargs) -> np.ndarray:
    """Enclosure probabilities of region `region_index` inside the
    domain, per chromosome (reference Bootstrap_regions_in_domain,
    postanalysis.py:203-255: the region's own coordinate is the query
    spot for each chromosome)."""
    spots = [np.asarray(z)[int(region_index)] for z in chrom_zxy_list]
    return bootstrap_spots_in_domain(chrom_zxy_list, spots,
                                     domain_indices, **kwargs)


# ---------------------------------------------------------------------------
# Genomic scaling
# ---------------------------------------------------------------------------


def region_genomic_scaling(coordinates: np.ndarray,
                           inds: Sequence[int],
                           genomic_distance_matrix: np.ndarray
                           ) -> Tuple[float, float, float]:
    """Power-law fit of physical vs genomic pairwise distance over the
    selected regions: (slope, intercept, r) of the log-log regression.

    Behavior target: region_genomic_scaling (postanalysis.py:330-392):
    `coordinates` is either an (R, R) distance map or (R, 3) coords
    (pdist taken), upper-triangle pairs with NaNs dropped.
    """
    mat = np.asarray(coordinates, np.float64)
    if mat.ndim != 2:
        raise ValueError("coordinates must be 2d")
    if mat.shape[0] != mat.shape[1]:
        if mat.shape[1] != 3:
            raise ValueError("coordinates must be a square distance map "
                             "or (R, 3) points")
        d = mat[:, None, :] - mat[None, :, :]
        mat = np.sqrt(np.sum(d * d, axis=-1))
    inds = np.asarray(inds, int)
    sel = mat[inds][:, inds]
    gen = np.asarray(genomic_distance_matrix, np.float64)[inds][:, inds]
    iu = np.triu_indices(len(inds), 1)
    x, y = gen[iu], sel[iu]
    keep = np.isfinite(x) & np.isfinite(y) & (x > 0) & (y > 0)
    x, y = np.log(x[keep]), np.log(y[keep])
    if len(x) < 2:
        raise ValueError("not enough finite pairs to regress")
    vx = x - x.mean()
    vy = y - y.mean()
    slope = float(np.dot(vx, vy) / np.dot(vx, vx))
    intercept = float(y.mean() - slope * x.mean())
    r = float(np.dot(vx, vy)
              / np.sqrt(np.dot(vx, vx) * np.dot(vy, vy)))
    return slope, intercept, r


# ---------------------------------------------------------------------------
# Density-cloud scores
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=())
def score_from_density(dens_a: jnp.ndarray, dens_b: jnp.ndarray,
                       cutoff_percentile: float = 50.0) -> jnp.ndarray:
    """A/B demixing score: geometric mean of each cloud's fraction NOT
    overlapped by the other, after thresholding each density at the
    given percentile of its positive voxels (reference
    score_from_density, postanalysis.py:665-677).  1 = fully demixed,
    0 = identical clouds."""
    def mask_of(d):
        pos = d > 0
        # percentile over positive voxels only, computed by masked sort
        vals = jnp.where(pos, d, jnp.nan).ravel()
        th = jnp.nanpercentile(vals, cutoff_percentile)
        return d > th

    a = mask_of(dens_a)
    b = mask_of(dens_b)
    na = jnp.maximum(jnp.sum(a), 1)
    nb = jnp.maximum(jnp.sum(b), 1)
    nab = jnp.sum(a & b)
    return jnp.sqrt((1.0 - nab / na) * (1.0 - nab / nb))


@partial(jax.jit, static_argnames=("seeding_window",))
def _density_maxima_mask(density: jnp.ndarray, seeding_window: int,
                         intensity_ratio: float) -> jnp.ndarray:
    """Boolean (Z, X, Y) mask of window-maximal voxels with negative-
    definite finite-difference Hessian and intensity above
    intensity_ratio * global window-max intensity."""
    from ..ops.filters import maximum_filter

    d = density.astype(jnp.float32)
    is_max = maximum_filter(d, seeding_window) == d
    # finite-difference Hessian (reference hessian(), :678-696)
    grads = jnp.gradient(d)
    h = jnp.stack([jnp.stack(jnp.gradient(g), axis=0) for g in grads],
                  axis=0)                       # (3, 3, Z, X, Y)
    hm = jnp.moveaxis(h, (0, 1), (-2, -1))      # (Z, X, Y, 3, 3)
    hm = 0.5 * (hm + jnp.swapaxes(hm, -1, -2))  # symmetrize fd noise
    eigs = jnp.linalg.eigvalsh(hm)              # (Z, X, Y, 3)
    neg_def = jnp.all(eigs < 0, axis=-1)
    peak_int = jnp.max(jnp.where(is_max, d, -jnp.inf))
    bright = d > intensity_ratio * peak_int
    return is_max & neg_def & bright


def local_maximum_in_density(density: np.ndarray,
                             seeding_window: int = 10,
                             intensity_ratio: float = 0.25) -> np.ndarray:
    """(K, 3) coordinates of Hessian-verified local maxima of a density
    cloud (reference local_maximum_in_density, postanalysis.py:698-713,
    applied per cloud)."""
    mask = np.asarray(_density_maxima_mask(
        jnp.asarray(density), int(seeding_window),
        float(intensity_ratio)))
    return np.argwhere(mask)


def normalize_center_spots(spots: np.ndarray,
                           distance_zxy: Sequence[float] = (200.0, 108.0,
                                                            108.0),
                           center_zero: bool = True,
                           scale_variance: bool = False,
                           pca_align: bool = True,
                           scaling: float = 1.0,
                           return_pca: bool = False):
    """Standardize one chromosome's fitted spots in 3D: rescale pixel
    coordinates to isotropic units, center, optionally normalize total
    variance, and rotate onto the principal axes.

    Behavior target: spot_tools/translating.py:12-93
    (normalize_center_spots) — accepts `(N, 3)` zxy, `(N, 4)` hzxy, or
    full 11-column spot rows (coordinates at 1:4, widths at 5:8; both
    get the anisotropy rescale).  NaN rows pass through untouched by the
    PCA rotation, which is fit on the clean rows only.  The PCA here is
    an eigendecomposition of the clean rows' covariance (no sklearn);
    components are ordered by descending variance with a sign convention
    of non-negative mean projection.  Returns the standardized copy (and
    the `(3, 3)` component matrix when `return_pca`).
    """
    spots = np.array(spots, np.float64)
    ncol = spots.shape[1]
    if ncol == 3:
        coords = spots.copy()
        stds = None
    elif ncol == 4:
        coords = spots[:, -3:].copy()
        stds = None
    else:
        d = np.asarray(distance_zxy, np.float64)[:3]
        adj = d / d.min()
        coords = spots[:, 1:4] * adj[None]
        stds = spots[:, 5:8] * adj[None]

    center = np.nanmean(coords, axis=0)
    if center_zero:
        coords = coords - center
        center = np.zeros(3)
    if scale_variance:
        total = np.sqrt(np.nansum(np.nanvar(coords, axis=0)))
        coords = coords / total * scaling
        if stds is not None:
            stds = stds / total * scaling
    else:
        coords = coords * scaling
        if stds is not None:
            stds = stds * scaling

    model = None
    if pca_align:
        clean = ~np.isnan(coords).any(axis=1)
        x = coords[clean] - center
        if len(x) >= 3:
            cov = np.cov(x.T)
            w, v = np.linalg.eigh(cov)
            order = np.argsort(w)[::-1]
            model = v[:, order]
            # deterministic sign: each component points toward positive
            # mean |projection|
            proj = x @ model
            sign = np.where(np.abs(proj).sum(0) > 0,
                            np.sign(proj[np.abs(proj).argmax(0),
                                         np.arange(3)]), 1.0)
            model = model * sign[None]
            coords[clean] = x @ model + center

    if ncol == 3:
        out = coords
    elif ncol == 4:
        out = spots.copy()
        out[:, -3:] = coords
    else:
        out = spots.copy()
        out[:, 1:4] = coords
        out[:, 5:8] = stds
    if return_pca:
        return out, model
    return out
