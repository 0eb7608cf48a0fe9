"""Compartment analysis: AB projection, density clouds, region scores.

Behavior targets (reference ImageAnalysis3):
  * spot normalization / PCA alignment   compartment_tools/scoring.py:13-50
    (normalize_center_spots: center to zero, optionally rotate onto
    principal axes, scale)
  * AB-axis max projection               compartment_tools/scoring.py:52-108
    (max_project_AB_compartment: rotate so the A-mean -> B-mean axis is
    the first coordinate, PCA the other two)
  * density clouds + scores              compartment_tools/scoring.py:110-420
    (convert_spots_to_cloud: render each compartment's spots as Gaussians
    on a grid; score spots/regions by log density ratio)

TPU-first design: density rendering is a vmapped closed-form Gaussian
evaluation on a fixed grid (one fused program per compartment), PCA is a
3x3 / 2x2 eigendecomposition — no sklearn.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_PIXEL_SIZE_NM


@jax.jit
def normalize_center_spots(zxys: jnp.ndarray, valid: jnp.ndarray,
                           pca_align: bool = False,
                           scaling: float = 1.0) -> jnp.ndarray:
    """Center (and optionally PCA-align) a chromosome's spot cloud
    (reference normalize_center_spots, compartment_tools/scoring.py:13-50).
    Invalid rows pass through as NaN."""
    v = valid[:, None]
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(v, zxys, 0.0), axis=0) / n
    centered = zxys - mean[None]
    cov = jnp.einsum("ni,nj->ij", jnp.where(v, centered, 0.0),
                     jnp.where(v, centered, 0.0)) / n
    _, vecs = jnp.linalg.eigh(cov)
    rot = vecs[:, ::-1]                      # descending variance
    aligned = jnp.where(pca_align, centered @ rot, centered)
    out = aligned * scaling
    return jnp.where(v, out, jnp.nan)


@jax.jit
def ab_axis_projection(zxys: jnp.ndarray, valid: jnp.ndarray,
                       a_mask: jnp.ndarray,
                       b_mask: jnp.ndarray) -> jnp.ndarray:
    """Rotate coordinates so the (A mean - B mean) axis is coordinate 0
    and the remaining two coordinates are PCA-aligned (reference
    max_project_AB_compartment, compartment_tools/scoring.py:52-108,
    built from an orthonormal basis instead of chained Givens rotations).
    """
    va = valid & a_mask
    vb = valid & b_mask
    na = jnp.maximum(jnp.sum(va), 1)
    nb = jnp.maximum(jnp.sum(vb), 1)
    ma = jnp.sum(jnp.where(va[:, None], zxys, 0.0), axis=0) / na
    mb = jnp.sum(jnp.where(vb[:, None], zxys, 0.0), axis=0) / nb
    axis = ma - mb
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    # complete an orthonormal basis
    helper = jnp.where(jnp.abs(axis[0]) < 0.9,
                       jnp.array([1.0, 0.0, 0.0]),
                       jnp.array([0.0, 1.0, 0.0]))
    u = jnp.cross(axis, helper)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    w = jnp.cross(axis, u)
    basis = jnp.stack([axis, u, w], axis=1)          # (3, 3)
    proj = zxys @ basis
    # PCA the trailing two coordinates
    v = valid[:, None]
    n = jnp.maximum(jnp.sum(valid), 1)
    tail = proj[:, 1:3]
    mean = jnp.sum(jnp.where(v, tail, 0.0), axis=0) / n
    t = tail - mean[None]
    cov = jnp.einsum("ni,nj->ij", jnp.where(v, t, 0.0),
                     jnp.where(v, t, 0.0)) / n
    _, vecs = jnp.linalg.eigh(cov)
    tail_rot = t @ vecs[:, ::-1]
    out = jnp.concatenate([proj[:, :1], tail_rot], axis=1)
    return jnp.where(v, out, jnp.nan)


@partial(jax.jit, static_argnames=("grid_radius",))
def spots_to_density(zxys: jnp.ndarray, valid: jnp.ndarray,
                     grid_radius: int = 30,
                     sigma: float = 2.0,
                     voxel: float = 1.0) -> jnp.ndarray:
    """Render a spot cloud as a summed-Gaussian density on a centered
    (2r)^3 grid (reference convert_spots_to_cloud,
    compartment_tools/scoring.py:110-240, normalize_pdf form)."""
    g = jnp.arange(-grid_radius, grid_radius, dtype=jnp.float32) * voxel \
        + voxel / 2
    zz, xx, yy = jnp.meshgrid(g, g, g, indexing="ij")
    grid = jnp.stack([zz, xx, yy], axis=-1)          # (G, G, G, 3)

    def one(c, ok):
        d2 = jnp.sum((grid - c[None, None, None]) ** 2, axis=-1)
        return jnp.where(ok, jnp.exp(-0.5 * d2 / sigma ** 2), 0.0)

    dens = jnp.sum(jax.vmap(one)(jnp.nan_to_num(zxys), valid), axis=0)
    norm = jnp.maximum(jnp.sum(dens), 1e-12)
    return dens / norm


@partial(jax.jit, static_argnames=("grid_radius",))
def compartment_scores(zxys: jnp.ndarray, valid: jnp.ndarray,
                       a_mask: jnp.ndarray, b_mask: jnp.ndarray,
                       grid_radius: int = 30, sigma: float = 2.0,
                       voxel: float = 1.0) -> jnp.ndarray:
    """Per-spot log density ratio between the A and B compartment clouds
    (the reference's density-based compartment score,
    compartment_tools/scoring.py:240-420): positive = A-like."""
    dens_a = spots_to_density(zxys, valid & a_mask, grid_radius, sigma,
                              voxel)
    dens_b = spots_to_density(zxys, valid & b_mask, grid_radius, sigma,
                              voxel)
    g0 = -grid_radius * voxel + voxel / 2
    idx = jnp.clip(jnp.round((jnp.nan_to_num(zxys) - g0) / voxel
                             ).astype(jnp.int32), 0, 2 * grid_radius - 1)
    flat_a = dens_a.reshape(-1)
    flat_b = dens_b.reshape(-1)
    g = 2 * grid_radius
    fi = (idx[:, 0] * g + idx[:, 1]) * g + idx[:, 2]
    score = jnp.log(jnp.maximum(jnp.take(flat_a, fi), 1e-12)) \
        - jnp.log(jnp.maximum(jnp.take(flat_b, fi), 1e-12))
    return jnp.where(valid, score, jnp.nan)


def ab_compartment_eigenscore(distmap: np.ndarray,
                              valid: Optional[np.ndarray] = None
                              ) -> np.ndarray:
    """Population AB score: leading eigenvector of the correlation of the
    expected-normalized distance map (the Hi-C convention backing the
    reference's population compartment assignment, postanalysis.py:393+).
    """
    dm = np.asarray(distmap, np.float64)
    r = len(dm)
    if valid is None:
        valid = np.all(np.isfinite(dm), axis=1)
    # expected distance per genomic separation
    exp = np.full(r, np.nan)
    for s in range(1, r):
        d = np.diagonal(dm, s)
        d = d[np.isfinite(d)]
        if len(d):
            exp[s] = np.median(d)
    norm = np.ones_like(dm)
    for i in range(r):
        for j in range(r):
            s = abs(i - j)
            if s > 0 and np.isfinite(exp[s]) and exp[s] > 0 \
                    and np.isfinite(dm[i, j]):
                norm[i, j] = dm[i, j] / exp[s]
    obs = np.where(np.isfinite(dm), norm, np.nan)
    mu = np.nanmean(obs, axis=1, keepdims=True)
    sd = np.nanstd(obs, axis=1, keepdims=True) + 1e-12
    z = np.where(np.isfinite(obs), (obs - mu) / sd, 0.0)
    corr = z @ z.T / r
    w, v = np.linalg.eigh(corr)
    ev = v[:, -1]
    # orient: A (positive) = closer-than-expected block with itself
    if np.nansum(ev) < 0:
        ev = -ev
    ev[~valid] = np.nan
    return ev


def winsorize(scores, l_per: float = 5.0, u_per: float = 5.0,
              normalize: bool = False) -> np.ndarray:
    """Clamp scores to [l_per, 100-u_per] percentiles, optionally min-max
    normalize (reference compartment_tools/scoring.py:351-360).
    NaN-aware: percentiles ignore NaNs and NaN entries stay NaN."""
    s = np.asarray(scores, np.float64).copy()
    finite = np.isfinite(s)
    if finite.any():
        lo = np.percentile(s[finite], l_per)
        hi = np.percentile(s[finite], 100.0 - u_per)
        s[finite] = np.clip(s[finite], lo, hi)
        if normalize:
            mn, mx = np.nanmin(s), np.nanmax(s)
            s = (s - mn) / max(mx - mn, 1e-12)
    return s


def randomize_index_dict(index_dict: dict, key1: str = "A", key2: str = "B",
                         rng: "np.random.Generator | None" = None) -> dict:
    """Shuffle the union of two compartments' region indices back into two
    groups of the original sizes — the null control for compartment
    scoring (reference compartment_tools/scoring.py:18-50).  Takes an
    explicit ``rng`` so controls are reproducible."""
    for k in (key1, key2):
        if k not in index_dict:
            raise KeyError(f"{k} not in index_dict")
    rng = np.random.default_rng() if rng is None else rng
    i1 = np.asarray(index_dict[key1], np.int64)
    i2 = np.asarray(index_dict[key2], np.int64)
    both = np.concatenate([i1, i2])
    perm = rng.permutation(len(both))
    return {key1: np.sort(both[perm[:len(i1)]]),
            key2: np.sort(both[perm[len(i1):]])}


def density_overlaps(d1, d2, method: str = "geometric") -> float:
    """Bhattacharyya-style overlap of two density clouds (reference
    compartment_tools/scoring.py:329-340)."""
    d1 = np.asarray(d1, np.float64)
    d2 = np.asarray(d2, np.float64)
    if method != "geometric":
        raise ValueError(f"unknown overlap method {method!r}")
    return float(np.nansum(np.sqrt(d1 * d2))
                 / np.sqrt(np.nansum(d1) * np.nansum(d2)))
