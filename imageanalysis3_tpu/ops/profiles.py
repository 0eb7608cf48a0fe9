"""Correction-profile generation: illumination, bleedthrough, chromatic.

Behavior targets (reference ImageAnalysis3):
  * illumination profiles      correction_tools/illumination.py:16-206
    (Generate_illumination_correction / _image_to_profile: per FOV clip to
    [5, 90] percentiles, sum over z, gaussian(60); mean over FOVs,
    gaussian(60) again, normalize by max)
  * bleedthrough profiles      correction_tools/bleedthrough.py:56-520
    (find_bleedthrough_pairs: fit ref-channel spots, per-spot linear
    regression of target crop on reference crop, keep r^2 >= 0.81;
    interpolate slopes with an order-2 polynomial field; per-pixel
    channel-mixing matrix inverse)
  * chromatic constants        correction_tools/chromatic.py:119+ /
    corrections.py:885-1008 (bead fits in two channels -> paired centers
    -> per-dimension polynomial shift lstsq)

TPU-first design: every numeric stage is a jitted array program — the
percentile clip uses the counting-quantile (no 250M-element sort), the
per-spot regressions are one vmapped closed-form (cov/var) pass over
gathered pixel blocks, the polynomial field fit is a normalized lstsq,
and the per-pixel mixing inverse is a batched `jnp.linalg.inv` over
(X*Y, C, C).  Orchestration over FOV files stays on host (streaming
accumulator — one stack in HBM at a time).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .filters import gaussian_filter
from .gaussian_fit import (fit_fov_image, gather_blocks, get_centers,
                           select_sparse_centers)
from .matching import find_paired_centers
from .warp import fit_chromatic_constants, polynomial_basis

_HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Quantiles (counting-based, no huge sorts)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("q", "bits"))
def counting_quantile(im: jnp.ndarray, q: float, bits: int = 18) -> jnp.ndarray:
    """Quantile via binary search over a fixed-point value domain (the
    generalization of filters.counting_median to arbitrary q), exact on a
    1/4-integer grid within [0, 2^16)."""
    imf = im.astype(jnp.float32)
    n = imf.size
    rank = jnp.maximum(1, jnp.ceil(q * n).astype(jnp.int32))
    scale = 4.0
    codes = jnp.floor(imf * scale + 0.5).astype(jnp.int32)
    lo = jnp.zeros((), jnp.int32)
    hi = jnp.full((), (1 << bits) - 1, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        cnt = jnp.sum((codes <= mid).astype(jnp.int32))
        ok = cnt >= rank
        return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, bits, body, (lo, hi))
    return lo.astype(jnp.float32) / scale


# ---------------------------------------------------------------------------
# Illumination flat-field generation
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cap_lo", "cap_hi", "smooth_sigma"))
def _stack_to_illumination(im: jnp.ndarray, cap_lo: float = 0.05,
                           cap_hi: float = 0.90,
                           smooth_sigma: float = 60.0) -> jnp.ndarray:
    """One stack's illumination contribution (reference _image_to_profile,
    correction_tools/illumination.py:145-195): percentile clip, z-sum,
    2D gaussian(smooth_sigma)."""
    imf = im.astype(jnp.float32)
    lo = counting_quantile(imf, cap_lo)
    hi = counting_quantile(imf, cap_hi)
    clipped = jnp.clip(imf, jnp.minimum(lo, hi), jnp.maximum(lo, hi))
    flat = jnp.sum(clipped, axis=0)
    return gaussian_filter(flat, smooth_sigma)


class IlluminationProfiler:
    """Streaming flat-field estimator: feed per-FOV stacks, finalize once.

    Mirrors Generate_illumination_correction
    (correction_tools/illumination.py:16-145): mean of per-FOV smoothed
    z-sums, smoothed again and normalized to peak 1.
    """

    def __init__(self, shape_xy: Tuple[int, int],
                 cap_th_per: Tuple[float, float] = (5.0, 90.0),
                 smooth_sigma: float = 60.0):
        self.shape_xy = tuple(shape_xy)
        self.cap = (cap_th_per[0] / 100.0, cap_th_per[1] / 100.0)
        self.smooth_sigma = float(smooth_sigma)
        self._sum = jnp.zeros(self.shape_xy, jnp.float32)
        self._n = 0

    def add_stack(self, im) -> None:
        self._sum = self._sum + _stack_to_illumination(
            jnp.asarray(im), self.cap[0], self.cap[1], self.smooth_sigma)
        self._n += 1

    def finalize(self) -> np.ndarray:
        if self._n == 0:
            raise ValueError("no stacks accumulated")
        prof = gaussian_filter(self._sum / self._n, self.smooth_sigma)
        prof = prof / jnp.max(prof)
        return np.asarray(prof)


# ---------------------------------------------------------------------------
# Bleedthrough generation
# ---------------------------------------------------------------------------


class PairRegression(NamedTuple):
    slopes: jnp.ndarray      # (N,)
    intercepts: jnp.ndarray  # (N,)
    rsq: jnp.ndarray         # (N,)
    valid: jnp.ndarray       # (N,)


@partial(jax.jit, static_argnames=("crop_radius",))
def fit_spot_pair_regressions(ref_im: jnp.ndarray, tar_im: jnp.ndarray,
                              centers: jnp.ndarray, valid: jnp.ndarray,
                              crop_radius: int = 4) -> PairRegression:
    """Per-spot linear regression of the target crop on the reference crop.

    Behavior target: find_bleedthrough_pairs
    (correction_tools/bleedthrough.py:110-140): crop both channels around
    each reference spot, regress tar = slope * ref + intercept, report r^2.
    Closed form (cov/var), vmapped over spots.
    """
    ref_px, _, mask = gather_blocks(ref_im, centers, crop_radius)
    tar_px, _, _ = gather_blocks(tar_im, centers, crop_radius)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mx = jnp.sum(ref_px * m, axis=1) / n
    my = jnp.sum(tar_px * m, axis=1) / n
    dx = (ref_px - mx[:, None]) * m
    dy = (tar_px - my[:, None]) * m
    sxx = jnp.sum(dx * dx, axis=1)
    sxy = jnp.sum(dx * dy, axis=1)
    syy = jnp.sum(dy * dy, axis=1)
    slope = sxy / jnp.maximum(sxx, 1e-12)
    intercept = my - slope * mx
    rsq = (sxy * sxy) / jnp.maximum(sxx * syy, 1e-12)
    return PairRegression(slopes=slope, intercepts=intercept, rsq=rsq,
                          valid=valid & (sxx > 0))


@partial(jax.jit, static_argnames=("order", "shape_xy"))
def polynomial_field_2d(coords_xy: jnp.ndarray, values: jnp.ndarray,
                        weights: jnp.ndarray, shape_xy: Tuple[int, int],
                        order: int = 2,
                        ref_center: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """Weighted polynomial fit of scattered values -> dense (X, Y) field
    (reference interploate_bleedthrough_correction_from_channel,
    correction_tools/bleedthrough.py:300-336)."""
    if ref_center is None:
        ref_center = jnp.asarray(
            [shape_xy[0] / 2.0, shape_xy[1] / 2.0], jnp.float32)
    x = polynomial_basis(coords_xy - ref_center[None], order)
    w = weights.astype(jnp.float32)
    xw = x * w[:, None]
    col = jnp.maximum(jnp.sqrt(jnp.mean(xw * xw, axis=0)), 1e-12)
    sol, *_ = jnp.linalg.lstsq(xw / col[None], values * w)
    coef = sol / col
    xx, yy = jnp.meshgrid(jnp.arange(shape_xy[0], dtype=jnp.float32),
                          jnp.arange(shape_xy[1], dtype=jnp.float32),
                          indexing="ij")
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1) - ref_center[None]
    field = polynomial_basis(grid, order) @ coef
    return field.reshape(shape_xy)


@jax.jit
def invert_mixing_profile(mixing: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel inverse of a (C, C, X, Y) channel-mixing field
    (reference Generate_bleedthrough_correction inverse loop,
    correction_tools/bleedthrough.py:477-487) as one batched inv."""
    c, _, x, y = mixing.shape
    m = jnp.moveaxis(mixing.reshape(c, c, -1), -1, 0)      # (XY, C, C)
    inv = jnp.linalg.inv(m)
    return jnp.moveaxis(inv, 0, -1).reshape(c, c, x, y)


def generate_bleed_profile(ims: Sequence[jnp.ndarray],
                           th_seeds: Sequence[float] = None,
                           crop_radius: int = 4,
                           rsq_th: float = 0.81,
                           max_num_seeds: int = 256,
                           fitting_order: int = 2,
                           min_spots: int = 8) -> np.ndarray:
    """Full bleedthrough workflow on one multi-channel stack -> inverse
    unmixing profile (C, C, X, Y) consumable by
    :func:`ops.corrections.bleedthrough_unmix`.

    Mirrors Generate_bleedthrough_correction
    (correction_tools/bleedthrough.py:353-520): per ordered channel pair,
    fit ref spots, regress target crops, keep r^2 >= rsq_th, fit an
    order-2 slope field; diagonal = 1; invert per pixel.
    """
    ims = [jnp.asarray(im) for im in ims]
    c = len(ims)
    shape_xy = tuple(ims[0].shape[1:])
    if th_seeds is None:
        th_seeds = [300.0] * c
    mixing = np.zeros((c, c) + shape_xy, np.float32)
    for i in range(c):
        mixing[i, i] = 1.0
    for ref_i in range(c):
        res = fit_fov_image(ims[ref_i], max_num_seeds=max_num_seeds,
                            th_seed=th_seeds[ref_i])
        centers = res.spots[:, 1:4]
        valid = res.valid
        for tar_i in range(c):
            if tar_i == ref_i:
                continue
            reg = fit_spot_pair_regressions(
                ims[ref_i], ims[tar_i], centers, valid, crop_radius)
            keep = reg.valid & (reg.rsq >= rsq_th)
            if int(jnp.sum(keep)) < min_spots:
                continue
            w = keep.astype(jnp.float32)
            field = polynomial_field_2d(centers[:, 1:3], reg.slopes, w,
                                        shape_xy, order=fitting_order)
            # mixing[tar, ref]: how much of ref leaks into tar
            mixing[tar_i, ref_i] = np.asarray(field)
    return np.asarray(invert_mixing_profile(jnp.asarray(mixing)))


def generate_bleed_profile_from_rounds(stacks: Sequence[jnp.ndarray],
                                       th_seeds: Sequence[float] = None,
                                       crop_radius: int = 4,
                                       rsq_th: float = 0.81,
                                       max_num_seeds: int = 256,
                                       fitting_order: int = 2,
                                       min_spots: int = 8) -> np.ndarray:
    """Bleedthrough profile from per-channel calibration rounds.

    ``stacks[i]`` is one full (C, Z, X, Y) multi-channel stack from a round
    where ONLY channel i is labeled — the reference's actual calibration
    input (Generate_bleedthrough_correction's one ``bleed_folder`` per
    channel, correction_tools/bleedthrough.py:353-430).  Spots are fit in
    the labeled channel of each round; every other channel's crops are
    regressed against them, so leak directions never contaminate each
    other (unlike a single multi-labeled stack).  Returns the inverse
    unmixing profile (C, C, X, Y).
    """
    stacks = [jnp.asarray(s) for s in stacks]
    c = len(stacks)
    assert all(s.shape[0] == c for s in stacks), \
        "each calibration stack must carry all C channels"
    shape_xy = tuple(stacks[0].shape[2:])
    if th_seeds is None:
        th_seeds = [300.0] * c
    mixing = np.zeros((c, c) + shape_xy, np.float32)
    for i in range(c):
        mixing[i, i] = 1.0
    for ref_i in range(c):
        ims = stacks[ref_i]
        res = fit_fov_image(ims[ref_i], max_num_seeds=max_num_seeds,
                            th_seed=th_seeds[ref_i])
        centers = res.spots[:, 1:4]
        valid = res.valid
        for tar_i in range(c):
            if tar_i == ref_i:
                continue
            reg = fit_spot_pair_regressions(
                ims[ref_i], ims[tar_i], centers, valid, crop_radius)
            keep = reg.valid & (reg.rsq >= rsq_th)
            if int(jnp.sum(keep)) < min_spots:
                continue
            w = keep.astype(jnp.float32)
            field = polynomial_field_2d(centers[:, 1:3], reg.slopes, w,
                                        shape_xy, order=fitting_order)
            mixing[tar_i, ref_i] = np.asarray(field)
    return np.asarray(invert_mixing_profile(jnp.asarray(mixing)))


# ---------------------------------------------------------------------------
# Chromatic constants generation
# ---------------------------------------------------------------------------


def generate_chromatic_constants(tar_im: jnp.ndarray, ref_im: jnp.ndarray,
                                 th_seed: float = 300.0,
                                 max_num_seeds: int = 512,
                                 match_cutoff: float = 3.0,
                                 sparse_th: float = 15.0,
                                 max_order: int = 2,
                                 ref_center: Optional[np.ndarray] = None
                                 ) -> Tuple[np.ndarray, int]:
    """Chromatic-shift polynomial from one bead stack imaged in two
    channels -> ((3, n_monomials) constants, n_pairs used).

    Mirrors Generate_chromatic_abbrevation (correction_tools/chromatic.py:
    119+ / corrections.py:885-1008): fit bead centers in both channels,
    keep isolated beads, pair within `match_cutoff`, lstsq the
    per-dimension shift polynomial (via ops.warp.fit_chromatic_constants).
    The constants feed warp_spot_coords / warp_image directly.
    """
    tar_im = jnp.asarray(tar_im)
    ref_im = jnp.asarray(ref_im)
    shape = np.asarray(tar_im.shape, np.float32)
    if ref_center is None:
        ref_center = shape / 2.0
    tar_cts, tar_ok = get_centers(tar_im, th_seed=th_seed,
                                  max_num_seeds=max_num_seeds)
    ref_cts, ref_ok = get_centers(ref_im, th_seed=th_seed,
                                  max_num_seeds=max_num_seeds)
    ref_ok = ref_ok & select_sparse_centers(ref_cts, ref_ok, sparse_th)
    pairs = find_paired_centers(tar_cts, tar_ok, ref_cts, ref_ok,
                                cutoff=match_cutoff)
    n = int(pairs.n_pairs)
    # masked rows collapse onto the reference center => zero contribution
    # to the (normalized) design matrix beyond a constant offset; instead
    # keep only valid pairs host-side for an exact fit
    mask = np.asarray(pairs.mask)
    tar_sel = np.asarray(pairs.tar)[mask]
    ref_sel = np.asarray(pairs.ref)[mask]
    constants = fit_chromatic_constants(
        jnp.asarray(tar_sel), jnp.asarray(ref_sel),
        jnp.asarray(ref_center, dtype=jnp.float32), max_order=max_order)
    return np.asarray(constants), n
