"""Chromosome-trace conditioning: NaN-aware smoothing and interpolation.

Behavior targets (reference ImageAnalysis3):
  * ``nan_gaussian_filter``  domain_tools/__init__.py:5-20
    (normalized convolution: blur values and the finite-mask with the
    same Gaussian, take the ratio)
  * ``interp1dnan``          domain_tools/__init__.py:22-29
    (per-column np.interp over finite entries; constant end extension)
  * ``interpolate_chr``      domain_tools/__init__.py:31-47
    (optional per-axis NaN-aware smoothing, then linear interpolation
    anchored on rows with ALL coordinates finite, linearly extrapolated
    past the first/last anchor)
  * ``extract_sequences``    domain_tools/__init__.py:49-57

TPU-first split: the smoothing is a jittable device program built on the
banded-matmul Gaussian (``ops.filters.gaussian_filter``, scipy-`reflect`
parity) so it composes with on-device distance-map pipelines; the
interpolators are host NumPy — traces are (N≈1e2, 3) arrays consumed by
host-side domain calling, where a device round-trip costs more than the
arithmetic.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import filters


def nan_gaussian_filter(mat, sigma, keep_nan: bool = False,
                        truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian-blur ``mat`` ignoring NaNs (normalized convolution).

    Blurs the zero-filled values and the finite-support indicator with
    the same kernel and returns their ratio, so each output is the
    Gaussian-weighted mean of the finite entries in its window.  Where
    the window holds no finite entry the ratio is 0/0 = NaN, matching
    the reference.  ``keep_nan`` re-masks the original NaN positions.
    Works for any rank (1D traces, 2D distance maps, 3D stacks).
    """
    m = jnp.asarray(mat, jnp.float32)
    bad = jnp.isnan(m)
    vv = filters.gaussian_filter(jnp.where(bad, 0.0, m), sigma,
                                 truncate=truncate, mode="reflect")
    ww = filters.gaussian_filter(jnp.where(bad, 0.0, 1.0), sigma,
                                 truncate=truncate, mode="reflect")
    z = vv / ww
    if keep_nan:
        z = jnp.where(bad, jnp.nan, z)
    return z


def _interp_linear_extrap(x: np.ndarray, xp: np.ndarray,
                          fp: np.ndarray) -> np.ndarray:
    """np.interp plus linear extrapolation from the end segments
    (scipy interp1d ``fill_value='extrapolate'`` semantics)."""
    y = np.interp(x, xp, fp)
    if len(xp) >= 2:
        lo = x < xp[0]
        if lo.any():
            s = (fp[1] - fp[0]) / (xp[1] - xp[0])
            y[lo] = fp[0] + (x[lo] - xp[0]) * s
        hi = x > xp[-1]
        if hi.any():
            s = (fp[-1] - fp[-2]) / (xp[-1] - xp[-2])
            y[hi] = fp[-1] + (x[hi] - xp[-1]) * s
    return y


def interp1dnan(arr) -> np.ndarray:
    """Fill NaNs of a 1D array by linear interpolation between its
    finite entries (ends extend the nearest finite value — np.interp
    semantics, matching the reference's interp1dnan)."""
    a = np.array(arr, np.float64)
    bad = np.isnan(a)
    if bad.all() or not bad.any():
        return a
    idx = np.arange(len(a))
    a[bad] = np.interp(idx[bad], idx[~bad], a[~bad])
    return a


def interpolate_chr(zxy, gaussian: float = 0.0) -> np.ndarray:
    """Fill missing regions of a chromosome trace.

    ``zxy`` is (N, D) with NaN rows for undetected regions.  With
    ``gaussian > 0`` every column is first smoothed NaN-aware (which
    also diffuses values into short gaps).  Rows where ALL coordinates
    are finite then anchor a per-column linear interpolation, linearly
    extrapolated beyond the first/last anchor.  A trace with no anchor
    rows is returned unchanged; a single anchor extends as a constant.
    """
    a = np.array(zxy, np.float64)
    if a.ndim != 2:
        raise ValueError("interpolate_chr expects an (N, D) trace")
    if gaussian > 0:
        for i in range(a.shape[1]):
            a[:, i] = np.asarray(nan_gaussian_filter(a[:, i], gaussian))
    ok = ~np.isnan(a).any(axis=1)
    if not ok.any():
        return a
    idx = np.arange(len(a), dtype=np.float64)
    out = np.empty_like(a)
    for i in range(a.shape[1]):
        out[:, i] = _interp_linear_extrap(idx, idx[ok], a[ok, i])
    return out


def extract_sequences(zxy, domain_starts: Sequence[int]) -> List[np.ndarray]:
    """Split a trace into per-domain coordinate blocks given domain
    start indices (last domain runs to the end)."""
    a = np.asarray(zxy)
    starts = np.asarray(domain_starts, np.int64)
    ends = np.append(starts[1:], len(a))
    return [a[s:e] for s, e in zip(starts, ends)]
