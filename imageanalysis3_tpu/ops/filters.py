"""Separable filters and robust statistics on 3D stacks, in pure XLA.

Re-implements the scipy.ndimage primitives the reference leans on
(``gaussian_filter``, ``maximum_filter``, ``minimum_filter`` — used by
``correction_tools/filter.py`` and ``spot_tools/fitting.py:20-154``) as
fused, batched XLA programs.  All filters are separable passes expressed as
1D convolutions / reduce-windows along each axis so XLA can tile them onto
the VPU without materializing intermediate halos in HBM.

Boundary-mode naming follows scipy.ndimage:
  * ``"nearest"``  -> edge replication   (jnp.pad mode="edge")
  * ``"reflect"``  -> symmetric          (jnp.pad mode="symmetric")
  * ``"mirror"``   -> reflect-101        (jnp.pad mode="reflect")
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

_SCIPY2JNP_PAD = {
    "nearest": "edge",
    "reflect": "symmetric",
    "mirror": "reflect",
    "constant": "constant",
    "wrap": "wrap",
}


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Discrete Gaussian kernel identical to scipy.ndimage's construction.

    radius = int(truncate * sigma + 0.5); weights exp(-0.5 x^2/sigma^2),
    normalized to sum 1.
    """
    radius = int(float(truncate) * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (x / float(sigma)) ** 2)
    w /= w.sum()
    return w.astype(np.float32)


def _map_boundary_index(idx: int, n: int, mode: str) -> int:
    """Map an out-of-range index to a source index per scipy boundary mode
    (None = no contribution, for mode='constant')."""
    if mode == "constant":
        return idx if 0 <= idx < n else None
    if mode == "wrap":
        return idx % n
    for _ in range(64):  # repeated reflection for radius > n
        if 0 <= idx < n:
            return idx
        if mode == "nearest":
            idx = min(max(idx, 0), n - 1)
        elif mode == "reflect":       # scipy 'reflect' = symmetric: 1,0|0,1
            idx = -idx - 1 if idx < 0 else 2 * n - 1 - idx
        elif mode == "mirror":        # scipy 'mirror' = reflect-101: 1|0|1
            idx = -idx if idx < 0 else 2 * n - 2 - idx
        else:
            raise ValueError(mode)
    return min(max(idx, 0), n - 1)


from functools import lru_cache


@lru_cache(maxsize=256)
def _band_matrix(n: int, kernel_key: tuple, mode: str) -> np.ndarray:
    """(n, n) matrix W with out = W @ x == correlate1d(x, kernel, mode).

    Boundary handling is folded into W, so the whole 1D filter is one
    matmul — the TPU-native form: the contraction runs on the MXU in the
    array's native layout with no transposes and no padded copies.
    """
    kernel = np.asarray(kernel_key, np.float64)
    k = len(kernel)
    radius = k // 2
    w = np.zeros((n, n), np.float64)
    for i in range(n):
        for t in range(k):
            s = _map_boundary_index(i + t - radius, n, mode)
            if s is not None:
                w[i, s] += kernel[t]
    return w.astype(np.float32)


def _conv1d_along_axis(im: jnp.ndarray, kernel: jnp.ndarray, axis: int,
                       mode: str) -> jnp.ndarray:
    """Correlate `im` with 1D `kernel` along `axis` with scipy boundary
    mode, as a banded-matrix contraction on the MXU (see _band_matrix).

    einsum with the output in the input's axis order lowers to a (batched)
    dot_general in the native layout — no transposes.
    """
    kernel = np.asarray(kernel)
    w = jnp.asarray(_band_matrix(im.shape[axis], tuple(kernel.tolist()),
                                 mode))
    letters = "abcdefgh"[:im.ndim]
    src = letters[axis]
    out = letters[:axis] + "J" + letters[axis + 1:]
    spec = f"J{src},{letters}->{out}"
    return jnp.einsum(spec, w, im, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("sigma", "truncate", "mode", "axes"))
def gaussian_filter(im: jnp.ndarray,
                    sigma: Union[float, Sequence[float]],
                    truncate: float = 4.0,
                    mode: str = "reflect",
                    axes: Sequence[int] | None = None) -> jnp.ndarray:
    """scipy.ndimage.gaussian_filter parity, as separable XLA 1D convs.

    Matches the reference's usage sites: seeding blurs with default
    mode="reflect" (spot_tools/fitting.py:92-99) and the high-pass filter
    with mode="nearest", truncate=2 (correction_tools/filter.py:14-19).
    """
    im = im.astype(jnp.float32)
    if axes is None:
        axes = tuple(range(im.ndim))
    if np.isscalar(sigma):
        sigmas = [float(sigma)] * len(axes)
    else:
        sigmas = [float(s) for s in sigma]
    out = im
    for ax, s in zip(axes, sigmas):
        if s <= 0:
            continue
        kern = gaussian_kernel1d(s, truncate)
        out = _conv1d_along_axis(out, kern, ax, mode)
    return out


def _window_reduce(im: jnp.ndarray, size: int, mode: str, op: str) -> jnp.ndarray:
    """Separable min/max filter via reduce_window along every axis."""
    pad_lo = size // 2
    pad_hi = size - 1 - pad_lo
    init = -jnp.inf if op == "max" else jnp.inf
    fn = jax.lax.max if op == "max" else jax.lax.min
    out = im.astype(jnp.float32)
    for ax in range(im.ndim):
        pad = [(0, 0)] * im.ndim
        pad[ax] = (pad_lo, pad_hi)
        padded = jnp.pad(out, pad, mode=_SCIPY2JNP_PAD[mode])
        dims = [1] * im.ndim
        dims[ax] = size
        out = jax.lax.reduce_window(
            padded, init, fn, window_dimensions=tuple(dims),
            window_strides=(1,) * im.ndim, padding="VALID")
    return out


@partial(jax.jit, static_argnames=("size", "mode"))
def maximum_filter(im: jnp.ndarray, size: int = 3, mode: str = "reflect") -> jnp.ndarray:
    """scipy.ndimage.maximum_filter parity (cubic window, separable)."""
    return _window_reduce(im, size, mode, "max")


@partial(jax.jit, static_argnames=("size", "mode"))
def minimum_filter(im: jnp.ndarray, size: int = 3, mode: str = "reflect") -> jnp.ndarray:
    """scipy.ndimage.minimum_filter parity (cubic window, separable)."""
    return _window_reduce(im, size, mode, "min")


@partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_highpass(im: jnp.ndarray, sigma: float = 5.0,
                      truncate: float = 2.0) -> jnp.ndarray:
    """High-pass: im - lowpass, zeroed where lowpass > im.

    Behavior target: reference correction_tools/filter.py:14-19
    (gaussian_high_pass_filter), which uses mode="nearest".
    """
    imf = im.astype(jnp.float32)
    lowpass = gaussian_filter(imf, sigma, truncate=truncate, mode="nearest")
    hp = imf - lowpass
    return jnp.where(lowpass > imf, 0.0, hp)


@partial(jax.jit, static_argnames=("gfilt_size", "niter"))
def gaussian_deconvolution(im: jnp.ndarray, gfilt_size: float = 2.0,
                           niter: int = 1) -> jnp.ndarray:
    """Naive deconvolution: iteratively divide by own Gaussian blur.

    Behavior target: reference correction_tools/filter.py:4-11.
    """
    out = im.astype(jnp.float32)
    for _ in range(niter):
        out = out / gaussian_filter(out, gfilt_size)
    return out


# ---------------------------------------------------------------------------
# Medians.  jnp.median sorts, which is the wrong tool for 2048^2 x 30 stacks
# on TPU; for (near-)integer data we binary-search the value domain with
# counting passes instead: exact, branch-free, HBM-bandwidth bound.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("bits", "axis"))
def counting_median(im: jnp.ndarray, bits: int = 18,
                    axis=None) -> jnp.ndarray:
    """Median via binary search over a fixed-point value domain.

    Exact for inputs on a 1/4-integer grid within [0, 2**16) when
    ``bits=18`` (uint16 camera data after the hot-pixel 4-neighbor mean).
    `axis` reduces over those axes (None = all).  Returns the lower median
    m = min{v : count(im <= v) >= ceil(N/2)} on the fixed-point grid.
    """
    imf = im.astype(jnp.float32)
    if axis is None:
        axis = tuple(range(im.ndim))
    elif isinstance(axis, int):
        axis = (axis,)
    n = 1
    for ax in axis:
        n *= im.shape[ax]
    half = (n + 1) // 2
    # fixed-point scale: value = code / 4  (quarter-integer grid)
    scale = 4.0
    codes = jnp.floor(imf * scale + 0.5).astype(jnp.int32)
    red_shape = tuple(s for i, s in enumerate(im.shape) if i not in axis)
    # derive the carry init from the data so it inherits the data's varying
    # manual axes under shard_map (a plain zeros() breaks the fori_loop
    # carry-type match inside sharded programs)
    zero = jnp.min(codes, axis=axis) * 0
    lo = zero
    hi = zero + ((1 << bits) - 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        mid_b = jnp.expand_dims(mid, axis) if red_shape else mid
        cnt = jnp.sum((codes <= mid_b).astype(jnp.int32), axis=axis)
        ok = cnt >= half
        return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, bits, body, (lo, hi))
    return lo.astype(jnp.float32) / scale
