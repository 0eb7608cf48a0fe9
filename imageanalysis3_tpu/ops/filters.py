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

import os
from functools import partial
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

# Matmul precision of the banded-conv path.  HIGH (3-pass bf16) is the
# production default: it costs ~1e-6 relative error on uint16-range data
# (measured bench median centroid err 0.0185 px, within the 0.05 px
# target) for half the MXU time of HIGHEST's 6-pass decomposition.  The
# tradeoff is TPU-only (CPU ignores Precision), so it is surfaced here as
# an explicit knob: set IA3_TPU_CONV_PRECISION=highest to restore the
# exact-f32 path when validating accuracy on-device.
CONV_PRECISION = {
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("IA3_TPU_CONV_PRECISION", "high").lower()]

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


@lru_cache(maxsize=256)
def _block_band(n: int, block: int, kernel_key: tuple, mode: str
                ) -> np.ndarray:
    """(nb, B, 3B) per-block slices of the band matrix: block j of the
    output contracts with input blocks j-1, j, j+1 (zero-padded at the
    ends).  Exact as long as the kernel radius < block."""
    w = _band_matrix(n, kernel_key, mode)
    nb = n // block
    out = np.zeros((nb, block, 3 * block), np.float32)
    for j in range(nb):
        lo = (j - 1) * block
        for c in range(3 * block):
            src = lo + c
            if 0 <= src < n:
                out[j, :, c] = w[j * block:(j + 1) * block, src]
    return out


def _conv1d_along_axis(im: jnp.ndarray, kernel: jnp.ndarray, axis: int,
                       mode: str) -> jnp.ndarray:
    """Correlate `im` with 1D `kernel` along `axis` with scipy boundary
    mode, picking the cheapest exact strategy for the kernel/axis sizes:

    * few taps (k <= 9): padded shift-multiply-add — pure VPU, ~k passes
      that XLA fuses (a dense matmul would waste n/k of the MXU work);
    * wide kernels on long axes: block-banded matmul — (B, 3B) blocks on
      the MXU, 3B/n of the dense cost;
    * otherwise: dense banded matmul (boundary modes folded in).

    All einsums keep the output in the input's axis order, so they lower
    to (batched) dot_general in the native layout — no transposes.
    """
    kernel = np.asarray(kernel)
    k = kernel.shape[0]
    n = im.shape[axis]
    radius = k // 2
    key = tuple(kernel.tolist())

    if k <= 9 and n > k:
        # few taps: padded shift-multiply-add (the blocked matmul's 3x
        # input-block concatenation costs more HBM traffic than it saves
        # MXU time — measured slower at 60x2048x2048)
        pad = [(0, 0)] * im.ndim
        pad[axis] = (radius, radius)
        padded = jnp.pad(im, pad, mode=_SCIPY2JNP_PAD[mode])
        out = None
        for t in range(k):
            sl = [slice(None)] * im.ndim
            sl[axis] = slice(t, t + n)
            term = padded[tuple(sl)] * float(kernel[t])
            out = term if out is None else out + term
        return out

    block = 128
    while block < radius + 1:
        block *= 2
    # "wrap" corner entries reach across the whole axis — only the dense
    # band matrix represents them, so keep wrap off the blocked path
    if n % block == 0 and n // block >= 4 and mode != "wrap":
        nb = n // block
        wb = jnp.asarray(_block_band(n, block, key, mode))
        # reshape the target axis into (nb, B) and gather j-1/j/j+1 blocks
        new_shape = im.shape[:axis] + (nb, block) + im.shape[axis + 1:]
        xb = im.reshape(new_shape)
        zpad = [(0, 0)] * xb.ndim
        zpad[axis] = (1, 1)
        xp = jnp.pad(xb, zpad)
        sl = [slice(None)] * xb.ndim

        def take(s0, s1):
            s = list(sl)
            s[axis] = slice(s0, s1)
            return xp[tuple(s)]

        x3 = jnp.concatenate([take(0, nb), take(1, nb + 1),
                              take(2, nb + 2)], axis=axis + 1)
        letters = "abcdefg"[:im.ndim - 1]
        pre = letters[:axis]
        post = letters[axis:]
        spec = (f"JKB,{pre}JB{post}->{pre}JK{post}")
        out = jnp.einsum(spec, wb, x3,
                         precision=CONV_PRECISION)
        return out.reshape(im.shape)

    w = jnp.asarray(_band_matrix(n, key, mode))
    letters = "abcdefgh"[:im.ndim]
    src = letters[axis]
    out = letters[:axis] + "J" + letters[axis + 1:]
    spec = f"J{src},{letters}->{out}"
    return jnp.einsum(spec, w, im, precision=CONV_PRECISION)


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


def _window_reduce_interior(im: jnp.ndarray, size: int,
                            op: str) -> jnp.ndarray:
    """Min/max filter exact on interior voxels only: reduce_window with
    init-value padding (one fused op per axis, no materialized pad
    copies).  Border voxels see the init value instead of reflected
    neighbors — callers that discard a >= size//2 border (the seeding
    level pass with min_edge_distance >= 1) get identical results for
    ~40% less HBM traffic."""
    pad_lo = size // 2
    pad_hi = size - 1 - pad_lo
    init = -jnp.inf if op == "max" else jnp.inf
    fn = jax.lax.max if op == "max" else jax.lax.min
    out = im.astype(jnp.float32)
    dims = [1] * im.ndim
    pads = [(0, 0)] * im.ndim
    for ax in range(im.ndim):
        d = list(dims)
        d[ax] = size
        p = list(pads)
        p[ax] = (pad_lo, pad_hi)
        out = jax.lax.reduce_window(
            out, init, fn, window_dimensions=tuple(d),
            window_strides=(1,) * im.ndim, padding=tuple(p))
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


@partial(jax.jit, static_argnames=("bits", "subsample"))
def counting_median_layers_and_global(im: jnp.ndarray, bits: int = 18,
                                      subsample: int = 1):
    """(per-z-layer medians, global median) in ONE binary search.

    The two searches of :func:`counting_median` each re-read the image 18
    times; running both in one loop body lets XLA fuse the comparisons
    into a single traversal per iteration — halving the z-shift
    correction's HBM traffic.  Exactness identical to counting_median.

    ``subsample`` = s > 1 searches every s-th FULL x-row (a regular
    (s x 1)-strided sample, s*s rows apart in area terms use s=16 for a
    1/16 sample): the ~log2(range) comparison passes then touch 1/s of
    the stack (the binary search is the correction stage's dominant HBM
    traffic at full FOV).  Whole rows keep the sample contiguous in the
    TPU lane dimension — a ::s stride on the minor (y) axis lowers to a
    lane gather that costs MORE than reading everything (measured 12 ms
    vs 3.5 ms for the same sample count on v5e).  The result is the
    exact median OF THE SAMPLE — for camera layers (>= 260k samples at
    s=16 on 2048^2) that sits within ~1 quarter-code of the full
    median, a <0.1% normalization shift.  s=1 keeps exact semantics.
    """
    imf = im.astype(jnp.float32)
    if subsample > 1:
        imf = imf[:, ::subsample, :]
    z = im.shape[0]
    n_layer = imf.shape[1] * imf.shape[2]
    n_all = imf.size
    half_layer = (n_layer + 1) // 2
    half_all = (n_all + 1) // 2
    scale = 4.0
    # the search compares the f32 image directly against exactly-
    # representable code thresholds: floor(4x + 0.5) <= mid  <=>
    # x < (mid + 0.5)/4 (both sides exact in f32), so no 1 GB int32
    # code array is ever materialized.  True per-layer/global bounds:
    # the search then converges in log2(actual value range) passes —
    # typically ~11 for camera data spanning ~1000 counts, vs the
    # worst-case `bits`=18 (result exact either way).
    code_of = lambda v: jnp.floor(v * scale + 0.5).astype(jnp.int32)
    lo_l = code_of(jnp.min(imf, axis=(1, 2)))
    hi_l = code_of(jnp.max(imf, axis=(1, 2)))
    lo_g = jnp.min(lo_l)
    hi_g = jnp.max(hi_l)

    def cond(state):
        lo_l, hi_l, lo_g, hi_g = state
        return jnp.any(lo_l < hi_l) | (lo_g < hi_g)

    def body(state):
        lo_l, hi_l, lo_g, hi_g = state
        mid_l = (lo_l + hi_l) >> 1
        mid_g = (lo_g + hi_g) >> 1
        th_l = (mid_l.astype(jnp.float32) + 0.5) / scale
        th_g = (mid_g.astype(jnp.float32) + 0.5) / scale
        below_l = imf < th_l[:, None, None]
        below_g = imf < th_g
        cnt_l = jnp.sum(below_l.astype(jnp.int32), axis=(1, 2))
        cnt_g = jnp.sum(below_g.astype(jnp.int32))
        ok_l = cnt_l >= half_layer
        ok_g = cnt_g >= half_all
        return (jnp.where(ok_l, lo_l, mid_l + 1),
                jnp.where(ok_l, mid_l, hi_l),
                jnp.where(ok_g, lo_g, mid_g + 1),
                jnp.where(ok_g, mid_g, hi_g))

    lo_l, _, lo_g, _ = jax.lax.while_loop(cond, body,
                                          (lo_l, hi_l, lo_g, hi_g))
    return lo_l.astype(jnp.float32) / scale, lo_g.astype(jnp.float32) / scale
