"""Drift registration: batched FFT phase correlation with subpixel DFT.

Behavior targets (reference ImageAnalysis3):
  * subpixel phase correlation      correction_tools/alignment.py:419-500
    (skimage.registration.phase_cross_correlation, upsample_factor=100)
  * 8-crop consensus aligner        correction_tools/alignment.py:527-695
    (align_image: >=3 crops within 1 px, else closest-3 fallback)
  * crop generation                 correction_tools/alignment.py:87-135

TPU-first design: all 8 crops are registered in one program — the forward
FFTs batch over crops and the Guizar-Sicairos subpixel refinement is
expressed as per-axis complex matrix products (literal matmuls on the MXU)
instead of scipy loops.  Subpixel refinement runs in two stages
(coarse 1/10 px then 1/100 px) so the upsampled grids stay tiny; the
consensus vote is branch-free masked arithmetic so the whole aligner lives
inside one `jit`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HIGH = jax.lax.Precision.HIGHEST


def _axis_kernel(n: int, npoints: int, center: jnp.ndarray,
                 upsample: float) -> jnp.ndarray:
    """Complex DFT evaluation kernel for one axis.

    Returns W[j, k] = exp(2*pi*i * f_k * (center + (j - m)/upsample) / 1)
    with f_k the signed integer FFT frequencies of length-n axis, so that
    (W @ R) evaluates the inverse DFT of spectrum R on a fine grid of
    `npoints` samples spaced 1/upsample around `center`.
    """
    m = npoints // 2
    freqs = jnp.fft.fftfreq(n) * n  # signed integer frequencies
    offs = (jnp.arange(npoints) - m) / upsample
    s = center + offs  # (npoints,)
    phase = 2j * jnp.pi * s[:, None] * freqs[None, :] / n
    return jnp.exp(phase)


def _upsampled_argmax(R: jnp.ndarray, ny_full: int, center: jnp.ndarray,
                      upsample: float, npoints: int) -> jnp.ndarray:
    """argmax of |IDFT(R)| on a fine grid around `center` (3D).

    The evaluation is three complex matmuls (z, x, y contractions) — the
    TPU-native replacement for skimage's `_upsampled_dft`.  `R` is the
    rFFT half-spectrum (last axis ny_full//2+1): for real inputs the
    cross-spectrum is Hermitian, so the real correlation value equals
    Re(sum over the half spectrum) with weight 2 on the interior y
    frequencies (1 on DC and, for even ny, Nyquist).
    """
    nz, nx, ny_half = R.shape
    Wz = _axis_kernel(nz, npoints, center[0], upsample)
    Wx = _axis_kernel(nx, npoints, center[1], upsample)
    m = npoints // 2
    freqs_y = jnp.arange(ny_half, dtype=jnp.float32)
    offs = (jnp.arange(npoints) - m) / upsample
    s = center[2] + offs
    Wy = jnp.exp(2j * jnp.pi * s[:, None] * freqs_y[None, :] / ny_full)
    w = jnp.full(ny_half, 2.0)
    w = w.at[0].set(1.0)
    if ny_full % 2 == 0:
        w = w.at[-1].set(1.0)
    Wy = Wy * w[None, :]
    t = jnp.einsum("az,zxy->axy", Wz, R, precision=_HIGH)
    t = jnp.einsum("bx,axy->aby", Wx, t, precision=_HIGH)
    t = jnp.einsum("cy,aby->abc", Wy, t, precision=_HIGH)
    mag = jnp.abs(jnp.real(t))
    flat = jnp.argmax(mag)
    idx = jnp.stack(jnp.unravel_index(flat, mag.shape)).astype(jnp.float32)
    return center + (idx - m) / upsample


@partial(jax.jit, static_argnames=("upsample_factor", "normalization",
                                   "stages", "subtract_mean", "window"))
def subpixel_phase_correlation(ref: jnp.ndarray, mov: jnp.ndarray,
                               upsample_factor: int = 100,
                               normalization: Optional[str] = None,
                               stages: Optional[Tuple[int, ...]] = None,
                               subtract_mean: bool = False,
                               window: Optional[str] = None
                               ) -> jnp.ndarray:
    """Shift (zxy, px) required to register `mov` onto `ref`.

    Convention matches skimage's ``phase_cross_correlation(ref, mov)``
    (used at reference correction_tools/alignment.py:631): if
    ``mov(x) = ref(x - s)`` the returned shift is ``-s``; warping `mov`
    with ``coords - shift`` reproduces `ref` (reference io_tools/load.py:448).

    `stages` are successive sub-pixel refinement factors whose product
    reaches `upsample_factor`; each stage evaluates the exact band-limited
    cross-correlation on a (2m+1)^3 grid via matrix DFTs.  By default
    enough 10x stages are chained to cover any `upsample_factor` (a final
    partial stage uses the exact remaining factor), so the requested
    precision is always honored.

    `normalization=None` (plain cross-correlation, the reference-era
    skimage default) is the robust choice for *cropped* views: phase
    whitening gives unit weight to near-zero-magnitude frequencies whose
    phases are meaningless once cropping breaks circular shift structure.

    ``subtract_mean`` removes each view's mean so the constant background
    cannot contribute its overlap-triangle term (which peaks at zero shift
    and drags sparse-content estimates toward 0 — the role the reference's
    ``blurnorm2d`` box-blur division plays, alignment_tools.py:278-328).
    ``window`` tapers the views before the FFT to suppress crop-boundary
    leakage: ``"hann_xy"`` windows the last two axes only (right for
    z-thin stacks whose crops span the full z extent), ``"hann"`` windows
    every axis.  Measured on sparse synthetic bead crops (12 beads,
    64-px crops, 1.1 px shift): plain correlation errs up to 0.67 px;
    mean-sub + hann_xy brings the median error under 0.03 px.
    """
    mov = _condition_view(mov, subtract_mean, window)
    F_mov = jnp.fft.rfftn(mov)
    return _phase_correlate_spectrum(
        prepare_ref_spectrum(ref, subtract_mean=subtract_mean,
                             window=window),
        F_mov, mov.shape, upsample_factor, normalization, stages)


def _condition_view(x: jnp.ndarray, subtract_mean: bool,
                    window: Optional[str]) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    if subtract_mean:
        x = x - jnp.mean(x)
    if window is not None:
        axes = (tuple(range(x.ndim))[-2:] if window == "hann_xy"
                else tuple(range(x.ndim)))
        for ax in axes:
            n = x.shape[ax]
            h = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / (n - 1))
            shape_b = [1] * x.ndim
            shape_b[ax] = n
            x = x * h.reshape(shape_b).astype(jnp.float32)
    return x


@partial(jax.jit, static_argnames=("subtract_mean", "window"))
def prepare_ref_spectrum(ref: jnp.ndarray, subtract_mean: bool = False,
                         window: Optional[str] = None) -> jnp.ndarray:
    """Conditioned rFFT spectrum of a reference view.

    The reference round is registered against by EVERY hyb round, so its
    crop spectra are loop-invariant — computing them once per FOV halves
    the forward-FFT work of each round's drift stage (reference
    correct_fov_image recomputes the ref per call, io_tools/load.py:387).
    """
    return jnp.fft.rfftn(_condition_view(ref, subtract_mean, window))


def subpixel_phase_correlation_prepared(
        F_ref: jnp.ndarray, mov: jnp.ndarray,
        upsample_factor: int = 100,
        normalization: Optional[str] = None,
        stages: Optional[Tuple[int, ...]] = None,
        subtract_mean: bool = False,
        window: Optional[str] = None) -> jnp.ndarray:
    """`subpixel_phase_correlation` against a precomputed reference
    spectrum (see :func:`prepare_ref_spectrum`)."""
    mov = _condition_view(mov, subtract_mean, window)
    F_mov = jnp.fft.rfftn(mov)
    return _phase_correlate_spectrum(F_ref, F_mov, mov.shape,
                                     upsample_factor, normalization,
                                     stages)


def _phase_correlate_spectrum(F_ref, F_mov, shape, upsample_factor,
                              normalization, stages) -> jnp.ndarray:
    R = F_ref * jnp.conj(F_mov)
    if normalization == "phase":
        R = R / jnp.maximum(jnp.abs(R), 1e-20)
    cc = jnp.abs(jnp.fft.irfftn(R, s=shape))
    flat = jnp.argmax(cc)
    peak = jnp.stack(jnp.unravel_index(flat, cc.shape)).astype(jnp.float32)
    size = jnp.asarray(cc.shape, jnp.float32)
    shift = jnp.where(peak > size / 2, peak - size, peak)
    if upsample_factor <= 1:
        return shift
    if stages is None:
        # chain 10x stages until the product covers upsample_factor; the
        # last stage uses the exact remaining factor so precision is never
        # silently capped below the request
        stages, total = [], 1
        while total < upsample_factor:
            u = min(10, int(np.ceil(upsample_factor / total)))
            stages.append(u)
            total *= u
    # staged refinement: each stage zooms 1/u around the current estimate
    total = 1.0
    est = shift
    for u in stages:
        total *= u
        # grid must cover +-(1/previous_resolution)/2 with margin
        npoints = int(2 * np.ceil(0.75 * u)) + 1
        est = _upsampled_argmax(R, shape[-1], est, total, npoints)
        if total >= upsample_factor:
            break
    return est


# ---------------------------------------------------------------------------
# Crop-consensus aligner
# ---------------------------------------------------------------------------


def generate_drift_crops(image_size: Sequence[int],
                         drift_size: Optional[int] = None) -> np.ndarray:
    """Eight fixed-size crop boxes around the image center, (8, 3, 2) int.

    Crop centers follow reference correction_tools/alignment.py:87-135;
    unlike the reference (whose boundary clamping yields ragged sizes) every
    crop here has identical shape so the batch registers in one program.
    """
    sz = np.array(image_size, dtype=int)
    if drift_size is None:
        drift_size = int(np.max(sz) / 4)
    sel = sz / 2.0
    cts = np.array([
        [sel[0] / 2, sel[1] / 2, sel[2] / 2],
        [sel[0] / 2, (sel[1] + sz[1]) / 2, (sel[2] + sz[2]) / 2],
        [sel[0] / 2, (sel[1] + sz[1]) / 2, sel[2] / 2],
        [sel[0] / 2, sel[1] / 2, (sel[2] + sz[2]) / 2],
        [sel[0] / 2, sel[1], sel[2] / 2],
        [sel[0] / 2, sel[1], (sel[2] + sz[2]) / 2],
        [sel[0] / 2, sel[1] / 2, sel[2]],
        [sel[0] / 2, (sel[1] + sz[1]) / 2, sel[2]],
    ])
    half = np.minimum(np.full(3, drift_size / 2.0), sz / 2.0)
    crop_shape = np.minimum(np.full(3, drift_size, dtype=int), sz)
    boxes = []
    for ct in cts:
        lo = np.clip(np.round(ct - half).astype(int), 0, sz - crop_shape)
        boxes.append(np.stack([lo, lo + crop_shape], axis=1))
    return np.array(boxes)


@partial(jax.jit, static_argnames=("drift_diff_th", "min_good_drifts"))
def consensus_drift(drifts: jnp.ndarray, drift_diff_th: float = 1.0,
                    min_good_drifts: int = 3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vote over per-crop drifts -> (consensus drift, flag).

    flag 0: some drift has >= min_good_drifts crops (itself included) within
    drift_diff_th of it — return the mean of that agreeing group; flag 1:
    fallback to the mean of the mutually closest 3 drifts.  Behavior target:
    reference correction_tools/alignment.py:664-695; the reference's
    incremental early-exit loop is replaced by a pairwise vote over all
    crops at once, which is robust to outliers that would contaminate a
    batch mean.
    """
    drifts = drifts.astype(jnp.float32)
    k = drifts.shape[0]
    d2 = jnp.sum((drifts[:, None] - drifts[None, :]) ** 2, axis=-1)
    agree = d2 <= drift_diff_th ** 2       # includes self (diagonal)
    counts = jnp.sum(agree.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    n_good = counts[best]
    group = agree[best]
    good_mean = jnp.sum(jnp.where(group[:, None], drifts, 0.0), axis=0) / \
        jnp.maximum(n_good.astype(jnp.float32), 1.0)
    # fallback: closest pair + the drift minimizing distance to both
    d2 = jnp.where(jnp.eye(k, dtype=bool), jnp.inf, d2)
    pair_flat = jnp.argmin(d2)
    i, j = jnp.unravel_index(pair_flat, (k, k))
    third_score = d2[:, i] + d2[:, j]
    third_score = third_score.at[i].set(jnp.inf).at[j].set(jnp.inf)
    t = jnp.argmin(third_score)
    fallback = (drifts[i] + drifts[j] + drifts[t]) / 3.0
    ok = n_good >= min_good_drifts
    out = jnp.where(ok, good_mean, fallback)
    flag = jnp.where(ok, 0, 1).astype(jnp.int32)
    return out, flag


def _gather_crops(im: jnp.ndarray, boxes) -> jnp.ndarray:
    """Stack fixed-size crops (static start indices) into a (K, z, x, y) batch."""
    crops = [im[b[0][0]:b[0][1], b[1][0]:b[1][1], b[2][0]:b[2][1]]
             for b in boxes]
    return jnp.stack(crops)


from functools import lru_cache


@lru_cache(maxsize=64)
def _build_aligner(crops_key, upsample_factor, normalization,
                   drift_diff_th, min_good_drifts, subtract_mean, window):
    """One fully-jitted crop-consensus alignment program, cached per
    (crop layout, precision) so repeated FOVs reuse the executable."""

    @jax.jit
    def fn(src, ref):
        src_b = _gather_crops(src.astype(jnp.float32), crops_key)
        ref_b = _gather_crops(ref.astype(jnp.float32), crops_key)

        def one(s, r):
            return subpixel_phase_correlation(
                r, s, upsample_factor=upsample_factor,
                normalization=normalization,
                subtract_mean=subtract_mean, window=window)

        drifts = jax.vmap(one)(src_b, ref_b)
        return consensus_drift(drifts, drift_diff_th=drift_diff_th,
                               min_good_drifts=min_good_drifts)

    return fn


def align_image(src_im: jnp.ndarray, ref_im: jnp.ndarray,
                crops: Optional[np.ndarray] = None,
                drift_size: Optional[int] = None,
                upsample_factor: int = 100,
                normalization: Optional[str] = None,
                drift_diff_th: float = 1.0,
                min_good_drifts: int = 3,
                subtract_mean: bool = True,
                window: Optional[str] = "hann_xy",
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop-consensus drift of `src_im` against `ref_im` -> (drift, flag).

    Behavior target: reference correction_tools/alignment.py:527-695
    (align_image with use_autocorr=True).  All crops register concurrently
    and the consensus vote is branch-free, so the full aligner is one XLA
    program per FOV (compiled once per crop layout and cached).  Crops are
    mean-subtracted and xy-Hann-windowed by default — cropping breaks the
    circular-shift structure the FFT assumes, and sparse bead content plus
    a constant camera background otherwise bias the peak toward zero (the
    reference's blurnorm2d normalization served the same purpose,
    alignment_tools.py:278-328).
    """
    if crops is None:
        crops = generate_drift_crops(np.shape(src_im), drift_size)
    crops_key = tuple(tuple(tuple(int(v) for v in ax) for ax in b)
                      for b in crops)
    fn = _build_aligner(crops_key, int(upsample_factor), normalization,
                        float(drift_diff_th), int(min_good_drifts),
                        bool(subtract_mean), window)
    return fn(jnp.asarray(src_im), jnp.asarray(ref_im))


# ---------------------------------------------------------------------------
# 2D-projection alignment (the old bead-channel rough-drift path)
# ---------------------------------------------------------------------------


@jax.jit
def fft3d_from2d(src_im: jnp.ndarray, ref_im: jnp.ndarray) -> jnp.ndarray:
    """Integer 3D drift from two 2D phase correlations of projections.

    Stage 1: max-project z -> (dx, dy); stage 2: shift-crop in xy, then
    max-project x -> dz.  Behavior target: alignment_tools.py:330-353
    (fft3d_from2d), with phase correlation replacing blur-normalized
    fftconvolve.
    """
    src = src_im.astype(jnp.float32)
    ref = ref_im.astype(jnp.float32)

    def corr2d(a, b):
        Fa, Fb = jnp.fft.fftn(a), jnp.fft.fftn(b)
        R = Fa * jnp.conj(Fb)
        R = R / jnp.maximum(jnp.abs(R), 1e-20)
        cc = jnp.abs(jnp.fft.ifftn(R))
        flat = jnp.argmax(cc)
        pk = jnp.stack(jnp.unravel_index(flat, cc.shape)).astype(jnp.float32)
        size = jnp.asarray(cc.shape, jnp.float32)
        return jnp.where(pk > size / 2, pk - size, pk)

    dxy = corr2d(jnp.max(ref, axis=0), jnp.max(src, axis=0))
    # undo xy drift on src by rolling (integer), then z-correlate projections
    src_rolled = jnp.roll(jnp.roll(src, dxy[0].astype(jnp.int32), axis=1),
                          dxy[1].astype(jnp.int32), axis=2)
    dz = corr2d(jnp.max(ref, axis=2), jnp.max(src_rolled, axis=2))[0]
    return jnp.stack([dz, dxy[0], dxy[1]])
