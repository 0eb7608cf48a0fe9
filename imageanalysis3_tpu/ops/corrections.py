"""Camera/optics correction kernels, fused into one XLA pass.

Behavior targets (reference ImageAnalysis3):
  * hot-pixel removal        corrections.py:490-510 (Remove_Hot_Pixels)
  * z-shift normalization    corrections.py:479-487 (Z_Shift_Correction)
  * bleedthrough unmixing    io_tools/load.py:346-370
  * illumination flat-field  io_tools/load.py:372-384
  * gaussian high-pass       correction_tools/filter.py:14-19
  * fused chain entry        io_tools/load.py:166-521 (correct_fov_image)

Design: the reference runs these as sequential NumPy passes per channel in a
forked worker; here all channels are a single `(C, Z, X, Y)` array and the
whole chain is one jitted function, so XLA fuses the elementwise stages and
the stack never round-trips to host.  uint16 data is promoted to f32 on
entry and clipped back to the uint16 range at the end (reference
io_tools/load.py:363-366 clipping semantics).

Note: the reference's 4-neighbor mean at corrections.py:496 contains a
transcription quirk (it sums ``roll(im,1,2)`` twice and omits
``roll(im,-1,2)``); we implement the intended symmetric 4-neighbor mean.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .filters import (counting_median, counting_median_layers_and_global,
                      gaussian_highpass)


@partial(jax.jit, static_argnames=("rel_starts", "n_colors", "n_z"))
def deinterleave_stack(raw: jnp.ndarray, rel_starts: tuple,
                       n_colors: int, n_z: int) -> jnp.ndarray:
    """De-interleave a raw frame window on device -> (C, Z, H, W).

    Device half of the raw-pread input mode (io.dax.raw_frame_window /
    read_raw_window): the host uploads the contiguous interleaved frame
    block untouched, and channel c's z-stack is the static strided slice
    ``raw[rel_starts[c] :: n_colors][:n_z]`` — same layout arithmetic as
    the host `split_channels` (reference io_tools/load.py:524-550),
    executed as XLA strided slices that fuse into the consuming
    correction pass.  Host input work collapses to a sequential read.
    """
    return jnp.stack([
        jax.lax.slice_in_dim(raw, s, s + (n_z - 1) * n_colors + 1,
                             stride=n_colors)
        for s in rel_starts])


@partial(jax.jit, static_argnames=("hot_pix_th", "hot_th"))
def remove_hot_pixels(im: jnp.ndarray, hot_pix_th: float = 0.5,
                      hot_th: float = 4.0) -> jnp.ndarray:
    """Replace camera hot pixels with their 4-neighbor mean.

    A pixel column (x, y) is hot when its intensity exceeds ``hot_th`` x
    (4-neighbor mean) in more than ``hot_pix_th`` of z-layers; hot columns
    are replaced by the 4-neighbor mean in every layer (computed from the
    original image, borders never replaced).
    Behavior target: corrections.py:490-510.
    """
    imf = im.astype(jnp.float32)
    neigh = (jnp.roll(imf, 1, 1) + jnp.roll(imf, -1, 1)
             + jnp.roll(imf, 1, 2) + jnp.roll(imf, -1, 2)) * 0.25
    hot_frac = jnp.mean((imf > hot_th * neigh).astype(jnp.float32), axis=0)
    hot2d = hot_frac > hot_pix_th
    # never touch the xy border (reference guards 0 < x < X-1 etc.)
    z, x, y = imf.shape
    xi = jnp.arange(x)[:, None]
    yi = jnp.arange(y)[None, :]
    interior = (xi > 0) & (xi < x - 1) & (yi > 0) & (yi < y - 1)
    hot2d = hot2d & interior
    return jnp.where(hot2d[None], neigh, imf)


@partial(jax.jit, static_argnames=("median_subsample",))
def z_shift_correct(im: jnp.ndarray,
                    median_subsample: int = 1) -> jnp.ndarray:
    """Per-z-layer median normalization, rescaled to the global median.

    out = im / median(im, axis=(x,y)) * median(im).
    Behavior target: corrections.py:479-487 (Z_Shift_Correction).
    ``median_subsample`` passes through to the counting median (see
    filters.counting_median_layers_and_global; 1 = exact).
    """
    imf = im.astype(jnp.float32)
    layer_med, global_med = counting_median_layers_and_global(
        imf, subsample=median_subsample)
    return imf / layer_med[:, None, None] * global_med


@jax.jit
def illumination_correct(im: jnp.ndarray, profile: jnp.ndarray) -> jnp.ndarray:
    """Flat-field: divide every z-layer by the per-channel 2D profile.

    Behavior target: io_tools/load.py:372-384.
    `im`: (Z, X, Y); `profile`: (X, Y).
    """
    return im.astype(jnp.float32) / profile[None].astype(jnp.float32)


@jax.jit
def bleedthrough_unmix(ims: jnp.ndarray, profile: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel linear unmixing across the correction channels.

    out[i] = sum_j ims[j] * profile[i, j]  (profile per-pixel 2D maps).
    Behavior target: io_tools/load.py:346-370.
    `ims`: (C, Z, X, Y); `profile`: (C, C, X, Y).
    """
    return jnp.einsum("ijxy,jzxy->izxy", profile.astype(jnp.float32),
                      ims.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Fused correction pass
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=(
    "hot_pixel", "hot_pixel_th", "hot_pixel_ratio", "z_shift",
    "do_bleedthrough", "do_illumination", "do_highpass",
    "highpass_sigma", "highpass_truncate", "clip", "clip_min", "clip_max",
    "median_subsample", "sequential_channels"))
def correct_channel_stack(
    ims: jnp.ndarray,
    bleed_profile: Optional[jnp.ndarray] = None,
    illumination_profile: Optional[jnp.ndarray] = None,
    *,
    hot_pixel: bool = True,
    hot_pixel_th: float = 0.5,
    hot_pixel_ratio: float = 4.0,
    z_shift: bool = True,
    do_bleedthrough: bool = True,
    do_illumination: bool = True,
    do_highpass: bool = False,
    highpass_sigma: float = 3.0,
    highpass_truncate: float = 2.0,
    clip: bool = True,
    clip_min: float = 0.0,
    clip_max: float = 65535.0,
    median_subsample: int = 1,
    sequential_channels: bool = False,
) -> jnp.ndarray:
    """One fused pass over a `(C, Z, X, Y)` multi-channel stack.

    Stage order matches the reference chain (io_tools/load.py:166-521):
    hot-pixel -> z-shift -> bleedthrough -> illumination -> high-pass.
    Drift/chromatic warping is a separate op (:mod:`.warp`) because it needs
    the drift result.

    ``sequential_channels``: run the per-channel stages one channel at a
    time (`lax.map`) instead of batched (`vmap`).  Identical values; caps
    live HBM at ~one channel's working set instead of C of them — at
    production scale (3 x 60x2048x2048 f32 = 3 GB per intermediate) the
    batched form overflows a 16 GB chip once hot-pixel/z-shift temps pile
    up.  The stages are HBM-bandwidth-bound at this size, so serializing
    channels costs no throughput.  Only bleedthrough mixes channels; it
    stays batched in both modes (its einsum needs all channels at once).
    """
    _map = ((lambda f, xs: jax.lax.map(f, xs)) if sequential_channels
            else (lambda f, xs: jax.vmap(f)(xs)))

    def _pre(im):
        x = im.astype(jnp.float32)
        if hot_pixel:
            x = remove_hot_pixels(x, hot_pix_th=hot_pixel_th,
                                  hot_th=hot_pixel_ratio)
        if z_shift:
            x = z_shift_correct(x, median_subsample=median_subsample)
        return x

    # uint16 -> f32 happens inside the per-channel body so sequential mode
    # never materializes a full-stack f32 copy of the raw input
    out = _map(_pre, ims)
    if do_bleedthrough and bleed_profile is not None:
        out = bleedthrough_unmix(out, bleed_profile)
        if clip:
            out = jnp.clip(out, clip_min, clip_max)

    post_illum = (do_illumination and illumination_profile is not None)
    if post_illum or do_highpass or clip:
        def _post(args):
            x, prof = args
            if post_illum:
                x = x / prof[None].astype(jnp.float32)
            if do_highpass:
                x = gaussian_highpass(x, highpass_sigma, highpass_truncate)
            if clip:
                x = jnp.clip(x, clip_min, clip_max)
            return x

        prof = (illumination_profile if post_illum
                else jnp.ones((ims.shape[0], 1, 1), jnp.float32))
        out = _map(_post, (out, prof))
    return out
