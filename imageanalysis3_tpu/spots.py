"""Spot datatypes: Spots3D array carrier and SpotTuple groups.

Behavior target: reference classes/preprocess.py:13-316 — `Spots3D` is an
np.ndarray subclass of (N, 11) natural rows carrying `bits`, `channels`
and `pixel_sizes`, with `to_coords` (px), `to_positions` (nm) and
`to_intensities`; `SpotTuple` wraps a decoded group with internal-distance
helpers.  These are host-side containers; device programs consume the raw
arrays (the carrier metadata travels alongside, never inside, jit).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .config import DEFAULT_PIXEL_SIZE_NM

SPOT_COLUMNS = ["height", "z", "x", "y", "background", "sigma_z",
                "sigma_x", "sigma_y", "sin_t", "sin_p", "eps"]


class Spots3D(np.ndarray):
    """(N, 11) spot rows with bit/channel/pixel-size metadata."""

    def __new__(cls, spots, bits=None, channels=None,
                pixel_sizes=DEFAULT_PIXEL_SIZE_NM):
        obj = np.atleast_2d(np.asarray(spots, np.float64)).view(cls)
        n = len(obj)
        if bits is not None and np.isscalar(bits):
            bits = np.full(n, bits)
        obj.bits = None if bits is None else np.asarray(bits)
        if channels is not None and isinstance(channels, (str, int)):
            channels = [str(channels)] * n
        obj.channels = (None if channels is None
                        else np.asarray(channels).astype(str))
        obj.pixel_sizes = np.asarray(pixel_sizes, np.float64)
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self.bits = getattr(obj, "bits", None)
        self.channels = getattr(obj, "channels", None)
        self.pixel_sizes = getattr(obj, "pixel_sizes",
                                   np.asarray(DEFAULT_PIXEL_SIZE_NM))

    def to_coords(self) -> np.ndarray:
        """(N, 3) zxy in pixels."""
        return np.asarray(self)[:, 1:4]

    def to_positions(self, pixel_sizes=None) -> np.ndarray:
        """(N, 3) zxy in nm."""
        px = np.asarray(pixel_sizes if pixel_sizes is not None
                        else self.pixel_sizes)
        return self.to_coords() * px[None]

    def to_intensities(self) -> np.ndarray:
        return np.asarray(self)[:, 0]


class SpotTuple:
    """A decoded group of spots (reference classes/preprocess.py:139-316)."""

    def __init__(self, spots: Spots3D, bits=None, pixel_sizes=None,
                 spots_inds=None, tuple_id: Optional[int] = None):
        self.spots = spots if isinstance(spots, Spots3D) else \
            Spots3D(spots, bits=bits,
                    pixel_sizes=pixel_sizes or DEFAULT_PIXEL_SIZE_NM)
        self.bits = np.asarray(bits) if bits is not None else \
            self.spots.bits
        self.pixel_sizes = np.asarray(
            pixel_sizes if pixel_sizes is not None
            else self.spots.pixel_sizes)
        self.spots_inds = (None if spots_inds is None
                           else np.asarray(spots_inds))
        self.tuple_id = tuple_id

    def dist_internal(self) -> np.ndarray:
        """Pairwise distances (nm) among member spots, condensed order."""
        pos = self.spots.to_positions(self.pixel_sizes)
        n = len(pos)
        out = []
        for i in range(n):
            for j in range(i + 1, n):
                out.append(np.linalg.norm(pos[i] - pos[j]))
        return np.asarray(out)

    def intensities(self) -> np.ndarray:
        return self.spots.to_intensities()

    def centroid_spot(self) -> Spots3D:
        row = np.nanmean(np.asarray(self.spots), axis=0, keepdims=True)
        return Spots3D(row, pixel_sizes=self.pixel_sizes)


def reconstruct_spot_image(spots, image_size, use_intensity: bool = False,
                           use_stds: bool = True,
                           given_stds: Sequence[float] = (1.0, 1.0, 1.0),
                           radius: int = 8,
                           background: float = 0.0) -> np.ndarray:
    """Render fitted spots back into a 3D image (decode/fit QC).

    Behavior target: visual_tools.py:3331-3348 (reconstruct_image over
    add_source:87-111) — sum of per-spot 3D Gaussians with the spot's own
    (sigma_z, sigma_x, sigma_y) or a shared ``given_stds``, unit height or
    the fitted intensity.  (The reference function builds the image but
    falls off the end without returning it; this implements the intended
    contract.)  One jitted pass: every spot evaluates its Gaussian on a
    static (2*radius+1)^3 window around its rounded center and
    scatter-adds — no per-spot Python loop, so thousands of spots render
    in one device dispatch.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    arr = np.atleast_2d(np.asarray(spots, np.float64))
    if arr.shape[0] == 0:
        return np.full(tuple(int(s) for s in image_size), background,
                       np.float32)
    centers = arr[:, 1:4]
    heights = arr[:, 0] if use_intensity else np.ones(len(arr))
    stds = arr[:, 5:8] if use_stds else \
        np.tile(np.asarray(given_stds, np.float64)[None], (len(arr), 1))

    @partial(jax.jit, static_argnames=("shp", "r"))
    def _render(shp, r, cen, hts, sig):
        side = 2 * r + 1
        offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-r, r + 1)] * 3),
                                      indexing="ij"),
                         axis=-1).reshape(-1, 3)            # (side^3, 3)
        base = jnp.round(cen).astype(jnp.int32)             # (N, 3)
        vox = base[:, None, :] + offs[None]                 # (N, W, 3)
        d = vox.astype(jnp.float32) - cen[:, None, :].astype(jnp.float32)
        val = hts[:, None].astype(jnp.float32) * jnp.exp(
            -0.5 * jnp.sum((d / sig[:, None, :].astype(jnp.float32)) ** 2,
                           axis=-1))
        dims = jnp.asarray(shp, jnp.int32)
        inb = jnp.all((vox >= 0) & (vox < dims[None, None]), axis=-1)
        cp = jnp.clip(vox, 0, dims[None, None] - 1)
        idx = (cp[..., 0] * shp[1] + cp[..., 1]) * shp[2] + cp[..., 2]
        flat = jnp.zeros(shp[0] * shp[1] * shp[2], jnp.float32)
        flat = flat.at[idx.reshape(-1)].add(
            jnp.where(inb, val, 0.0).reshape(-1))
        return flat.reshape(shp)

    out = _render(tuple(int(s) for s in image_size), int(radius),
                  jnp.asarray(centers, jnp.float32),
                  jnp.asarray(heights, jnp.float32),
                  jnp.asarray(np.maximum(stds, 1e-3), jnp.float32))
    return np.asarray(out) + background
