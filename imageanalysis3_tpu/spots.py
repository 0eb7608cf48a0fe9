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
