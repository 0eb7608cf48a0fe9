"""Colormap helpers for overlay rendering.

Behavior targets (reference figure_tools/color.py):
  * white->primary ramps myReds/myBlues/myGreens (+_r)      :7-28
  * ``transparent_cmap``  alpha ramp over an existing map    :30-38
  * ``black_gradient``    black->color ramp                  :40-51
  * ``transparent_gradient`` constant color, alpha ramp      :53-62
  * ``normalize_color``   clip + rescale to [0, 1]           :64-77

Clean-room API note: the reference's transparent_cmap mutates the passed
colormap's private ``_lut``; here a NEW ListedColormap is built by
sampling, so library colormaps are never modified in place.
"""

from __future__ import annotations

import numpy as np

from ._mpl import ensure_headless_backend
ensure_headless_backend()
import matplotlib.pyplot as plt
from matplotlib.colors import Colormap, ListedColormap


def _white_ramp(channel_offs) -> ListedColormap:
    colors = np.ones((256, 4))
    for c in channel_offs:
        colors[:, c] = np.linspace(1, 0, 256)
    return ListedColormap(colors)


# white -> pure-primary ramps (reference myReds/myBlues/myGreens)
myReds = _white_ramp((1, 2))
myBlues = _white_ramp((0, 1))
myGreens = _white_ramp((0, 2))
myReds_r = ListedColormap(np.flipud(myReds.colors))
myBlues_r = ListedColormap(np.flipud(myBlues.colors))
myGreens_r = ListedColormap(np.flipud(myGreens.colors))


def transparent_cmap(cmap, increasing_alpha: bool = True, N: int = 256,
                     max_alpha: float = 1.0) -> ListedColormap:
    """A copy of ``cmap`` whose alpha ramps linearly 0 -> max_alpha
    (or reversed), so low values vanish in overlays."""
    if isinstance(cmap, str):
        cmap = plt.get_cmap(cmap)
    assert isinstance(cmap, Colormap)
    colors = np.asarray(cmap(np.linspace(0.0, 1.0, N)))
    alpha = np.linspace(0.0, max_alpha, N)
    colors[:, 3] = alpha if increasing_alpha else alpha[::-1]
    return ListedColormap(colors)


def black_gradient(color, num_colors: int = 256, max_alpha: float = 1.0,
                   transparent: bool = False) -> ListedColormap:
    """Black -> ``color`` linear ramp; with ``transparent`` the alpha
    ramps alongside (for compositing over dark images)."""
    rgb = np.asarray(color, np.float64)[:3]
    colors = np.zeros((num_colors, 4))
    colors[:, :3] = np.linspace(0.0, 1.0, num_colors)[:, None] * rgb
    colors[:, 3] = (np.linspace(0.0, max_alpha, num_colors)
                    if transparent else max_alpha)
    return ListedColormap(colors)


def transparent_gradient(color, num_colors: int = 256,
                         max_alpha: float = 1.0) -> ListedColormap:
    """Constant ``color`` with a 0 -> max_alpha alpha ramp."""
    rgb = np.asarray(color, np.float64)[:3]
    colors = np.zeros((num_colors, 4))
    colors[:, :3] = rgb[None]
    colors[:, 3] = np.linspace(0.0, max_alpha, num_colors)
    return ListedColormap(colors)


def normalize_color(mat, vmin=None, vmax=None) -> np.ndarray:
    """Clip ``mat`` to [vmin, vmax] then rescale to [0, 1]
    (NaN-tolerant; NaNs pass through)."""
    a = np.array(mat, np.float64)
    if vmin is None:
        vmin = np.nanmin(a)
    if vmax is None:
        vmax = np.nanmax(a)
    a = np.clip(a, vmin, vmax)
    lo, hi = np.nanmin(a), np.nanmax(a)
    return (a - lo) / max(hi - lo, np.finfo(np.float64).tiny)
