"""Spot partitioning: assign spots to segmented cells, count genes.

Behavior targets (reference ImageAnalysis3):
  * label lookup per spot       classes/partition_spots.py:113-140
    (Spots_Partition.spots_to_labels: gather the segmentation labels in a
    cube around each spot, take the most frequent positive label, -1 if
    none)
  * DAPI signal per spot        classes/partition_spots.py:142-155
    (spots_to_DAPI: max intensity in a radius)
  * gene count matrix           classes/partition_spots.py:52-110
    (run_RNA: per (cell, bit) spot counts)
  * mask translation            segmentation_tools/cell.py:548-597
    (translate_segmentation: rigid rotation + drift into another
    experiment's frame, nearest-neighbor resample)

TPU-first design: spots are fixed-capacity masked tables; the label vote
is a vmapped gather + sorted-run mode (no python per-spot loops); mask
translation is a nearest-neighbor inverse-transform gather like the
image warp.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cube_offsets(radius: int) -> np.ndarray:
    g = np.indices([2 * radius + 1] * 3).reshape(3, -1).T - radius
    return g.astype(np.int32)


@partial(jax.jit, static_argnames=("search_radius",))
def spots_to_labels(label_im: jnp.ndarray, coords: jnp.ndarray,
                    valid: jnp.ndarray,
                    search_radius: int = 10) -> jnp.ndarray:
    """Most-frequent positive segmentation label around each spot.

    label_im: (Z, X, Y) int; coords: (N, 3) zxy px.  Returns (N,) int32
    cell labels, -1 where no positive label is found or the spot is
    invalid.  Behavior target: Spots_Partition.spots_to_labels
    (classes/partition_spots.py:113-140).
    """
    offs = jnp.asarray(_cube_offsets(search_radius))
    base = jnp.round(coords).astype(jnp.int32)
    pos = base[:, None, :] + offs[None]
    shape = jnp.asarray(label_im.shape, jnp.int32)
    inb = jnp.all((pos >= 0) & (pos < shape[None, None]), axis=-1)
    cpos = jnp.clip(pos, 0, shape[None, None] - 1)
    flat = label_im.reshape(-1).astype(jnp.int32)
    idx = (cpos[..., 0] * label_im.shape[1] + cpos[..., 1]) \
        * label_im.shape[2] + cpos[..., 2]
    vals = jnp.where(inb, jnp.take(flat, idx), 0)      # (N, P)

    def mode_positive(row):
        s = jnp.sort(row)                                # zeros first
        left = jnp.searchsorted(s, s, side="left")
        right = jnp.searchsorted(s, s, side="right")
        cnt = jnp.where(s > 0, right - left, 0)
        best = jnp.argmax(cnt)
        return jnp.where(cnt[best] > 0, s[best], -1)

    labels = jax.vmap(mode_positive)(vals)
    return jnp.where(valid, labels, -1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("search_radius",))
def spots_to_intensity(im: jnp.ndarray, coords: jnp.ndarray,
                       valid: jnp.ndarray,
                       search_radius: int = 5) -> jnp.ndarray:
    """Max image intensity in a cube around each spot (reference
    spots_to_DAPI, classes/partition_spots.py:142-155)."""
    offs = jnp.asarray(_cube_offsets(search_radius))
    base = jnp.round(coords).astype(jnp.int32)
    pos = base[:, None, :] + offs[None]
    shape = jnp.asarray(im.shape, jnp.int32)
    inb = jnp.all((pos >= 0) & (pos < shape[None, None]), axis=-1)
    cpos = jnp.clip(pos, 0, shape[None, None] - 1)
    flat = im.reshape(-1).astype(jnp.float32)
    idx = (cpos[..., 0] * im.shape[1] + cpos[..., 1]) * im.shape[2] \
        + cpos[..., 2]
    vals = jnp.where(inb, jnp.take(flat, idx), -jnp.inf)
    out = jnp.max(vals, axis=1)
    return jnp.where(valid, out, jnp.nan)


@partial(jax.jit, static_argnames=("search_radius",))
def find_coordinate_intensities(im: jnp.ndarray, coords: jnp.ndarray,
                                search_radius: int = 5) -> jnp.ndarray:
    """(N, (2r+1)^3) image intensities around each rounded spot
    coordinate, edge-CLAMPED rather than masked — out-of-bounds
    neighborhood voxels read the nearest border voxel, matching the
    reference exactly (find_coordinate_intensities,
    classes/partition_spots.py:212-236)."""
    offs = jnp.asarray(_cube_offsets(search_radius))
    base = jnp.round(coords).astype(jnp.int32)
    pos = base[:, None, :] + offs[None]
    shape = jnp.asarray(im.shape, jnp.int32)
    cpos = jnp.clip(pos, 0, shape[None, None] - 1)
    flat = im.reshape(-1).astype(jnp.float32)
    idx = (cpos[..., 0] * im.shape[1] + cpos[..., 1]) * im.shape[2] \
        + cpos[..., 2]
    return jnp.take(flat, idx)


def count_genes(labels_per_bit: Dict[int, np.ndarray],
                n_cells: Optional[int] = None) -> Tuple[np.ndarray,
                                                        np.ndarray,
                                                        np.ndarray]:
    """Per-(cell, bit) spot counts -> (counts (C, B), cell ids, bit ids).

    Host-side assembly of the reference gene-count table (run_RNA,
    classes/partition_spots.py:52-110): rows = cells present in any bit's
    labels, columns = bits in sorted order.
    """
    bits = sorted(labels_per_bit)
    all_labels = np.concatenate([np.asarray(labels_per_bit[b]).ravel()
                                 for b in bits]) if bits else np.zeros(0)
    cells = np.unique(all_labels[all_labels > 0]).astype(np.int32)
    counts = np.zeros((len(cells), len(bits)), np.int32)
    cell_index = {int(c): i for i, c in enumerate(cells)}
    for j, b in enumerate(bits):
        lab = np.asarray(labels_per_bit[b]).ravel()
        for l in lab[lab > 0]:
            counts[cell_index[int(l)], j] += 1
    return counts, cells, np.asarray(bits, np.int32)


def _rigid_plane_map(shape: Tuple[int, int, int],
                     rotation_xy: jnp.ndarray, drift: jnp.ndarray):
    """Shared inverse rigid map for the nearest-neighbor warps below:
    output voxel o samples source s = R^-1 @ (o_xy - c) + c - drift_xy
    per xy plane, z layers shift by -drift_z (nearest layer).  Returns
    (per-plane flat gather index, in-bounds mask, source z layer ids)."""
    z, x, y = shape
    cx = (x - 1) / 2.0
    cy = (y - 1) / 2.0
    xs = jnp.arange(x, dtype=jnp.float32)[:, None] - cx
    ys = jnp.arange(y, dtype=jnp.float32)[None, :] - cy
    rinv = jnp.linalg.inv(rotation_xy.astype(jnp.float32))
    sx = rinv[0, 0] * xs + rinv[0, 1] * ys + cx - drift[1]
    sy = rinv[1, 0] * xs + rinv[1, 1] * ys + cy - drift[2]
    xi = jnp.clip(jnp.round(sx).astype(jnp.int32), 0, x - 1)
    yi = jnp.clip(jnp.round(sy).astype(jnp.int32), 0, y - 1)
    inb = (sx >= -0.5) & (sx <= x - 0.5) & (sy >= -0.5) & (sy <= y - 0.5)
    zi = jnp.clip(jnp.round(jnp.arange(z, dtype=jnp.float32)
                            - drift[0]).astype(jnp.int32), 0, z - 1)
    return xi * y + yi, inb, zi


@jax.jit
def translate_label_image(labels: jnp.ndarray, rotation_xy: jnp.ndarray,
                          drift: jnp.ndarray) -> jnp.ndarray:
    """Rigid rotation (about the xy image center) + drift of a label
    volume, nearest-neighbor resampled (reference translate_segmentation,
    segmentation_tools/cell.py:548-597 / cv2.warpAffine semantics).
    Out-of-bounds voxels become background 0.
    """
    plane_idx, inb, zi = _rigid_plane_map(labels.shape, rotation_xy,
                                          drift)
    vol = labels.astype(jnp.int32)[zi]
    out = jax.vmap(lambda pl: jnp.take(pl.reshape(-1), plane_idx))(vol)
    return jnp.where(inb[None], out, 0)


@jax.jit
def translate_volume(im: jnp.ndarray, rotation_xy: jnp.ndarray,
                     drift: jnp.ndarray) -> jnp.ndarray:
    """Float-intensity variant of :func:`translate_label_image` (same
    inverse rigid map, nearest-neighbor): warps e.g. a DAPI stack into
    another experiment's frame so the residual drift between experiments
    can be phase-correlated (reference translate_segmentation rotates
    the old DAPI alongside the labels, segmentation_tools/cell.py:
    548-597).  Out-of-bounds voxels become 0."""
    plane_idx, inb, zi = _rigid_plane_map(im.shape, rotation_xy, drift)
    vol = im.astype(jnp.float32)[zi]
    out = jax.vmap(lambda pl: jnp.take(pl.reshape(-1), plane_idx))(vol)
    return jnp.where(inb[None], out, 0.0)
