"""Per-cell / per-chromosome crop fitting: seed + fit inside local crops.

Behavior targets (reference ImageAnalysis3):
  * fit-by-segmentation        classes/preprocess.py:1093-1152
    (DaxProcesser._fit_spots_by_segmentation: per cell id, bounding-box
    crop (+pad), fit the crop, shift coords to the FOV frame, keep spots
    whose position lands inside the cell mask)
  * bounding boxes             segmentation_tools/cell.py
    (segmentation_mask_2_bounding_box)
  * per-chromosome crop fit    classes/__init__.py:57-90, 3642-3730
    (_fit_single_image / Cell_Data._multi_fitting_for_chromosome: crops
    around chromosome coordinates, seeds found within the crop, mp.Pool
    fan-out)

Why it matters: whole-FOV seeding ranks every candidate against the global
dynamic threshold, so dim in-nucleus spots lose to bright spots elsewhere
once the seed budget saturates.  Cropping first makes the seeding
statistics local — the reference's dense-nucleus behavior.

TPU-first design: the reference's ragged per-cell bounding boxes become
one *static* crop shape (the max box extent, padded and rounded) so a
single compiled program `lax.map`s over all crops: dynamic_slice gather,
per-crop dynamic-threshold seeding, batched LM fitting, coordinate shift
back to the FOV frame.  One compile serves every cell/chromosome; memory
is one crop in flight (lax.map, not vmap).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian_fit import iter_fit_seed_points
from .seeding import get_seeds


def segmentation_bounding_boxes(labels: np.ndarray, pad: int = 3
                                ) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """cell id -> (lo, hi) inclusive-exclusive bounding box, padded and
    clipped to the volume (reference segmentation_mask_2_bounding_box)."""
    labels = np.asarray(labels)
    out = {}
    for cid in np.unique(labels):
        if cid <= 0:
            continue
        idx = np.nonzero(labels == cid)
        lo = np.maximum([int(a.min()) - pad for a in idx], 0)
        hi = np.minimum([int(a.max()) + 1 + pad for a in idx], labels.shape)
        out[int(cid)] = (np.asarray(lo), np.asarray(hi))
    return out


def _common_crop_shape(boxes, volume_shape, multiple: int = 8
                       ) -> Tuple[int, ...]:
    """One static crop shape covering every box (rounded up per axis so
    few distinct shapes -> few compiles across calls)."""
    ext = np.max([hi - lo for lo, hi in boxes], axis=0)
    ext = np.minimum(-(-ext // multiple) * multiple, volume_shape)
    return tuple(int(e) for e in ext)


@partial(jax.jit, static_argnames=(
    "crop_size", "max_num_seeds", "th_seed", "radius", "lm_iters",
    "n_max_iter", "dynamic_niters", "min_dynamic_seeds", "gfilt_size",
    "background_gfilt_size"))
def fit_spots_in_crops(im: jnp.ndarray, origins: jnp.ndarray,
                       crop_size: Tuple[int, int, int],
                       max_num_seeds: int = 64,
                       th_seed: float = 500.0,
                       radius: int = 5,
                       lm_iters: int = 30,
                       n_max_iter: int = 8,
                       dynamic_niters: int = 10,
                       min_dynamic_seeds: int = 1,
                       gfilt_size: float = 0.75,
                       background_gfilt_size: float = 7.5
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Seed + fit fixed-size crops of one stack, coords in the FOV frame.

    im: (Z, X, Y); origins: (N, 3) int32 crop corners (will be clamped so
    crops stay in bounds).  Returns (spots (N, max_num_seeds, 11),
    valid (N, max_num_seeds)).  One `lax.map` iteration per crop bounds
    the working set to a single crop.
    """
    imf = im.astype(jnp.float32)
    shape = jnp.asarray(im.shape, jnp.int32)
    cs = jnp.asarray(crop_size, jnp.int32)
    origins = jnp.clip(origins.astype(jnp.int32), 0, shape[None] - cs[None])

    def one(origin):
        crop = jax.lax.dynamic_slice(imf, origin, crop_size)
        seeds = get_seeds(crop, max_num_seeds=max_num_seeds,
                          th_seed=th_seed, gfilt_size=gfilt_size,
                          background_gfilt_size=background_gfilt_size,
                          dynamic_niters=dynamic_niters,
                          min_dynamic_seeds=min_dynamic_seeds)
        res = iter_fit_seed_points(crop, seeds.coords.astype(jnp.float32),
                                   seeds.valid, radius=radius,
                                   lm_iters=lm_iters,
                                   n_max_iter=n_max_iter)
        spots = res.spots.at[:, 1:4].add(origin.astype(jnp.float32)[None])
        return spots, res.valid

    return jax.lax.map(one, origins)


def fit_spots_by_segmentation(im: np.ndarray, labels: np.ndarray,
                              th_seed: float = 500.0,
                              num_spots: Optional[int] = None,
                              crop_pad: int = 3,
                              segment_search_radius: int = 3,
                              drift: Optional[np.ndarray] = None,
                              **fit_kwargs
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """Fit spots independently inside every segmented cell.

    Behavior target: DaxProcesser._fit_spots_by_segmentation
    (classes/preprocess.py:1093-1152): per cell, crop the padded bounding
    box (translated by `drift` when the mask comes from another round),
    fit the crop, map coordinates back to the FOV frame, and keep spots
    whose (rounded, radius-searched) position carries the cell's label.
    Returns (spots (M, 11), cell_ids (M,)).
    """
    from ..analysis.partition import spots_to_labels

    labels = np.asarray(labels)
    boxes = segmentation_bounding_boxes(labels, pad=crop_pad)
    if not boxes:
        return np.zeros((0, 11), np.float32), np.zeros(0, np.int32)
    cids = sorted(boxes)
    crop_size = _common_crop_shape([boxes[c] for c in cids], labels.shape)
    drift = np.zeros(3) if drift is None else np.asarray(drift)
    # center the static crop on each cell's box (reference uses the exact
    # padded box; the static crop covers it by construction)
    origins = []
    for c in cids:
        lo, hi = boxes[c]
        ctr = (lo + hi) / 2.0 + drift
        origins.append(np.round(ctr - np.asarray(crop_size) / 2.0))
    origins = np.asarray(origins, np.int32)

    spots, valid = fit_spots_in_crops(
        jnp.asarray(im), jnp.asarray(origins), crop_size,
        max_num_seeds=int(num_spots or 64), th_seed=th_seed, **fit_kwargs)
    spots = np.asarray(spots)
    valid = np.asarray(valid)

    all_spots, all_ids = [], []
    lab_j = jnp.asarray(labels)
    for k, cid in enumerate(cids):
        sp = spots[k][valid[k]]
        if not len(sp):
            continue
        coords = sp[:, 1:4] - drift[None]
        got = np.asarray(spots_to_labels(
            lab_j, jnp.asarray(coords, jnp.float32),
            jnp.ones(len(coords), bool),
            search_radius=segment_search_radius))
        keep = got == cid
        if keep.any():
            all_spots.append(sp[keep])
            all_ids.append(np.full(keep.sum(), cid, np.int32))
    if not all_spots:
        return np.zeros((0, 11), np.float32), np.zeros(0, np.int32)
    return np.concatenate(all_spots), np.concatenate(all_ids)


def fit_spots_around_centers(im: np.ndarray, centers: np.ndarray,
                             crop_size: Tuple[int, int, int] = (16, 32, 32),
                             th_seed: float = 300.0,
                             max_num_seeds: int = 32,
                             **fit_kwargs
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Fit spots in fixed crops around chromosome coordinates.

    Behavior target: per-chromosome crop fitting (_fit_single_image,
    classes/__init__.py:57-90 + _multi_fitting_for_chromosome :3642-3730):
    the reference seeds and fits windows around each chromosome center so
    candidate statistics are local to the chromosome territory.  Returns
    (spots (N_centers, max_num_seeds, 11) in the FOV frame, valid mask).
    """
    centers = np.asarray(centers, float)
    origins = np.round(centers - np.asarray(crop_size) / 2.0).astype(
        np.int32)
    spots, valid = fit_spots_in_crops(
        jnp.asarray(im), jnp.asarray(origins),
        tuple(int(c) for c in crop_size),
        max_num_seeds=max_num_seeds, th_seed=th_seed, **fit_kwargs)
    return np.asarray(spots), np.asarray(valid)
