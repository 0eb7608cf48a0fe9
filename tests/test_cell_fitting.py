"""Per-cell crop fitting: local seeding statistics recover dim spots that
whole-FOV seeding loses to the global budget.

Behavior targets: DaxProcesser._fit_spots_by_segmentation
(classes/preprocess.py:1093-1152) and per-chromosome crop fitting
(classes/__init__.py:57-90, 3642-3730).
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import cell_fitting as CF

SHAPE = (12, 96, 96)


def _two_nuclei_scene(rng):
    """Two nucleus boxes with dim spots inside; bright clutter outside."""
    labels = np.zeros(SHAPE, np.int32)
    labels[:, 8:40, 8:40] = 1
    labels[:, 56:88, 50:88] = 2
    dim = {1: np.array([[6.0, 20.0, 18.0], [5.0, 30.0, 30.0]]),
           2: np.array([[6.0, 70.0, 60.0], [7.0, 62.0, 78.0]])}
    bright = np.array([[6.0, 20.0, 70.0], [5.0, 44.0, 14.0],
                       [7.0, 44.0, 46.0], [6.0, 88.0, 20.0],
                       [5.0, 70.0, 30.0], [7.0, 30.0, 60.0],
                       [6.0, 10.0, 56.0], [5.0, 86.0, 40.0]])
    centers = np.vstack([dim[1], dim[2], bright])
    heights = np.concatenate([[400.0] * 4, [5000.0] * len(bright)])
    sigmas = np.tile([1.3, 1.8, 1.8], (len(centers), 1))
    im = syn.render_gaussian_spots(SHAPE, centers, heights, sigmas,
                                   background=120.0)
    return im.astype(np.float32), labels, dim, bright


def test_bounding_boxes_and_common_shape():
    labels = np.zeros((8, 32, 32), np.int32)
    labels[2:5, 4:10, 6:14] = 1
    labels[1:7, 20:30, 2:12] = 2
    boxes = CF.segmentation_bounding_boxes(labels, pad=2)
    lo, hi = boxes[1]
    np.testing.assert_array_equal(lo, [0, 2, 4])
    np.testing.assert_array_equal(hi, [7, 12, 16])
    shape = CF._common_crop_shape(list(boxes.values()), labels.shape)
    assert all(s % 8 == 0 or s == labels.shape[i]
               for i, s in enumerate(shape))
    assert all(shape[i] >= (hi - lo)[i] for lo, hi in boxes.values()
               for i in range(3))


def test_per_cell_fitting_recovers_dim_nuclear_spots():
    rng = np.random.default_rng(0)
    im, labels, dim, bright = _two_nuclei_scene(rng)

    # whole-FOV fitting with a tight global budget: bright clutter wins
    from imageanalysis3_tpu.ops.gaussian_fit import fit_fov_image
    res = fit_fov_image(jnp.asarray(im), max_num_seeds=8, th_seed=300.0,
                        use_dynamic_th=False)
    got = np.asarray(res.spots)[np.asarray(res.valid)][:, 1:4]
    missed = sum(np.linalg.norm(got - c, axis=1).min() > 1.0
                 for cid in dim for c in dim[cid])
    assert missed >= 2, "global budget should lose some dim nuclear spots"

    # per-cell fitting: local crops, local budgets -> all dim spots found
    spots, cell_ids = CF.fit_spots_by_segmentation(
        im, labels, th_seed=250.0, num_spots=8)
    assert len(spots)
    for cid, centers in dim.items():
        mine = spots[cell_ids == cid][:, 1:4]
        for c in centers:
            assert np.linalg.norm(mine - c, axis=1).min() < 0.3
    # spots outside the masks are excluded
    for s in spots[:, 1:4]:
        zi, xi, yi = np.clip(np.round(s).astype(int), 0,
                             np.asarray(SHAPE) - 1)
        # within search radius of its own cell (mask gate semantics)
        assert labels[max(zi - 3, 0):zi + 4,
                      max(xi - 3, 0):xi + 4,
                      max(yi - 3, 0):yi + 4].max() > 0


def test_fit_spots_around_centers():
    rng = np.random.default_rng(1)
    im, labels, dim, bright = _two_nuclei_scene(rng)
    chrom_centers = np.array([[6.0, 25.0, 24.0], [6.0, 66.0, 69.0]])
    spots, valid = CF.fit_spots_around_centers(
        im, chrom_centers, crop_size=(12, 32, 32), th_seed=250.0,
        max_num_seeds=8)
    assert spots.shape[0] == 2
    # each chromosome window recovers its own dim spots, FOV coordinates
    for k, cid in enumerate([1, 2]):
        mine = spots[k][valid[k]][:, 1:4]
        for c in dim[cid]:
            assert np.linalg.norm(mine - c, axis=1).min() < 0.3
