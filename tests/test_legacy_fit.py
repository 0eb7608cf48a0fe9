"""Old-generation API adapters (visual_tools.py:151-382, :1969-2072)
against synthetic ground truth."""

import numpy as np
import pytest

from imageanalysis3_tpu import ops
from imageanalysis3_tpu import synthetic as syn


def _spot_image(shape=(12, 48, 48), centers=None, heights=None,
                sigmas=(1.6, 1.5, 1.5), background=120.0):
    if centers is None:
        centers = np.array([[6.0, 14.0, 16.0], [6.0, 30.0, 34.0]])
    if heights is None:
        heights = np.full(len(centers), 3000.0)
    s = np.tile(sigmas, (len(centers), 1))
    im = syn.render_gaussian_spots(shape, np.asarray(centers), heights,
                                   s, background=background)
    return np.asarray(im, np.float32), np.asarray(centers)


def test_get_seed_points_base_format_and_recovery():
    im, centers = _spot_image()
    seeds = ops.get_seed_points_base(im, th_seed=500.0)
    assert seeds.shape[0] == 3
    assert seeds.shape[1] == 2
    for c in centers:
        assert np.abs(seeds.T - c).sum(axis=1).min() <= 2.0
    withh = ops.get_seed_points_base(im, th_seed=500.0, return_h=True)
    assert withh.shape[0] == 4
    assert (withh[3] > 500.0).all()


def test_fitsinglegaussian_fixed_width_recovers_center():
    im, centers = _spot_image(centers=np.array([[6.0, 20.3, 24.7]]))
    p, ok = ops.fitsinglegaussian_fixed_width(
        im, centers[0] + [0.4, -0.8, 0.6], radius=8,
        width_zxy=(1.6, 1.5, 1.5))
    assert ok
    assert p.shape == (8,)
    assert np.abs(p[1:4] - centers[0]).max() < 0.1, p[1:4]
    assert abs(p[4] - 120.0) < 30.0                 # background
    assert p[0] > 2000.0                            # height
    assert np.allclose(p[5:], [1.6, 1.5, 1.5])      # widths echoed


def test_fitsinglegaussian_none_center_uses_brightest():
    im, centers = _spot_image(centers=np.array([[6.0, 22.0, 26.0]]))
    p, ok = ops.fitsinglegaussian_fixed_width(im, None, radius=8,
                                              width_zxy=(1.6, 1.5, 1.5))
    assert ok and np.abs(p[1:4] - centers[0]).max() < 0.1


def test_fit_seed_points_base_resolves_close_pair():
    centers = np.array([[6.0, 20.0, 20.0], [6.0, 20.0, 26.5],
                        [6.0, 34.0, 38.0]])
    im, _ = _spot_image(centers=centers,
                        heights=np.array([3000.0, 2400.0, 2800.0]))
    seeds = np.round(centers).astype(int).T           # (3, N) format
    rows = ops.fit_seed_points_base(im, seeds, width_z=1.6,
                                    width_xy=1.5, radius_fit=5)
    assert rows.shape == (3, 8)
    for c in centers:
        err = np.abs(rows[:, 1:4] - c).sum(axis=1).min()
        assert err < 0.15, (rows[:, 1:4], c)
    assert np.allclose(rows[:, 5:], [1.6, 1.5, 1.5])


def test_fit_seed_points_base_empty():
    im, _ = _spot_image()
    out = ops.fit_seed_points_base(im, np.zeros((3, 0)))
    assert out.size == 0


def test_get_std_centers_dedupes_and_sorts():
    centers = np.array([[6.0, 14.0, 16.0], [6.0, 30.0, 34.0]])
    im, _ = _spot_image(centers=centers,
                        heights=np.array([2200.0, 3400.0]))
    # duplicate seed rows for spot 0 -> close-point removal drops both
    seeds = np.array([[6, 14, 16], [6, 14, 16], [6, 30, 34]], float)
    beads = ops.get_STD_centers(im, seeds=seeds, remove_close_pts=True,
                                close_threshold=0.1, sort_by_h=True)
    assert beads is not None
    # the duplicated pair self-eliminates (reference criterion counts
    # the point itself, visual_tools.py:317-321)
    assert len(beads) == 1
    assert np.abs(beads[0] - centers[1]).max() < 0.1
    # without removal: all three fits survive, brightest first
    beads_all = ops.get_STD_centers(im, seeds=seeds,
                                    remove_close_pts=False,
                                    sort_by_h=True)
    assert len(beads_all) == 3
    assert np.abs(beads_all[0] - centers[1]).max() < 0.1


def test_fit_multi_gaussian_full_rows_and_min_height():
    centers = np.array([[6.0, 14.0, 16.0], [6.0, 30.0, 34.0]])
    im, _ = _spot_image(centers=centers,
                        heights=np.array([30000.0, 600.0]))
    # bright image: max*0.1 = ~3000 >= min_height, so the 1000 bar
    # holds and the dim spot is filtered
    rows = ops.fit_multi_gaussian(im, centers, fit_radius=5,
                                  min_height=1000.0)
    assert rows.shape[1] == 11
    assert len(rows) == 1
    assert np.abs(rows[0, 1:4] - centers[0]).max() < 0.1
    # dim-image adjustment (visual_tools.py:1996-1998): a lone 300-high
    # spot survives min_height=1000 because the bar drops to 5% of max
    im2, _ = _spot_image(centers=centers[:1],
                         heights=np.array([300.0]))
    rows2 = ops.fit_multi_gaussian(im2, centers[:1], fit_radius=5,
                                   min_height=1000.0)
    assert len(rows2) == 1


def test_get_std_centers_seed_layouts_agree():
    # (N, 3) rows and the (3, N) seeding-column format fit the same
    # spots; the ambiguous (3, 3) case must be read as rows
    centers = np.array([[6.0, 14.0, 16.0], [6.0, 30.0, 34.0],
                        [3.0, 38.0, 12.0], [9.0, 10.0, 38.0]])
    im, _ = _spot_image(centers=centers,
                        heights=np.full(4, 3000.0))
    rows = ops.get_STD_centers(im, seeds=centers)
    cols = ops.get_STD_centers(im, seeds=centers.T)
    assert rows.shape == cols.shape == (4, 3)
    assert np.allclose(np.sort(rows, 0), np.sort(cols, 0), atol=1e-5)
    d = np.linalg.norm(rows[:, None] - centers[None], axis=-1)
    assert (d.min(1) < 0.1).all()
    three = ops.get_STD_centers(im, seeds=centers[:3])
    d3 = np.linalg.norm(three[:, None] - centers[:3][None], axis=-1)
    assert three.shape == (3, 3) and (d3.min(1) < 0.1).all()
