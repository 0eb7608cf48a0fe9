"""Seeding vs a NumPy transliteration of the reference get_seeds."""

import numpy as np
import scipy.ndimage as ndi

from imageanalysis3_tpu.ops import seeding as S
from imageanalysis3_tpu import synthetic as syn


def _np_get_seeds(im, th_seed=150.0, gfilt_size=0.75,
                  background_gfilt_size=7.5, filt_size=3,
                  min_edge_distance=2, dynamic_niters=10,
                  min_dynamic_seeds=1, hot_pixel_th=3):
    """Reference semantics (spot_tools/fitting.py:20-154), NumPy golden."""
    im = im.astype(np.float32)
    max_im = ndi.gaussian_filter(im, gfilt_size) if gfilt_size else im
    max_ft = ndi.maximum_filter(max_im, filt_size) == max_im
    min_im = (ndi.gaussian_filter(im, background_gfilt_size)
              if background_gfilt_size else im)
    min_ft = ndi.minimum_filter(min_im, filt_size) != min_im
    local_max = max_ft & min_ft
    diff = max_im.astype(np.float32) - min_im.astype(np.float32)
    for it in range(dynamic_niters):
        th = th_seed * (1 - it / dynamic_niters)
        coords = np.where(local_max & (diff >= th))
        if min_edge_distance > 0:
            keep = np.ones(len(coords[0]), bool)
            for c, n in zip(coords, im.shape):
                keep &= (c >= min_edge_distance) & (c <= n - min_edge_distance)
            coords = tuple(c[keep] for c in coords)
        if len(coords[0]) >= min_dynamic_seeds:
            break
    # hot-pixel xy-duplicate removal
    _, xs, ys = coords
    xy = list(zip(xs.tolist(), ys.tolist()))
    from collections import Counter
    cts = Counter(xy)
    keep = np.array([cts[k] < hot_pixel_th for k in xy], bool)
    coords = tuple(c[keep] for c in coords)
    hs = diff[coords]
    out = np.array(coords).T[np.flipud(np.argsort(hs))]
    return out, np.flipud(np.sort(hs))


def test_seeds_match_reference_numpy(rng):
    im, truth = syn.random_spot_field((12, 80, 80), 15,
                                      np.random.default_rng(7),
                                      min_separation=10.0,
                                      height_range=(500.0, 3000.0))
    im = syn.poisson_camera_noise(im, np.random.default_rng(8)
                                  ).astype(np.float32)
    got = S.get_seeds(im, th_seed=150.0, max_num_seeds=64)
    ref_coords, ref_hs = _np_get_seeds(im)
    n = int(got.count)
    assert n == len(ref_coords)
    got_set = {tuple(c) for c in np.asarray(got.coords[:n])}
    ref_set = {tuple(c) for c in ref_coords}
    assert got_set == ref_set
    np.testing.assert_allclose(np.sort(np.asarray(got.heights[:n])),
                               np.sort(ref_hs), rtol=1e-3)


def test_seeds_find_all_planted_spots():
    rng = np.random.default_rng(3)
    im, truth = syn.random_spot_field((14, 96, 96), 12, rng,
                                      min_separation=12.0,
                                      height_range=(800.0, 2500.0))
    im = im.astype(np.float32)
    got = S.get_seeds(im, th_seed=300.0, max_num_seeds=64)
    n = int(got.count)
    found = np.asarray(got.coords[:n], float)
    for c in truth["centers"]:
        d = np.linalg.norm(found - c, axis=1).min()
        assert d < 1.5, f"spot at {c} not seeded (nearest {d:.2f})"


def test_dynamic_threshold_lowers_until_found():
    """A dim spot below th_seed is still found via the decay schedule."""
    rng = np.random.default_rng(1)
    im = np.full((10, 48, 48), 100.0, np.float32)
    im = syn.render_gaussian_spots((10, 48, 48), np.array([[5, 24, 24.0]]),
                                   np.array([120.0]),
                                   np.array([[1.4, 1.9, 1.9]]),
                                   background=100.0).astype(np.float32)
    got = S.get_seeds(im, th_seed=500.0, max_num_seeds=8,
                      use_dynamic_th=True, dynamic_niters=10,
                      min_dynamic_seeds=1)
    assert int(got.count) >= 1
    assert float(got.threshold) < 500.0
    c = np.asarray(got.coords[0])
    assert np.linalg.norm(c - [5, 24, 24]) < 1.5


def test_seed_capacity_keeps_brightest():
    rng = np.random.default_rng(2)
    im, truth = syn.random_spot_field((10, 64, 64), 20, rng,
                                      min_separation=8.0,
                                      height_range=(300.0, 3000.0))
    im = im.astype(np.float32)
    all_seeds = S.get_seeds(im, th_seed=200.0, max_num_seeds=64)
    few_seeds = S.get_seeds(im, th_seed=200.0, max_num_seeds=5)
    n_all = int(all_seeds.count)
    hs_all = np.asarray(all_seeds.heights[:n_all])
    hs_few = np.asarray(few_seeds.heights[:5])
    np.testing.assert_allclose(hs_few, np.sort(hs_all)[::-1][:5], rtol=1e-5)


def test_hot_pixel_column_removed_real_spots_kept():
    """A bright defect column (same xy qualifying in many z layers) is
    screened out by the deferred per-candidate hot check, while planted
    real spots survive with correct heights/order (reference semantics:
    spot_tools/fitting.py's xy-duplicate removal)."""
    rng = np.random.default_rng(9)
    im, truth = syn.random_spot_field((12, 64, 64), 6, rng,
                                      min_separation=12.0,
                                      height_range=(800.0, 2500.0))
    im = im.astype(np.float32)
    im[:, 40, 40] += 5000.0          # hot column: every z a local max
    got = S.get_seeds(im, th_seed=300.0, max_num_seeds=32)
    ref_coords, ref_hs = _np_get_seeds(im, th_seed=300.0)
    n = int(got.count)
    got_set = {tuple(c) for c in np.asarray(got.coords[:n])}
    assert not any(c[1] == 40 and c[2] == 40 for c in got_set)
    assert got_set == {tuple(c) for c in ref_coords}
    # by-height ordering holds after the post-recovery re-sort
    hs = np.asarray(got.heights[:n])
    assert np.all(np.diff(hs) <= 1e-6)
    np.testing.assert_allclose(np.sort(hs), np.sort(ref_hs), rtol=1e-3)
