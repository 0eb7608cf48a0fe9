"""Spot datatypes, crop primitives, spot checking.

Behavior targets: classes/preprocess.py:13-316 (Spots3D/SpotTuple,
ImageCrop_3d), io_tools/crop.py:59-151, spot_tools/checking.py.
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.spots import Spots3D, SpotTuple
from imageanalysis3_tpu.io.crop import ImageCrop3D, generate_neighboring_crop
from imageanalysis3_tpu.decode.checking import (check_picked_spots,
                                                filter_candidate_spots)


def test_spots3d_carriers():
    rows = np.zeros((3, 11))
    rows[:, 0] = [100, 200, 300]
    rows[:, 1:4] = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    s = Spots3D(rows, bits=5, channels="647")
    assert (s.bits == 5).all() and list(s.channels) == ["647"] * 3
    np.testing.assert_array_equal(s.to_coords(), rows[:, 1:4])
    np.testing.assert_allclose(s.to_positions(),
                               rows[:, 1:4] * [200.0, 108.0, 108.0])
    np.testing.assert_array_equal(s.to_intensities(), [100, 200, 300])
    # slicing preserves the carrier metadata
    sub = s[:2]
    assert sub.pixel_sizes is not None


def test_spot_tuple():
    rows = np.zeros((2, 11))
    rows[:, 1:4] = [[0, 0, 0], [0, 0, 1]]
    t = SpotTuple(Spots3D(rows), bits=[1, 2], spots_inds=[7, 9],
                  tuple_id=42)
    np.testing.assert_allclose(t.dist_internal(), [108.0])
    assert t.tuple_id == 42
    c = t.centroid_spot()
    np.testing.assert_allclose(c.to_coords()[0], [0, 0, 0.5])


def test_image_crop3d():
    crop = ImageCrop3D.from_center([5, 10, 10], 6, image_size=(8, 32, 32))
    assert crop.shape == (6, 6, 6)
    im = np.arange(8 * 32 * 32).reshape(8, 32, 32)
    np.testing.assert_array_equal(crop.crop(im), im[2:8, 7:13, 7:13])
    # clamped at the z boundary
    crop2 = ImageCrop3D.from_center([0, 0, 0], 6, image_size=(8, 32, 32))
    assert crop2.array[0, 0] == 0 and crop2.shape[0] == 3
    # overlap
    o = crop.overlap(ImageCrop3D(np.array([[4, 10], [10, 20], [0, 9]]),
                                 (8, 32, 32)))
    assert o is not None and o.shape == (4, 3, 2)
    assert crop.overlap(ImageCrop3D(np.array([[0, 1], [0, 1], [0, 1]]),
                                    (8, 32, 32))) is None
    # drift translation (z hi re-clamped to the image)
    t = crop.translate_drift([1.2, -2.0, 0.0])
    np.testing.assert_array_equal(t.array[0], [3, 8])
    np.testing.assert_array_equal(t.array[1], [5, 11])
    # containment + relative coords
    assert crop.contains([[5, 10, 10]])[0]
    assert not crop.contains([[0, 0, 0]])[0]
    np.testing.assert_array_equal(
        generate_neighboring_crop([5, 10, 10], 6, (8, 32, 32)).array,
        crop.array)


def test_check_picked_spots_drops_outlier():
    rng = np.random.default_rng(0)
    n = 30
    trace = np.zeros((n, 11), np.float32)
    steps = rng.normal(0, 300 / np.sqrt(3), (n, 3))
    zxys = np.array([2000, 5000, 5000]) + np.cumsum(steps, axis=0)
    trace[:, 1:4] = zxys / [200.0, 108.0, 108.0]
    trace[:, 0] = rng.uniform(900, 1500, n)
    # corrupt one pick: flung 40 um away
    trace[7, 1:4] += [0, 300, 300]
    valid = np.ones(n, bool)
    keep, scores = check_picked_spots(jnp.asarray(trace),
                                      jnp.asarray(valid))
    keep = np.asarray(keep)
    assert not keep[7]
    assert keep.sum() >= n - 6   # the outlier pollutes neighbors' local scores


def test_filter_candidate_spots_bounds():
    spots = np.zeros((3, 11))
    spots[:, 0] = [1000, 100, 1000]       # heights
    spots[:, 4] = [150, 150, 150]         # background
    spots[:, 5] = [1.5, 1.5, 5.0]         # sigma_z
    spots[:, 6] = [1.5, 1.5, 1.5]
    spots[:, 7] = [1.5, 1.5, 1.5]
    keep = filter_candidate_spots(spots)
    assert list(keep) == [True, False, False]


def test_reconstruct_spot_image_peaks_and_widths():
    """reconstruct_spot_image renders each spot's own Gaussian (QC render,
    visual_tools.py:3331-3348)."""
    from imageanalysis3_tpu.spots import reconstruct_spot_image
    spots = np.zeros((2, 11))
    spots[0, :8] = [200, 5, 10, 12, 0, 1.2, 1.8, 1.8]
    spots[1, :8] = [80, 10, 22, 6, 0, 1.0, 1.4, 1.4]
    im = reconstruct_spot_image(spots, (16, 32, 32), use_intensity=True)
    assert im.shape == (16, 32, 32)
    assert np.unravel_index(im.argmax(), im.shape) == (5, 10, 12)
    assert abs(im[5, 10, 12] - 200) < 2.0
    assert abs(im[10, 22, 6] - 80) < 1.0
    # width check: one sigma_x away along x drops by exp(-0.5)
    expect = 200 * np.exp(-0.5 * (2 / 1.8) ** 2)
    assert abs(im[5, 12, 12] - expect) < 2.0
    # unit-height mode + shared stds
    im2 = reconstruct_spot_image(spots, (16, 32, 32), use_stds=False,
                                 given_stds=(1.0, 1.0, 1.0))
    assert abs(im2[5, 10, 12] - 1.0) < 0.05
    # empty input renders background only
    bg = reconstruct_spot_image(np.zeros((0, 11)), (4, 4, 4),
                                background=7.0)
    assert np.all(bg == 7.0)
