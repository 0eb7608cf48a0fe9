"""Golden tests: XLA filters vs scipy.ndimage reference implementations."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from imageanalysis3_tpu.ops import filters as F


@pytest.mark.parametrize("sigma,mode", [(0.75, "reflect"), (7.5, "reflect"),
                                        (3.0, "nearest"), (5.0, "nearest")])
def test_gaussian_filter_matches_scipy(rng, sigma, mode):
    im = rng.uniform(0, 1000, size=(8, 32, 40)).astype(np.float32)
    ours = np.asarray(F.gaussian_filter(im, sigma, truncate=4.0, mode=mode))
    ref = ndi.gaussian_filter(im.astype(np.float32), sigma, truncate=4.0,
                              mode=mode)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-2)


def test_gaussian_filter_wrap_mode_boundary_exact(rng):
    """mode='wrap' entries reach across the axis; the blocked-matmul path
    must not drop them (regression: 512-long axis takes the block path
    for other modes)."""
    im = rng.uniform(0, 1000, size=(2, 512, 16)).astype(np.float32)
    ours = np.asarray(F.gaussian_filter(im, 5.0, truncate=4.0, mode="wrap"))
    ref = ndi.gaussian_filter(im, 5.0, truncate=4.0, mode="wrap")
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-2)


def test_gaussian_filter_truncate2(rng):
    im = rng.uniform(0, 65535, size=(6, 24, 24)).astype(np.float32)
    ours = np.asarray(F.gaussian_filter(im, 3.0, truncate=2.0, mode="nearest"))
    ref = ndi.gaussian_filter(im, 3.0, truncate=2.0, mode="nearest")
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-1)


@pytest.mark.parametrize("size", [3, 5])
def test_max_min_filter_match_scipy(rng, size):
    im = rng.uniform(0, 1000, size=(6, 20, 22)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(F.maximum_filter(im, size)), ndi.maximum_filter(im, size))
    np.testing.assert_array_equal(
        np.asarray(F.minimum_filter(im, size)), ndi.minimum_filter(im, size))


def test_gaussian_highpass_semantics(rng):
    """High-pass zeroes pixels where the lowpass exceeds the image
    (reference correction_tools/filter.py:14-19)."""
    im = rng.uniform(0, 500, size=(6, 30, 30)).astype(np.float32)
    ours = np.asarray(F.gaussian_highpass(im, sigma=5.0, truncate=2.0))
    low = ndi.gaussian_filter(im, 5.0, mode="nearest", truncate=2.0)
    ref = im - low
    ref[low > im] = 0
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-1)
    assert (ours >= 0).all() == (ref >= 0).all()


def test_counting_median_exact_on_integers(rng):
    im = rng.integers(0, 65535, size=(7, 33, 35)).astype(np.float32)
    got = float(F.counting_median(im))
    # lower median for odd/even handled: counting_median returns
    # min{v: count(<=v) >= ceil(N/2)} which equals np.partition lower median
    n = im.size
    ref = np.sort(im.ravel())[(n + 1) // 2 - 1]
    assert got == ref


def test_counting_median_per_layer(rng):
    im = rng.integers(0, 4000, size=(5, 21, 19)).astype(np.float32)
    got = np.asarray(F.counting_median(im, axis=(1, 2)))
    n = im.shape[1] * im.shape[2]
    ref = np.sort(im.reshape(5, -1), axis=1)[:, (n + 1) // 2 - 1]
    np.testing.assert_array_equal(got, ref)


def test_counting_median_quarter_integers(rng):
    im = (rng.integers(0, 8000, size=(4, 17, 15)) / 4.0).astype(np.float32)
    got = float(F.counting_median(im))
    n = im.size
    ref = np.sort(im.ravel())[(n + 1) // 2 - 1]
    assert got == ref
