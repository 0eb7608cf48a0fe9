"""Warp ops vs scipy map_coordinates and the reference polynomial formulas."""

import itertools

import numpy as np
import pytest
import scipy.ndimage as ndi

from imageanalysis3_tpu.ops import warp as W
from imageanalysis3_tpu import synthetic as syn


def _np_polynomial_data(coords, max_order):
    """NumPy transliteration of the reference basis construction
    (correction_tools/chromatic.py:415-438) used as golden."""
    X = []
    for order in range(max_order + 1):
        for lst in itertools.combinations_with_replacement(coords.T, order):
            xi = np.ones(coords.shape[0])
            for v in lst:
                xi = xi * v
            X.append(xi)
    return np.array(X).T


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_polynomial_basis_matches_reference_order(rng, order):
    coords = rng.uniform(-5, 5, size=(17, 3))
    ours = np.asarray(W.polynomial_basis(coords.astype(np.float32), order))
    ref = _np_polynomial_data(coords, order)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_trilinear_matches_scipy_order1(rng):
    im = rng.uniform(0, 1000, size=(8, 24, 26)).astype(np.float32)
    coords = np.stack([
        rng.uniform(-2, 9, size=500),
        rng.uniform(-2, 25, size=500),
        rng.uniform(-2, 27, size=500),
    ]).astype(np.float32)
    ours = np.asarray(W.trilinear_map_coordinates(im, coords))
    ref = ndi.map_coordinates(im, coords, order=1, mode="nearest")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-2)


def test_warp_image_drift_only_matches_scipy(rng):
    im = rng.uniform(0, 1000, size=(6, 20, 22)).astype(np.float32)
    drift = np.array([0.7, -1.3, 2.4], np.float32)
    got = np.asarray(W.warp_image(im, drift))
    zz, xx, yy = np.meshgrid(*[np.arange(s, dtype=float) for s in im.shape],
                             indexing="ij")
    coords = np.stack([zz - drift[0], xx - drift[1], yy - drift[2]])
    ref = ndi.map_coordinates(im, coords.reshape(3, -1), order=1,
                              mode="nearest").reshape(im.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("drift", [(0.7, -1.3, 2.4), (-5.5, 3.25, -0.125),
                                   (0.0, 0.0, 0.0)])
def test_warp_image_drift_fast_path_matches_scipy(rng, drift):
    """The roll-blend constant-shift warp is exactly trilinear."""
    im = rng.uniform(0, 1000, size=(6, 20, 22)).astype(np.float32)
    d = np.array(drift, np.float32)
    got = np.asarray(W.warp_image_drift(im, d))
    zz, xx, yy = np.meshgrid(*[np.arange(s, dtype=float) for s in im.shape],
                             indexing="ij")
    ref = ndi.map_coordinates(
        im, np.stack([zz - d[0], xx - d[1], yy - d[2]]).reshape(3, -1),
        order=1, mode="nearest").reshape(im.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-2)


def test_fit_chromatic_constants_fov_scale(rng):
    """Preconditioned lstsq stays accurate at full-FOV coordinate scale
    (plain f32 lstsq is off by >1 px here)."""
    true_consts = np.zeros((3, 10), np.float32)
    true_consts[:, 0] = [0.3, -0.9, 1.1]
    true_consts[1, 2] = -8e-4
    true_consts[2, 3] = 6e-4
    true_consts[1, 4] = 3e-6
    center = np.array([15.0, 1024.0, 1024.0], np.float32)
    ref_pts = np.column_stack([
        rng.uniform(2, 28, 400), rng.uniform(40, 2008, 400),
        rng.uniform(40, 2008, 400)]).astype(np.float32)
    X = _np_polynomial_data(ref_pts - center, 2)
    tar_pts = (ref_pts + X @ true_consts.T).astype(np.float32)
    consts = W.fit_chromatic_constants(tar_pts, ref_pts, center)
    corr = np.asarray(W.warp_spot_coords(tar_pts, consts, center,
                                         np.zeros(3, np.float32)))
    np.testing.assert_allclose(corr, ref_pts, atol=0.02)


def test_warp_spot_coords_formula(rng):
    """corr = coords - poly_shift + drift (chromatic.py:93-104)."""
    coords = rng.uniform(5, 50, size=(40, 3)).astype(np.float32)
    consts = rng.normal(0, 0.01, size=(3, 10)).astype(np.float32)
    center = np.array([15.0, 1024.0, 1024.0], np.float32)
    drift = np.array([1.0, -2.0, 0.5], np.float32)
    got = np.asarray(W.warp_spot_coords(coords, consts, center, drift))
    X = _np_polynomial_data(coords - center, 2)
    shifts = X @ np.asarray(consts, np.float64).T
    ref = coords - shifts + drift
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_fit_then_apply_roundtrip(rng):
    """Fitting constants from simulated pairs then applying them recovers
    the reference-frame coordinates."""
    true_consts = np.zeros((3, 10), np.float32)
    true_consts[:, 0] = [0.4, -1.2, 0.9]            # constant offset
    true_consts[0, 1] = 2e-3                         # z depends on z
    true_consts[1, 2] = -1.5e-3                      # x depends on x
    true_consts[2, 3] = 1e-3                         # y depends on y
    true_consts[1, 4] = 2e-6                         # x ~ z^2
    center = np.array([8.0, 128.0, 128.0], np.float32)
    ref_pts = rng.uniform(0, 256, size=(200, 3)).astype(np.float32)
    ref_pts[:, 0] = rng.uniform(0, 16, size=200)
    X = _np_polynomial_data(ref_pts - center, 2)
    tar_pts = (ref_pts + X @ true_consts.T).astype(np.float32)
    consts = np.asarray(W.fit_chromatic_constants(tar_pts, ref_pts, center))
    # applying the fitted correction to the target points recovers refs
    corr = np.asarray(W.warp_spot_coords(tar_pts, consts, center,
                                         np.zeros(3, np.float32)))
    # shift evaluated at tar instead of ref: first-order approx, tol loose
    np.testing.assert_allclose(corr, ref_pts, atol=0.02)


def test_warp_image_inverts_known_shift():
    """Warping a drifted synthetic image restores the original within
    interpolation error."""
    rng = np.random.default_rng(9)
    im, _ = syn.random_spot_field((10, 64, 64), 10, rng, min_separation=8.0)
    im = im.astype(np.float32)
    drift = np.array([0.5, 1.25, -0.75], np.float32)
    # construct "drifted acquisition": sample original at coords + drift
    zz, xx, yy = np.meshgrid(*[np.arange(s, dtype=float) for s in im.shape],
                             indexing="ij")
    moved = ndi.map_coordinates(
        im, np.stack([zz + drift[0], xx + drift[1], yy + drift[2]]
                     ).reshape(3, -1), order=1, mode="nearest"
    ).reshape(im.shape).astype(np.float32)
    # convention: moved(x) = im(x + drift) means content shifted by -drift;
    # phase correlation returns +drift, and the pipeline warps with
    # coords - returned_drift, i.e. restored(x) = moved(x - drift) = im(x).
    restored = np.asarray(W.warp_image(moved, drift))
    # double trilinear resampling smooths sharp (sigma~1.4 px) peaks — that
    # loss is inherent to order-1 resampling, and scipy shows the identical
    # error; assert exact parity with scipy's restoration instead.
    restored_sp = ndi.map_coordinates(
        moved, np.stack([zz - drift[0], xx - drift[1], yy - drift[2]]
                        ).reshape(3, -1), order=1, mode="nearest"
    ).reshape(im.shape)
    np.testing.assert_allclose(restored, restored_sp, rtol=1e-5, atol=1e-2)
    inner = (slice(2, 8), slice(4, 60), slice(4, 60))
    corr = np.corrcoef(restored[inner].ravel(), im[inner].ravel())[0, 1]
    assert corr > 0.99
