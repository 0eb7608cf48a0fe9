"""Post-analysis statistics (analysis/postanalysis.py): hull-enclosure
bootstrap, genomic scaling, density-cloud scores.  Behavior targets in
reference postanalysis.py:158-713.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from imageanalysis3_tpu.analysis import (
    is_in_hull, bootstrap_spots_in_domain, bootstrap_regions_in_domain,
    region_genomic_scaling, score_from_density, local_maximum_in_density)


def _cube_corners(scale=10.0):
    g = np.array(np.meshgrid([0, 1], [0, 1], [0, 1],
                             indexing="ij")).reshape(3, -1).T
    return g.astype(np.float32) * scale


def test_is_in_hull_basic():
    pts = _cube_corners()
    assert is_in_hull(pts, np.array([5.0, 5.0, 5.0]))
    assert is_in_hull(pts, np.array([0.5, 0.5, 0.5]))
    assert not is_in_hull(pts, np.array([15.0, 5.0, 5.0]))
    assert not is_in_hull(pts, np.array([-1.0, -1.0, -1.0]))
    # boundary-ish interior point
    assert is_in_hull(pts, np.array([9.5, 5.0, 5.0]))


def test_is_in_hull_nan_self_and_degenerate():
    pts = _cube_corners()
    # NaN reference rows are dropped (reference :169-171)
    noisy = np.concatenate([pts, np.full((2, 3), np.nan)], axis=0)
    assert is_in_hull(noisy, np.array([5.0, 5.0, 5.0]))
    # remove_self: the query equal to a vertex is excluded from the
    # references, so a corner of a tetrahedron is NOT inside the
    # remaining triangle (reference :172-176)
    tet = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]],
                   np.float32)
    assert not is_in_hull(tet, tet[0], remove_self=True)
    assert is_in_hull(tet, tet[0] + 1.0, remove_self=True)
    # <= 3 usable points -> False (reference :179-181)
    assert not is_in_hull(pts[:3], np.array([1.0, 1.0, 1.0]))
    with pytest.raises(ValueError):
        is_in_hull(pts, pts)


def test_bootstrap_enclosure_probabilities():
    """A spot at the centroid of a tight domain cloud must score ~1;
    a far-away spot ~0; a NaN spot NaN (reference :190-330)."""
    rng = np.random.default_rng(3)
    n_chrom, n_reg = 4, 40
    dom_idx = np.arange(12)
    chroms = []
    for _ in range(n_chrom):
        z = rng.normal(0, 50.0, size=(n_reg, 3)).astype(np.float32)
        # domain points: a well-spread shell around the origin
        z[dom_idx] = rng.normal(0, 1.0, (len(dom_idx), 3)) \
            + 30.0 * rng.standard_normal((len(dom_idx), 3))
        chroms.append(z)
    inside = [np.zeros(3, np.float32) for _ in range(n_chrom)]
    outside = [np.full(3, 500.0, np.float32) for _ in range(n_chrom)]
    p_in = bootstrap_spots_in_domain(chroms, inside, dom_idx,
                                     p_bootstrap=0.6, n_iter=40)
    p_out = bootstrap_spots_in_domain(chroms, outside, dom_idx,
                                      p_bootstrap=0.6, n_iter=40)
    assert p_in.shape == (n_chrom,)
    assert np.all(p_in > 0.4), p_in         # centroid inside most draws
    assert np.all(p_out < 0.05), p_out
    # NaN spot -> NaN
    nan_spots = [np.full(3, np.nan, np.float32)] + inside[1:]
    p_nan = bootstrap_spots_in_domain(chroms, nan_spots, dom_idx,
                                      p_bootstrap=0.6, n_iter=10)
    assert np.isnan(p_nan[0]) and np.isfinite(p_nan[1:]).all()
    # region flavor: query = the region's own coordinate, removed from
    # the hull by remove_self
    probs = bootstrap_regions_in_domain(chroms, 0, dom_idx,
                                        p_bootstrap=0.6, n_iter=20)
    assert probs.shape == (n_chrom,) and np.isfinite(probs).all()
    with pytest.raises(ValueError):
        bootstrap_spots_in_domain(chroms, inside, dom_idx,
                                  p_bootstrap=1.5)
    with pytest.raises(ValueError):
        bootstrap_spots_in_domain(chroms, inside[:-1], dom_idx)


def test_region_genomic_scaling_recovers_exponent():
    """Coordinates laid out so physical distance = genomic^0.4 must
    regress to slope 0.4, r ~ 1 (reference :330-392)."""
    n = 30
    genomic_pos = np.arange(n) * 1e5 + 1e5
    gen_mat = np.abs(genomic_pos[:, None] - genomic_pos[None, :])
    phys = (genomic_pos ** 0.4)
    coords = np.stack([phys, np.zeros(n), np.zeros(n)], axis=1)
    # exact only for pairs where |a-b| relation holds; use a distance
    # map directly for the exact law
    dmap = np.abs(gen_mat) ** 0.4
    slope, intercept, r = region_genomic_scaling(dmap, np.arange(n),
                                                 gen_mat)
    assert abs(slope - 0.4) < 1e-6 and abs(r - 1.0) < 1e-9
    # (R, 3) coordinate input path + NaN tolerance
    dmap_nan = dmap.copy()
    dmap_nan[0, 1] = dmap_nan[1, 0] = np.nan
    s2, _, r2 = region_genomic_scaling(dmap_nan, np.arange(n), gen_mat)
    assert abs(s2 - 0.4) < 1e-6
    s3, _, _ = region_genomic_scaling(coords, np.arange(n), gen_mat)
    assert np.isfinite(s3)
    with pytest.raises(ValueError):
        region_genomic_scaling(dmap[:2, :2], [0, 1],
                               np.full((2, 2), np.nan))


def test_score_from_density():
    zz, xx, yy = np.meshgrid(*[np.arange(12)] * 3, indexing="ij")
    def blob(c):
        v = np.exp(-((zz - c[0]) ** 2 + (xx - c[1]) ** 2
                     + (yy - c[2]) ** 2) / 4.0).astype(np.float32)
        # density grids have compact support (zero off-cloud voxels)
        return np.where(v > 1e-2, v, 0.0).astype(np.float32)
    a = blob((3, 3, 3))
    b = blob((9, 9, 9))
    # disjoint clouds -> fully demixed
    assert float(score_from_density(jnp.asarray(a), jnp.asarray(b))) \
        == pytest.approx(1.0)
    # identical clouds -> 0
    assert float(score_from_density(jnp.asarray(a), jnp.asarray(a))) \
        == pytest.approx(0.0, abs=1e-6)
    # partial overlap in between
    s = float(score_from_density(jnp.asarray(a),
                                 jnp.asarray(np.roll(a, 2, axis=0))))
    assert 0.0 < s < 1.0


def test_local_maximum_in_density_finds_planted_bumps():
    shape = (16, 32, 32)
    zz, xx, yy = np.meshgrid(*[np.arange(s) for s in shape],
                             indexing="ij")
    d = np.zeros(shape, np.float32)
    truth = [(8, 8, 8), (8, 24, 24)]
    for cz, cx, cy in truth:
        d += np.exp(-((zz - cz) ** 2 + (xx - cx) ** 2 + (yy - cy) ** 2)
                    / (2 * 3.0 ** 2)).astype(np.float32)
    coords = local_maximum_in_density(d, seeding_window=5,
                                      intensity_ratio=0.25)
    assert len(coords) >= 2
    for c in truth:
        assert np.min(np.linalg.norm(coords - np.array(c), axis=1)) < 1.5
    # a dim bump below the intensity cut is rejected
    d2 = d + 0.05 * np.exp(
        -((zz - 3) ** 2 + (xx - 16) ** 2 + (yy - 5) ** 2) / 4.0
    ).astype(np.float32)
    coords2 = local_maximum_in_density(d2, seeding_window=5,
                                       intensity_ratio=0.25)
    assert np.min(np.linalg.norm(
        coords2 - np.array([3, 16, 5]), axis=1)) > 2.0


# ---------------------------------------------------------------------------
# Trace conditioning (domain_tools/__init__.py:5-57)
# ---------------------------------------------------------------------------


def test_nan_gaussian_filter_scipy_parity():
    from scipy.ndimage import gaussian_filter as sp_gauss
    from imageanalysis3_tpu.analysis import nan_gaussian_filter
    rng = np.random.default_rng(0)
    a = rng.normal(size=60)
    a[[5, 6, 30, 31, 32]] = np.nan
    # reference algorithm transliterated: blur zero-filled values and
    # the finite mask with the same reflect-mode kernel, take the ratio
    v = np.where(np.isnan(a), 0.0, a)
    w = np.where(np.isnan(a), 0.0, 1.0)
    want = sp_gauss(v, 2.0) / sp_gauss(w, 2.0)
    got = np.asarray(nan_gaussian_filter(a, 2.0))
    assert np.allclose(got, want, atol=1e-5)
    kept = np.asarray(nan_gaussian_filter(a, 2.0, keep_nan=True))
    assert np.isnan(kept[5]) and np.isfinite(kept[4])


def test_interp1dnan_fills_gaps():
    from imageanalysis3_tpu.analysis import interp1dnan
    a = np.array([np.nan, 1.0, np.nan, 3.0, np.nan])
    out = interp1dnan(a)
    assert np.allclose(out, [1.0, 1.0, 2.0, 3.0, 3.0])  # ends clamp
    assert np.isnan(interp1dnan(np.full(3, np.nan))).all()


def test_interpolate_chr_linear_and_extrapolated():
    from imageanalysis3_tpu.analysis import interpolate_chr
    n = 10
    truth = np.stack([np.linspace(0, 9, n),
                      np.linspace(5, -4, n),
                      np.full(n, 2.0)], axis=1)
    trace = truth.copy()
    trace[0] = np.nan          # needs extrapolation
    trace[4:6] = np.nan        # interior gap
    trace[9, 1] = np.nan       # partially-NaN row is NOT an anchor
    out = interpolate_chr(trace)
    assert np.allclose(out, truth, atol=1e-9)
    # all-NaN trace returned unchanged
    assert np.isnan(interpolate_chr(np.full((4, 3), np.nan))).all()


def test_interpolate_chr_gaussian_smooths_anchors():
    from imageanalysis3_tpu.analysis import interpolate_chr
    rng = np.random.default_rng(1)
    trace = np.cumsum(rng.normal(size=(40, 3)), axis=0)
    trace[10:13] = np.nan
    out = interpolate_chr(trace, gaussian=1.5)
    assert np.isfinite(out).all()
    # smoothing must reduce the second-difference roughness
    rough = lambda t: np.nanmean(np.abs(np.diff(t, 2, axis=0)))
    assert rough(out) < rough(trace)


def test_extract_sequences_splits_domains():
    from imageanalysis3_tpu.analysis import extract_sequences
    zxy = np.arange(30, dtype=float).reshape(10, 3)
    segs = extract_sequences(zxy, [0, 4, 7])
    assert [len(s) for s in segs] == [4, 3, 3]
    assert np.allclose(np.vstack(segs), zxy)


def test_normalize_center_spots():
    """Pixel->isotropic rescale, centering, variance normalization and
    PCA alignment (reference spot_tools/translating.py:12-93), across
    all three accepted row formats with NaN pass-through."""
    from imageanalysis3_tpu.analysis import normalize_center_spots

    rng = np.random.default_rng(0)
    d = rng.normal(0, 1, 3)
    d /= np.linalg.norm(d)
    pts = d[None] * rng.normal(0, 5, (50, 1)) + rng.normal(0, 0.5, (50, 3))

    out = normalize_center_spots(pts, scale_variance=True)
    assert abs(np.nanvar(out, axis=0).sum() - 1.0) < 1e-9
    v = np.nanvar(out, axis=0)
    assert v[0] > v[1] >= v[2]
    assert np.abs(np.nanmean(out, 0)).max() < 1e-9

    # hzxy format keeps intensity untouched
    hz = np.column_stack([np.full(50, 7.0), pts])
    out4 = normalize_center_spots(hz)
    np.testing.assert_array_equal(out4[:, 0], hz[:, 0])

    # 11-column rows: coords at 1:4 and widths at 5:8 get the
    # anisotropy rescale; NaN rows pass through the PCA untouched
    rows = np.zeros((6, 11))
    rows[:, 1:4] = pts[:6]
    rows[:, 5:8] = 2.0
    rows[3, 1:4] = np.nan
    out11, pca = normalize_center_spots(rows, return_pca=True)
    assert pca.shape == (3, 3)
    np.testing.assert_allclose(np.abs(np.linalg.det(pca)), 1.0,
                               rtol=1e-9)
    assert np.isnan(out11[3, 1:4]).all()
    keep = [0, 1, 2, 4, 5]
    assert np.isfinite(out11[keep][:, 1:4]).all()
    # width anisotropy rescale: wz scaled by z/xy pixel ratio
    np.testing.assert_allclose(out11[keep][:, 5], 2.0 * 200.0 / 108.0)
    np.testing.assert_allclose(out11[keep][:, 6], 2.0)
