"""Gaussian LM fitting: ground truth + parity with a scipy-leastsq
reference implementation of the same constrained model."""

import numpy as np
import pytest
from scipy.optimize import leastsq

from imageanalysis3_tpu.ops import gaussian_fit as G
from imageanalysis3_tpu.ops.seeding import get_seeds
from imageanalysis3_tpu import synthetic as syn


# ---------------------------------------------------------------------------
# CPU reference: the reference's constrained model (External/Fitting_v4.py
# :165-397) re-derived in NumPy and solved with MINPACK leastsq — the
# "CPU reference" the BASELINE 0.05 px tolerance is measured against.
# ---------------------------------------------------------------------------


def _np_model(params, coords, center_est, delta, min_w, max_w):
    bk, h = params[0], params[1]
    c = center_est + delta * np.tanh(-params[2:5] / 2.0)
    mn, mx = min_w ** 2, max_w ** 2
    ws = mn + (mx - mn) / (1.0 + np.exp(params[5:8]))
    p = np.tanh(-params[8] / 2.0)
    t = np.tanh(-params[9] / 2.0)
    s1, s2, s3 = 1 / ws[0], 1 / ws[1], 1 / ws[2]
    p2, t2 = p * p, t * t
    tc2, pc2 = 1 - t2, 1 - p2
    tc, pc = np.sqrt(tc2), np.sqrt(pc2)
    a11 = pc2 * tc2 * s1 + t2 * s2 + p2 * tc2 * s3
    a22 = pc2 * t2 * s1 + tc2 * s2 + p2 * t2 * s3
    a33 = p2 * s1 + pc2 * s3
    a12 = 2 * tc * t * (pc2 * s1 - s2 + p2 * s3)
    a13 = 2 * p * pc * tc * (s3 - s1)
    a23 = 2 * p * pc * t * (s3 - s1)
    d = coords - c[None]
    q = (a11 * d[:, 0] ** 2 + a22 * d[:, 1] ** 2 + a33 * d[:, 2] ** 2
         + a12 * d[:, 0] * d[:, 1] + a13 * d[:, 0] * d[:, 2]
         + a23 * d[:, 1] * d[:, 2])
    return np.exp(np.clip(bk, -70, 70)) + np.exp(h - 0.5 * q)


def _np_fit_single(pixels, coords, center_est, delta=1.0,
                   min_w=0.5, max_w=4.0, init_w=1.5):
    srt = np.sort(pixels)
    eps0 = np.exp(-10.0)
    bk = np.log(max(srt[:10].mean(), eps0))
    h = np.log(max(srt[-10:].mean(), eps0))
    wsq = init_w ** 2
    wg = np.log((max_w ** 2 - wsq) / (wsq - min_w ** 2))
    p0 = np.array([bk, h, 0, 0, 0, wg, wg, wg, 0, 0], np.float64)

    def res(p):
        return _np_model(p, coords, center_est, delta, min_w, max_w) - pixels

    pf, _ = leastsq(res, p0, maxfev=2000)
    c = center_est + delta * np.tanh(-pf[2:5] / 2.0)
    hn = np.exp(pf[1])
    bkn = np.exp(np.clip(pf[0], -70, 70))
    mn, mx = min_w ** 2, max_w ** 2
    ws = np.sqrt(mn + (mx - mn) / (1.0 + np.exp(pf[5:8])))
    return np.concatenate([[hn], c, [bkn], ws])


def _ball_pixels(im, seed, radius=5):
    offs = np.indices([2 * radius] * 3).reshape(3, -1).T - radius
    keep = (offs ** 2).sum(1) <= radius ** 2
    offs = offs[keep]
    pos = np.asarray(seed, int) + offs
    inb = ((pos >= 0) & (pos < np.array(im.shape))).all(1)
    pos = pos[inb]
    return im[pos[:, 0], pos[:, 1], pos[:, 2]].astype(np.float64), \
        pos.astype(np.float64)


def test_single_spot_vs_ground_truth():
    """Isolated noiseless spot: centroid within 0.01 px of truth."""
    center = np.array([7.3, 24.6, 25.2])
    im = syn.render_gaussian_spots((16, 48, 48), center[None],
                                   np.array([1500.0]),
                                   np.array([[1.35, 1.9, 1.9]]),
                                   background=120.0).astype(np.float32)
    seeds = get_seeds(im, th_seed=300.0, max_num_seeds=4)
    res = G.fit_fov_image(im, seeds=seeds)
    spots = np.asarray(res.spots)
    valid = np.asarray(res.valid)
    assert valid[0]
    got_c = spots[0, 1:4]
    np.testing.assert_allclose(got_c, center, atol=0.01)
    assert abs(spots[0, 0] - 1500.0) / 1500.0 < 0.02       # height
    assert abs(spots[0, 4] - 120.0) / 120.0 < 0.05          # background
    np.testing.assert_allclose(spots[0, 5:8], [1.35, 1.9, 1.9], atol=0.05)


def test_vs_scipy_leastsq_reference(rng):
    """Batched LM matches the MINPACK solution of the same model to
    <= 0.05 px per centroid (BASELINE tolerance) on noisy spots."""
    r = np.random.default_rng(17)
    im, truth = syn.random_spot_field((16, 96, 96), 10, r,
                                      min_separation=14.0,
                                      height_range=(500.0, 2500.0))
    im = syn.poisson_camera_noise(im, r).astype(np.float32)
    seeds = get_seeds(im, th_seed=300.0, max_num_seeds=16)
    n = int(seeds.count)
    res = G.fit_fov_image(im, seeds=seeds)
    spots = np.asarray(res.spots)
    for i in range(n):
        seed = np.asarray(seeds.coords[i])
        pix, pos = _ball_pixels(im, seed)
        ref = _np_fit_single(pix, pos, seed.astype(np.float64),
                             delta=2.5)
        got_c = spots[i, 1:4]
        d = np.abs(got_c - ref[1:4]).max()
        assert d <= 0.05, f"spot {i}: ours {got_c} vs scipy {ref[1:4]}"


def test_two_overlapping_spots_subtract_refit():
    """Two spots 6 px apart: the subtract-refit rounds recover both centers
    where naive independent fits would be biased."""
    c1 = np.array([8.0, 24.0, 21.0])
    c2 = np.array([8.0, 24.0, 27.0])
    im = syn.render_gaussian_spots(
        (16, 48, 48), np.stack([c1, c2]), np.array([2000.0, 1600.0]),
        np.array([[1.35, 1.9, 1.9]] * 2), background=100.0
    ).astype(np.float32)
    seeds = get_seeds(im, th_seed=300.0, max_num_seeds=8)
    assert int(seeds.count) == 2
    res = G.fit_fov_image(im, seeds=seeds)
    spots = np.asarray(res.spots)[np.asarray(res.valid)]
    got = spots[:, 1:4]
    d1 = np.linalg.norm(got - c1, axis=1).min()
    d2 = np.linalg.norm(got - c2, axis=1).min()
    assert d1 < 0.05 and d2 < 0.05, (got, c1, c2)


def test_boundary_seed_rejected():
    """A seed hugging the image border yields too few pixels / off-image
    center and is flagged invalid rather than crashing."""
    im = np.full((12, 40, 40), 100.0, np.float32)
    im[1, 1, 1] = 5000.0
    import jax.numpy as jnp
    res = G.iter_fit_seed_points(
        im, jnp.asarray([[1.0, 1.0, 1.0], [6.0, 20.0, 20.0]]),
        jnp.asarray([True, True]))
    valid = np.asarray(res.valid)
    spots = np.asarray(res.spots)
    assert np.isfinite(spots[valid]).all()


def test_fit_convergence_flag():
    c = np.array([[7.0, 20.0, 20.0]])
    im = syn.render_gaussian_spots((14, 40, 40), c, np.array([1000.0]),
                                   np.array([[1.4, 1.9, 1.9]]),
                                   background=100.0).astype(np.float32)
    seeds = get_seeds(im, th_seed=200.0, max_num_seeds=4)
    res = G.fit_fov_image(im, seeds=seeds)
    assert bool(np.asarray(res.converged)[0])
    assert int(res.n_rounds) <= 10


def test_isolated_spots_skip_jacobi_rounds():
    """A scene with one isolated spot and one contested pair: the isolated
    spot is final after round 0 (its wide-box fit equals a solo fit of the
    same image), n_contested counts only the pair, and all three centers
    stay accurate."""
    import jax.numpy as jnp

    c_iso = np.array([8.0, 12.0, 12.0])
    c1 = np.array([8.0, 36.0, 33.0])
    c2 = np.array([8.0, 36.0, 39.0])
    im = syn.render_gaussian_spots(
        (16, 48, 48), np.stack([c_iso, c1, c2]),
        np.array([2000.0, 1800.0, 1500.0]),
        np.array([[1.35, 1.9, 1.9]] * 3), background=100.0
    ).astype(np.float32)
    seeds = jnp.asarray(np.stack([c_iso, c1, c2]), jnp.float32)
    res = G.iter_fit_seed_points(im, seeds, jnp.ones(3, bool))
    assert int(res.n_contested) == 2
    conv = np.asarray(res.converged)
    assert conv[0], "isolated spot must be converged by construction"
    got = np.asarray(res.spots)[:, 1:4]
    for want, have in zip([c_iso, c1, c2], got):
        assert np.linalg.norm(want - have) < 0.05, (want, have)

    # the isolated spot's fit must equal fitting it alone in the scene
    # (no Jacobi round may have touched it)
    solo = G.iter_fit_seed_points(im, seeds[:1], jnp.ones(1, bool))
    np.testing.assert_allclose(np.asarray(res.spots)[0],
                               np.asarray(solo.spots)[0], rtol=1e-5,
                               atol=1e-5)


def test_gfit_fast_matches_reference_transliteration():
    """Moment fast-fit equals a NumPy transliteration of the reference
    gfit_fast (External/Fitting_v4.py:433-490) and localizes a synthetic
    Gaussian to ~0.1 px."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.ops.gaussian_fit import (gather_blocks,
                                                     gfit_fast)

    rng = np.random.default_rng(0)
    c = np.array([[6.3, 14.6, 17.2]])
    im = syn.render_gaussian_spots((12, 32, 32), c, [2000.0],
                                   np.array([[1.3, 1.8, 1.8]]), 100.0)
    imj = jnp.asarray(im, jnp.float32)
    px, co, mk = gather_blocks(imj, jnp.asarray(np.round(c), jnp.float32),
                               radius=5)
    got = np.asarray(gfit_fast(px[0], co[0], mk[0], reconstruct=True))

    # transliteration
    im_ = np.asarray(px[0])[np.asarray(mk[0])]
    X_ = np.asarray(co[0])[np.asarray(mk[0])].T
    nim = len(im_)
    bk = np.sort(im_)[int(nim * 0.1)]
    weights = np.clip(im_ - bk, 0, None)
    h = weights.max()
    wn = weights / weights.sum()
    zxy = (X_ * wn).sum(-1)
    X_c = X_.T - zxy
    cov = np.einsum("pi,pj,p->ij", X_c, X_c, wn)
    np.testing.assert_allclose(got[0], h, rtol=1e-5)
    np.testing.assert_allclose(got[1:4], zxy, rtol=1e-5)
    np.testing.assert_allclose(got[4], bk, rtol=1e-5)
    np.testing.assert_allclose(
        got[5:11], [cov[0, 0], cov[1, 1], cov[2, 2], cov[0, 1],
                    cov[0, 2], cov[1, 2]], rtol=1e-4, atol=1e-5)
    assert np.isfinite(got[11])
    assert np.linalg.norm(got[1:4] - c[0]) < 0.12


def test_analytic_jacobian_matches_linearize():
    """The closed-form J^T (r5 LM fast path, `_jt_analytic`) must match
    jax.linearize + 10 basis JVPs: exact math (f64 parity ~1e-14), so the
    f32 tolerance here is pure rounding headroom."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    P = 257
    coords = jnp.asarray(rng.integers(0, 20, (P, 3)).astype(np.float32))
    center_est = jnp.asarray([10.0, 10.0, 10.0])
    delta, min_w, max_w = 2.5, 0.5, 4.0
    pixels = jnp.asarray(rng.uniform(100, 3000, P).astype(np.float32))
    maskf = (rng.uniform(0, 1, P) > 0.2).astype(np.float32)
    maskf = jnp.asarray(maskf)
    for _ in range(4):
        params = jnp.asarray(
            rng.normal(0, 1.0, 10).astype(np.float32)
            + np.array([5.5, 7.0, 0, 0, 0, 0.3, 0.3, 0.3, 0, 0],
                       np.float32))

        def residual(p):
            f = G.gaussian_model(p, coords, center_est, delta,
                                 min_w, max_w)
            return (f - pixels) * maskf

        r0, f_jvp = jax.linearize(residual, params)
        Jt0 = jax.vmap(f_jvp)(jnp.eye(10) + 0.0 * params[None])
        Jt1, r1 = G._jt_analytic(params, pixels, coords, maskf,
                                 center_est, delta, min_w, max_w)
        scale = float(jnp.max(jnp.abs(Jt0))) + 1e-9
        assert float(jnp.max(jnp.abs(r0 - r1))) < 1e-2
        assert float(jnp.max(jnp.abs(Jt0 - Jt1))) / scale < 5e-3


def test_analytic_and_linearize_paths_same_fit():
    """End-to-end: both LM Jacobian paths converge to the same spots."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    shape = (24, 96, 96)
    truth = syn.sample_spot_params(shape, 12, rng, min_separation=8.0)
    base = syn.render_spots_device(shape, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    im = syn.noisy_uint16_device(base, seed=4).astype(jnp.float32)
    sd = get_seeds(im, max_num_seeds=32, th_seed=300.0)
    res = {}
    for an in (False, True):
        r = G.iter_fit_seed_points(im, sd.coords.astype(jnp.float32),
                                   sd.valid, lm_iters=8, n_max_iter=6,
                                   analytic_jac=an)
        v = np.asarray(r.valid)
        res[an] = np.asarray(r.spots)[v][:, 1:4]
    assert res[True].shape == res[False].shape
    # same optimum to well under the 0.02 px accuracy bar
    assert np.max(np.linalg.norm(res[True] - res[False], axis=1)) < 5e-3
