"""Correction-profile generation: recover planted optics from synthetic data.

Behavior targets: reference correction_tools/{illumination,bleedthrough,
chromatic}.py generation workflows (see ops/profiles.py docstrings).
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.ops import profiles as PR
from imageanalysis3_tpu.ops.corrections import bleedthrough_unmix
from imageanalysis3_tpu.ops.gaussian_fit import (find_image_background,
                                                 fit_fov_image)
from imageanalysis3_tpu.ops.warp import warp_spot_coords
from imageanalysis3_tpu import synthetic as syn


def test_counting_quantile():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2000, size=(50, 50)).astype(np.float32)
    for q in (0.05, 0.5, 0.9):
        got = float(PR.counting_quantile(jnp.asarray(x), q))
        want = np.quantile(x, q, method="inverted_cdf")
        assert abs(got - want) <= 1.0, (q, got, want)


def test_illumination_profiler_recovers_vignette():
    rng = np.random.default_rng(1)
    shape = (8, 128, 128)
    prof_true = syn.illumination_profile(shape[1:], falloff=0.4)
    profiler = PR.IlluminationProfiler(shape[1:], smooth_sigma=12.0)
    for i in range(4):
        im, _ = syn.random_spot_field(shape, 6, rng,
                                      height_range=(500.0, 1500.0),
                                      background=400.0)
        raw = syn.poisson_camera_noise(im * prof_true[None], rng)
        profiler.add_stack(raw.astype(np.float32))
    prof = profiler.finalize()
    # compare shapes (normalized); interior only (smoothing bleeds edges)
    sl = slice(16, -16)
    got = prof[sl, sl] / prof[sl, sl].max()
    want = prof_true[sl, sl] / prof_true[sl, sl].max()
    assert np.abs(got - want).mean() < 0.05


def test_bleedthrough_profile_unmixes():
    rng = np.random.default_rng(2)
    shape = (10, 96, 96)
    # channel-0 spots and channel-1 spots, disjoint locations
    im0, _ = syn.random_spot_field(shape, 10, rng, min_separation=14.0,
                                   height_range=(2000.0, 4000.0),
                                   background=0.0)
    im1, _ = syn.random_spot_field(shape, 10, rng, min_separation=14.0,
                                   height_range=(2000.0, 4000.0),
                                   background=0.0)
    true = np.stack([im0, im1])
    mix = np.array([[1.0, 0.12], [0.08, 1.0]], np.float32)
    observed = np.einsum("ij,jzxy->izxy", mix, true) + 100.0
    prof = PR.generate_bleed_profile(
        [observed[0], observed[1]], th_seeds=[500.0, 500.0],
        rsq_th=0.5, min_spots=5)
    assert prof.shape == (2, 2) + shape[1:]
    unmixed = np.asarray(bleedthrough_unmix(jnp.asarray(observed),
                                            jnp.asarray(prof)))
    # the bleed of channel-0's brightest spot into channel 1 shrinks
    peak = np.unravel_index(np.argmax(im0), shape)
    before = observed[1][peak] - 100.0 - im1[peak]
    bg_after = np.median(unmixed[1])
    after = unmixed[1][peak] - bg_after - im1[peak]
    assert abs(after) < 0.25 * abs(before), (before, after)


def test_chromatic_constants_roundtrip():
    rng = np.random.default_rng(3)
    shape = (12, 128, 128)
    n = 30
    centers = rng.uniform(10, 118, size=(n, 3)).astype(np.float64)
    centers[:, 0] = rng.uniform(3, 9, n)
    ref_center = np.array(shape, np.float64) / 2

    # planted order-1 shift field: shift_d(z,x,y) over centered coords
    def true_shift(c):
        d = c - ref_center
        sz = 0.05 + 0.001 * d[1]
        sx = 0.3 + 0.004 * d[1] - 0.002 * d[2]
        sy = -0.2 + 0.003 * d[2]
        return np.array([sz, sx, sy])

    # convention (ops/warp.py): corrected = coords - shift(coords), so the
    # target channel sees spots displaced by +shift
    tar_centers = np.array([c + true_shift(c) for c in centers])
    heights = np.full(n, 3000.0)
    sigmas = np.tile([1.2, 1.6, 1.6], (n, 1))
    ref_im = syn.render_gaussian_spots(shape, centers, heights, sigmas,
                                       background=100.0)
    tar_im = syn.render_gaussian_spots(shape, tar_centers, heights, sigmas,
                                       background=100.0)
    constants, n_pairs = PR.generate_chromatic_constants(
        tar_im.astype(np.float32), ref_im.astype(np.float32),
        th_seed=400.0, max_num_seeds=64, match_cutoff=2.5)
    assert n_pairs >= 15
    corrected = np.asarray(warp_spot_coords(
        jnp.asarray(tar_centers, jnp.float32), jnp.asarray(constants),
        jnp.asarray(ref_center, jnp.float32), jnp.zeros(3)))
    err = np.linalg.norm(corrected - centers, axis=1)
    assert np.median(err) < 0.1, np.median(err)


def test_find_image_background():
    rng = np.random.default_rng(4)
    im, _ = syn.random_spot_field((10, 96, 96), 10, rng, background=150.0)
    im = syn.poisson_camera_noise(im, rng).astype(np.float32)
    back = float(find_image_background(jnp.asarray(im)))
    assert 120.0 <= back <= 180.0

    res = fit_fov_image(jnp.asarray(im), th_seed=300.0, max_num_seeds=32,
                        normalize_background=True)
    raw = fit_fov_image(jnp.asarray(im), th_seed=300.0, max_num_seeds=32)
    v = np.asarray(res.valid)
    np.testing.assert_allclose(np.asarray(res.spots[:, 0])[v],
                               np.asarray(raw.spots[:, 0])[v] / back,
                               rtol=1e-5)
