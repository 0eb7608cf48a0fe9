"""Pallas fused seeding stencil: exact parity with the XLA path
(interpret mode on the CPU test mesh; compiled-mode parity verified on
the v5e chip — see ops/pallas_kernels.py docstring)."""

import numpy as np
import pytest
import jax.numpy as jnp

from imageanalysis3_tpu.ops.pallas_kernels import level_stencil_pallas
from imageanalysis3_tpu.ops.filters import (gaussian_filter, maximum_filter,
                                            minimum_filter)


def test_level_stencil_matches_unfused():
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 3000, (8, 64, 256)).astype(np.float32)
    max_im = np.asarray(gaussian_filter(jnp.asarray(im), 0.75))
    min_im = np.asarray(gaussian_filter(jnp.asarray(im), 7.5))
    lvl, diff, counts = level_stencil_pallas(
        jnp.asarray(max_im), jnp.asarray(min_im), 300.0, 10,
        interpret=True)

    max_ft = np.asarray(maximum_filter(jnp.asarray(max_im), 3)) == max_im
    min_ft = np.asarray(minimum_filter(jnp.asarray(min_im), 3)) != min_im
    local_max = max_ft & min_ft
    d_ref = max_im - min_im
    zi = np.arange(8)[:, None, None]
    xi = np.arange(64)[None, :, None]
    yi = np.arange(256)[None, None, :]
    edge_ok = ((zi >= 2) & (zi <= 6) & (xi >= 2) & (xi <= 62)
               & (yi >= 2) & (yi <= 254))
    qualify = local_max & edge_ok
    lvl_ref = np.clip(np.ceil((1 - d_ref / 300.0) * 10).astype(np.int32),
                      0, 10)
    lvl_ref = np.where(qualify, lvl_ref, 10)

    np.testing.assert_array_equal(np.asarray(lvl), lvl_ref)
    np.testing.assert_allclose(np.asarray(diff), d_ref, rtol=1e-6)
    want_counts = [int((lvl_ref == k).sum()) for k in range(10)]
    np.testing.assert_array_equal(np.asarray(counts), want_counts)


def test_dual_gaussian_blur_parity_interpret():
    """Fused dual-blur kernel (interpret mode) matches the XLA
    gaussian_filter to float32 tolerance, reflect boundaries included."""
    import numpy as np
    import jax.numpy as jnp

    from imageanalysis3_tpu.ops.filters import gaussian_filter
    from imageanalysis3_tpu.ops.pallas_kernels import dual_gaussian_blur

    rng = np.random.default_rng(0)
    im = rng.uniform(0, 1000, (4, 128, 256)).astype(np.float32)
    fg, bg = dual_gaussian_blur(jnp.asarray(im), 0.75, 7.5,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(fg),
                               np.asarray(gaussian_filter(
                                   jnp.asarray(im), 0.75)),
                               rtol=2e-5, atol=2e-2)
    np.testing.assert_allclose(np.asarray(bg),
                               np.asarray(gaussian_filter(
                                   jnp.asarray(im), 7.5)),
                               rtol=2e-5, atol=2e-2)


def test_fused_seed_classify_parity_interpret():
    """Fully fused blur+stencil classifier (interpret mode) matches the
    unfused XLA qualified-signal pass: identical qualification and
    signal values up to f32 summation-order ties at stencil boundaries
    (< 1e-5 of voxels)."""
    from imageanalysis3_tpu.ops import seeding
    from imageanalysis3_tpu.ops.pallas_kernels import fused_seed_classify

    rng = np.random.default_rng(7)
    im = jnp.asarray(rng.integers(50, 3000, (12, 64, 256))
                     .astype(np.float32))
    shape = (12, 64, 256)
    q0, c0 = seeding._level_diff_hist(
        im, 300.0, 0, shape[1], shape, 0.75, 7.5, 3, 2, 10)
    q1, c1 = fused_seed_classify(
        im, 0.75, 7.5, 300.0, 10, min_edge_distance=2, interpret=True)
    q0, q1 = np.asarray(q0), np.asarray(q1)
    same_qual = np.isfinite(q0) == np.isfinite(q1)
    assert same_qual.mean() > 1 - 1e-5
    both = np.isfinite(q0) & np.isfinite(q1)
    np.testing.assert_allclose(q1[both], q0[both], rtol=1e-4, atol=0.05)
    assert abs(int(np.asarray(c1).sum()) - int(np.asarray(c0).sum())) <= 2


def test_pyramid_classify_matches_exact_on_planted_spots():
    """Pyramid-background classifier (interpret mode): the SELECTED seed
    set (qualified voxels at or above threshold) is identical to the
    exact fused path on planted-spot stacks, and the signal values agree
    within the documented ~1.2% background-approximation bound."""
    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.ops.pallas_kernels import (
        fused_seed_classify, fused_seed_classify_pyramid)

    shape = (12, 256, 256)
    rng = np.random.default_rng(0)
    truth = syn.sample_spot_params(shape, 40, rng, min_separation=8.0,
                                   height_range=(400.0, 3000.0),
                                   sigma_jitter=0.0)
    base = syn.render_spots_device(shape, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    im = jnp.asarray(np.asarray(syn.noisy_uint16_device(base, seed=1))
                     .astype(np.float32))
    q_e, c_e = fused_seed_classify(im, 0.75, 7.5, 300.0, 10,
                                   min_edge_distance=2, interpret=True)
    q_p, c_p = fused_seed_classify_pyramid(im, 0.75, 7.5, 300.0, 10,
                                           min_edge_distance=2,
                                           interpret=True)
    q_e, q_p = np.asarray(q_e), np.asarray(q_p)
    sel_e = np.isfinite(q_e) & (q_e >= 300.0)
    sel_p = np.isfinite(q_p) & (q_p >= 300.0)
    np.testing.assert_array_equal(sel_e, sel_p)
    assert sel_e.sum() >= 35                       # the planted spots
    np.testing.assert_allclose(q_p[sel_e], q_e[sel_e], rtol=0.02)
    np.testing.assert_array_equal(np.asarray(c_e), np.asarray(c_p))


def test_pyramid_classify_rejects_flat_plateau():
    """A flat (saturated-like) region produces no seeds through the
    pooled-cell plateau sentinel, mirroring the exact path's min-tie
    rejection of flat background."""
    from imageanalysis3_tpu.ops.pallas_kernels import (
        fused_seed_classify_pyramid)

    im = jnp.full((8, 64, 256), 800.0, jnp.float32)   # perfectly flat
    q, counts = fused_seed_classify_pyramid(im, 0.75, 7.5, 10.0, 10,
                                            min_edge_distance=2,
                                            interpret=True)
    assert int(np.asarray(counts).sum()) == 0
    assert not np.isfinite(np.asarray(q)).any() or \
        (np.asarray(q)[np.isfinite(np.asarray(q))] < -1e6).all()


def test_get_seeds_pyramid_matches_default_on_planted_spots():
    """get_seeds(pyramid_bg=True) recovers the same planted seed centers
    as the default path (CPU interpret backends never take the fused
    gates, so this exercises the classifier equivalence end-to-end
    through the public entry via the unfused reference path)."""
    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.ops.seeding import get_seeds

    shape = (12, 256, 256)
    rng = np.random.default_rng(3)
    truth = syn.sample_spot_params(shape, 30, rng, min_separation=10.0,
                                   height_range=(500.0, 3000.0),
                                   sigma_jitter=0.0)
    base = syn.render_spots_device(shape, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    im = jnp.asarray(np.asarray(syn.noisy_uint16_device(base, seed=2))
                     .astype(np.float32))
    s0 = get_seeds(im, max_num_seeds=64, th_seed=300.0)
    s1 = get_seeds(im, max_num_seeds=64, th_seed=300.0, pyramid_bg=True)
    c0 = np.asarray(s0.coords)[np.asarray(s0.valid)]
    c1 = np.asarray(s1.coords)[np.asarray(s1.valid)]
    assert len(c0) == len(c1)
    np.testing.assert_array_equal(np.sort(c0, axis=0), np.sort(c1, axis=0))


@pytest.mark.parametrize("shape", [(8, 128, 128), (8, 64, 256),
                                   (6, 32, 384)])
def test_pyramid_classify_buffer_alignment_shapes(shape):
    """The pooled-background buffer width (ys/4 + 128 rounded up to a 128
    multiple) must keep selections identical to the exact path at every
    128-multiple y — not just y % 512 == 0 (the Mosaic DMA tiling
    regression behind the y=160-slice compile failure)."""
    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.ops.pallas_kernels import (
        fused_seed_classify, fused_seed_classify_pyramid)

    rng = np.random.default_rng(5)
    im, _ = syn.random_spot_field(shape, 10, rng)
    im = jnp.asarray(im.astype(np.float32))
    q_e, _ = fused_seed_classify(im, 0.75, 7.5, 300.0, 8,
                                 min_edge_distance=2, interpret=True)
    q_p, _ = fused_seed_classify_pyramid(im, 0.75, 7.5, 300.0, 8,
                                         min_edge_distance=2,
                                         interpret=True)
    sel_e = np.isfinite(np.asarray(q_e)) & (np.asarray(q_e) >= 300.0)
    sel_p = np.isfinite(np.asarray(q_p)) & (np.asarray(q_p) >= 300.0)
    np.testing.assert_array_equal(sel_e, sel_p)


def test_lm_fit_pallas_matches_xla_engine():
    """Fused LM kernel (interpret mode): same constrained params, centers
    and validity as the vmapped XLA engine through the full
    iter_fit_seed_points pipeline (round-0 + Jacobi rounds)."""
    import jax.numpy as jnp
    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.ops import gaussian_fit as gf

    shape = (24, 96, 128)
    rng = np.random.default_rng(0)
    truth = syn.sample_spot_params(shape, 24, rng, min_separation=7.0)
    base = syn.render_spots_device(shape, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    im = jnp.asarray(np.asarray(syn.noisy_uint16_device(base, seed=3)),
                     jnp.float32)
    seeds = jnp.asarray(truth["centers"].round(), jnp.float32)
    valid = jnp.ones(seeds.shape[0], bool)

    r_x = gf.iter_fit_seed_points(im, seeds, valid, lm_iters=8,
                                  n_max_iter=3, lm_backend="xla")
    r_p = gf.iter_fit_seed_points(im, seeds, valid, lm_iters=8,
                                  n_max_iter=3,
                                  lm_backend="pallas_interpret")
    vx = np.asarray(r_x.valid)
    np.testing.assert_array_equal(vx, np.asarray(r_p.valid))
    sx = np.asarray(r_x.spots)[vx]
    sp = np.asarray(r_p.spots)[vx]
    # centers: transcendental-op differences only (~1e-5 px)
    np.testing.assert_allclose(sp[:, 1:4], sx[:, 1:4], atol=1e-3)
    # heights/widths: relative
    np.testing.assert_allclose(sp[:, 0], sx[:, 0], rtol=1e-2)
    np.testing.assert_allclose(sp[:, 5:8], sx[:, 5:8], atol=1e-3)


def test_lm_fit_pallas_padding_lanes():
    """N not a multiple of the 128-lane block and invalid seeds: padded
    and masked spots stay finite and do not perturb real fits."""
    import jax.numpy as jnp
    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.ops import gaussian_fit as gf

    shape = (16, 64, 128)
    rng = np.random.default_rng(1)
    truth = syn.sample_spot_params(shape, 5, rng, min_separation=9.0)
    base = syn.render_spots_device(shape, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    im = jnp.asarray(np.asarray(syn.noisy_uint16_device(base, seed=2)),
                     jnp.float32)
    seeds = jnp.asarray(truth["centers"].round(), jnp.float32)
    valid = jnp.asarray([True, True, True, True, False])

    res = gf.iter_fit_seed_points(im, seeds, valid, lm_iters=6,
                                  n_max_iter=2,
                                  lm_backend="pallas_interpret")
    v = np.asarray(res.valid)
    assert v[:4].all() and not v[4]
    assert np.isfinite(np.asarray(res.spots)[v]).all()
