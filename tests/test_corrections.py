"""Correction kernels vs NumPy reference formulas."""

import numpy as np

from imageanalysis3_tpu.ops import corrections as C
from imageanalysis3_tpu import synthetic as syn


def _np_remove_hot_pixels(im, hot_pix_th=0.5, hot_th=4.0):
    """Intended reference semantics of corrections.py:490-510 (symmetric
    4-neighbor mean, functional replacement)."""
    imf = im.astype(np.float64)
    neigh = (np.roll(imf, 1, 1) + np.roll(imf, -1, 1)
             + np.roll(imf, 1, 2) + np.roll(imf, -1, 2)) / 4
    hot = (imf > hot_th * neigh).sum(0) > hot_pix_th * im.shape[0]
    out = imf.copy()
    zi, xi, yi = im.shape
    for x, y in zip(*np.where(hot)):
        if 0 < x < xi - 1 and 0 < y < yi - 1:
            out[:, x, y] = neigh[:, x, y]
    return out


def test_hot_pixel_removal(rng):
    im = rng.uniform(100, 200, size=(10, 32, 32)).astype(np.float32)
    # plant two isolated hot pixel columns
    im[:, 5, 7] = 5000.0
    im[:, 20, 11] = 9000.0
    got = np.asarray(C.remove_hot_pixels(im))
    ref = _np_remove_hot_pixels(im)
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    assert got[:, 5, 7].max() < 300


def test_hot_pixel_border_untouched(rng):
    im = rng.uniform(100, 200, size=(6, 16, 16)).astype(np.float32)
    im[:, 0, 4] = 9000.0
    got = np.asarray(C.remove_hot_pixels(im))
    np.testing.assert_array_equal(got[:, 0, 4], im[:, 0, 4])


def test_z_shift_correct(rng):
    im = rng.integers(50, 4000, size=(8, 40, 40)).astype(np.float32)
    # scale each layer differently
    scales = rng.uniform(0.5, 2.0, size=8).astype(np.float32)
    im = im * scales[:, None, None]
    im = np.round(im * 4) / 4  # quarter-integer grid for exact medians
    got = np.asarray(C.z_shift_correct(im))
    layer_med = np.sort(im.reshape(8, -1), 1)[:, (im[0].size + 1) // 2 - 1]
    glob = np.sort(im.ravel())[(im.size + 1) // 2 - 1]
    ref = im / layer_med[:, None, None] * glob
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # post-correction layer medians roughly equalized
    meds = np.median(got.reshape(8, -1), 1)
    assert meds.std() / meds.mean() < 0.02


def test_illumination_correct():
    prof = syn.illumination_profile((32, 32))
    im = np.full((4, 32, 32), 1000.0, np.float32) * prof[None]
    got = np.asarray(C.illumination_correct(im, prof))
    np.testing.assert_allclose(got, 1000.0, rtol=1e-5)


def test_bleedthrough_unmix(rng):
    true = rng.uniform(0, 3000, size=(3, 4, 16, 16)).astype(np.float32)
    mix = syn.bleed_matrix(3, leak=0.1, rng=rng)
    observed = np.einsum("ij,jzxy->izxy", mix, true).astype(np.float32)
    inv = np.linalg.inv(mix)
    profile = np.broadcast_to(inv[:, :, None, None],
                              (3, 3, 16, 16)).astype(np.float32)
    got = np.asarray(C.bleedthrough_unmix(observed, profile))
    np.testing.assert_allclose(got, true, rtol=1e-3, atol=0.5)


def test_fused_pass_recovers_flat_field(rng):
    """Fused correction exactly inverts vignetting on noise-free data and
    interpolates a planted hot pixel."""
    clean, _ = syn.random_spot_field((8, 64, 64), 4,
                                     np.random.default_rng(3),
                                     min_separation=12.0)
    prof = np.stack([syn.illumination_profile((64, 64)) for _ in range(2)])
    ims = np.stack([clean, clean]).astype(np.float32) * prof[:, None]
    ims[:, :, 10, 50] = 40000.0  # hot pixel in all channels
    out = np.asarray(C.correct_channel_stack(
        ims.astype(np.float32), illumination_profile=prof,
        do_bleedthrough=False, z_shift=False))
    assert out[:, :, 10, 50].max() < 1000
    # away from the hot pixel, correction inverts the vignette exactly
    mask = np.ones((64, 64), bool)
    mask[9:12, 49:52] = False
    for c in range(2):
        np.testing.assert_allclose(out[c][:, mask],
                                   np.broadcast_to(clean, (8, 64, 64))[:, mask],
                                   rtol=2e-3, atol=0.5)


def test_counting_median_subsample_accuracy():
    """A row-strided sample's median stays close to the exact per-layer
    median on camera-like data, and subsample=1 is unchanged-exact."""
    import numpy as np
    import jax.numpy as jnp

    from imageanalysis3_tpu.ops.filters import (
        counting_median_layers_and_global)

    rng = np.random.default_rng(0)
    im = rng.normal(500.0, 40.0, (6, 256, 256)).astype(np.float32)
    im = np.clip(np.round(im * 4) / 4, 0, 65535)       # quarter-code grid
    exact_l, exact_g = counting_median_layers_and_global(jnp.asarray(im))
    np.testing.assert_allclose(np.asarray(exact_l),
                               np.median(im.reshape(6, -1), axis=1),
                               atol=0.25)
    sub_l, sub_g = counting_median_layers_and_global(jnp.asarray(im),
                                                     subsample=4)
    np.testing.assert_allclose(np.asarray(sub_l), np.asarray(exact_l),
                               atol=1.5)               # ~stat error at 4k samples
    assert abs(float(sub_g) - float(exact_g)) <= 1.5


def test_z_shift_subsample_normalization_close():
    import numpy as np
    import jax.numpy as jnp

    from imageanalysis3_tpu.ops.corrections import z_shift_correct

    rng = np.random.default_rng(1)
    im = rng.normal(600.0, 30.0, (4, 128, 128)).astype(np.float32)
    im[2] *= 1.2                                       # a bright layer
    out_exact = np.asarray(z_shift_correct(jnp.asarray(im)))
    out_sub = np.asarray(z_shift_correct(jnp.asarray(im),
                                         median_subsample=4))
    np.testing.assert_allclose(out_sub, out_exact, rtol=5e-3)


def test_sequential_channels_matches_vmap(rng):
    """sequential_channels=True (lax.map, the multi-channel HBM cap) is
    value-identical to the batched vmap form through the full chain."""
    ims = rng.uniform(0, 4000, size=(3, 6, 32, 32)).astype(np.uint16)
    mix = syn.bleed_matrix(3, leak=0.08, rng=rng)
    bleed = np.broadcast_to(np.linalg.inv(mix)[:, :, None, None],
                            (3, 3, 32, 32)).astype(np.float32)
    prof = np.stack([syn.illumination_profile((32, 32))
                     for _ in range(3)]).astype(np.float32)
    kw = dict(bleed_profile=bleed, illumination_profile=prof,
              do_highpass=True, highpass_sigma=2.0)
    a = np.asarray(C.correct_channel_stack(ims, sequential_channels=False,
                                           **kw))
    b = np.asarray(C.correct_channel_stack(ims, sequential_channels=True,
                                           **kw))
    np.testing.assert_array_equal(a, b)
