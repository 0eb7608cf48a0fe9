"""Center pairing / bead alignment / sequential drift accumulation.

Behavior targets: reference spot_tools/matching.py:148-287 and
correction_tools/alignment.py:139-216 (align_beads).
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.ops import matching as MT
from imageanalysis3_tpu import synthetic as syn


def _pad(a, n):
    out = np.zeros((n, 3), np.float32)
    out[:len(a)] = a
    v = np.zeros(n, bool)
    v[:len(a)] = True
    return out, v


def test_find_paired_centers_recovers_drift(rng):
    r = np.random.default_rng(5)
    ref = r.uniform(10, 100, size=(40, 3)).astype(np.float32)
    true_drift = np.array([1.2, -2.3, 0.7], np.float32)
    # tar = ref - drift (so tar + drift == ref) plus small noise
    tar = ref - true_drift + r.normal(0, 0.05, (40, 3)).astype(np.float32)
    tar_p, tar_v = _pad(tar, 64)
    ref_p, ref_v = _pad(ref, 64)
    pairs = MT.find_paired_centers(jnp.asarray(tar_p), jnp.asarray(tar_v),
                                   jnp.asarray(ref_p), jnp.asarray(ref_v),
                                   jnp.asarray(true_drift), cutoff=2.0)
    assert int(pairs.n_pairs) >= 35
    np.testing.assert_allclose(np.asarray(pairs.drift), true_drift,
                               atol=0.05)


def test_check_paired_centers_drops_outliers(rng):
    r = np.random.default_rng(6)
    ref = r.uniform(10, 100, size=(30, 3)).astype(np.float32)
    drift = np.array([2.0, 1.0, -1.0], np.float32)
    tar = ref - drift
    # corrupt three pairs with inconsistent shifts
    tar[3] += np.array([4, 4, 4])
    tar[11] -= np.array([5, 0, 3])
    tar[20] += np.array([0, 6, 0])
    tar_p, tar_v = _pad(tar, 32)
    ref_p, ref_v = _pad(ref, 32)
    pairs = MT.PairedCenters(
        drift=jnp.zeros(3), tar=jnp.asarray(tar_p), ref=jnp.asarray(ref_p),
        mask=jnp.asarray(tar_v), n_pairs=jnp.int32(30))
    checked = MT.check_paired_centers(pairs, outlier_sigma=1.5)
    kept = np.asarray(checked.mask)
    assert not kept[3] and not kept[11] and not kept[20]
    np.testing.assert_allclose(np.asarray(checked.drift), drift, atol=0.05)


def test_align_beads_on_sparse_bead_stacks():
    """Bead-match drift on a sparse field where the spots define the
    alignment (reference's robust path for sparse bead channels)."""
    r = np.random.default_rng(7)
    shape = (12, 96, 96)
    n = 12
    centers = r.uniform(12, 80, size=(n, 3)).astype(np.float32)
    centers[:, 0] = r.uniform(3, 9, n)
    disp = np.array([1.0, 3.3, -2.6], np.float32)
    heights = np.full(n, 3000.0)
    sigmas = np.tile([1.2, 1.6, 1.6], (n, 1))
    ref_im = syn.render_gaussian_spots(shape, centers, heights, sigmas,
                                       background=100.0)
    tar_im = syn.render_gaussian_spots(shape, centers + disp, heights,
                                       sigmas, background=100.0)
    tar_cts, tar_v = _pad(centers + disp, 16)
    ref_cts, ref_v = _pad(centers, 16)
    pairs = MT.align_beads(jnp.asarray(tar_cts), jnp.asarray(tar_v),
                           jnp.asarray(ref_cts), jnp.asarray(ref_v),
                           jnp.asarray(ref_im, dtype=jnp.float32) * 0
                           + jnp.asarray(tar_im, dtype=jnp.float32),
                           jnp.asarray(ref_im, dtype=jnp.float32),
                           match_distance_th=2.0)
    # drift satisfies tar + drift == ref  =>  drift == -disp
    np.testing.assert_allclose(np.asarray(pairs.drift), -disp, atol=0.1)
    assert int(pairs.n_pairs) >= n - 2


def test_accumulate_sequential_drifts():
    steps = jnp.asarray(np.array([[1, 0, 0], [0, 2, 0], [1, 1, 1]],
                                 np.float32))
    out = np.asarray(MT.accumulate_sequential_drifts(steps))
    np.testing.assert_allclose(out, [[0, 0, 0], [1, 0, 0], [1, 2, 0],
                                     [2, 3, 1]])


def test_fit_matched_centers():
    """Fit + unique pairing against reference anchors (reference
    fit_matched_centers, spot_tools/matching.py:89-147)."""
    rng = np.random.default_rng(8)
    shape = (10, 64, 64)
    centers = rng.uniform(10, 54, size=(8, 3)).astype(np.float32)
    centers[:, 0] = rng.uniform(3, 7, 8)
    im = syn.render_gaussian_spots(shape, centers, np.full(8, 3000.0),
                                   np.tile([1.2, 1.6, 1.6], (8, 1)),
                                   background=100.0).astype(np.float32)
    # anchors = true centers slightly offset
    anchors = centers + rng.normal(0, 0.2, centers.shape)
    pairs = MT.fit_matched_centers(im, anchors, match_distance_th=2.0,
                                   th_seed=500.0, max_num_seeds=32)
    assert int(pairs.n_pairs) >= 7
    # recovered shift ~ -mean offset (anchor = ref)
    assert np.linalg.norm(np.asarray(pairs.drift)) < 0.5
