"""Nuclei segmentation + chromosome candidates on synthetic blobs.

Behavior targets: reference visual_tools.py:1092-1606 (DAPI watershed)
and segmentation_tools/chromosome.py:51-486.
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu import segmentation as SG
from imageanalysis3_tpu import synthetic as syn


def _nuclei_image(rng, shape=(12, 96, 96), centers=None):
    if centers is None:
        centers = np.array([[6, 24, 24], [6, 24, 70], [6, 70, 46]], float)
    heights = np.full(len(centers), 2000.0)
    sigmas = np.tile([3.0, 8.0, 8.0], (len(centers), 1))
    im = syn.render_gaussian_spots(shape, centers, heights, sigmas,
                                   background=80.0)
    return im.astype(np.float32), centers


def test_otsu_threshold_bimodal():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(100, 10, 4000),
                        rng.normal(1000, 50, 1000)]).astype(np.float32)
    th = float(SG.otsu_threshold(jnp.asarray(x.reshape(50, -1))))
    assert 200 < th < 900


def test_propagate_labels_splits_touching_regions():
    mask = np.zeros((4, 20, 20), bool)
    mask[:, 2:18, 2:18] = True
    seeds = np.zeros((4, 20, 20), np.int32)
    seeds[2, 10, 4] = 1
    seeds[2, 10, 15] = 2
    labels = np.asarray(SG.propagate_labels(jnp.asarray(seeds),
                                            jnp.asarray(mask),
                                            max_iters=64))
    assert labels[2, 10, 3] == 1
    assert labels[2, 10, 16] == 2
    # divide roughly in the middle
    assert labels[2, 10, 8] == 1 and labels[2, 10, 12] == 2
    assert (labels[~mask] == 0).all()


def test_segment_nuclei_labels_each_blob():
    rng = np.random.default_rng(1)
    im, centers = _nuclei_image(rng)
    labels, coords, valid = SG.segment_nuclei(
        jnp.asarray(im), smooth_sigma=2.0, seed_min_distance=15.0,
        max_num_nuclei=16, min_size_voxels=100, max_iters=64)
    labels = np.asarray(labels)
    got = {labels[tuple(np.round(c).astype(int))] for c in centers}
    assert len(got) == 3 and 0 not in got
    n_labels = len(np.unique(labels)) - 1
    assert n_labels == 3


def test_find_candidate_chromosomes():
    rng = np.random.default_rng(2)
    im, centers = _nuclei_image(rng)
    labels, _, _ = SG.segment_nuclei(
        jnp.asarray(im), smooth_sigma=2.0, seed_min_distance=15.0,
        max_num_nuclei=16, min_size_voxels=100, max_iters=64)
    # plant 2 chromosome puncta per nucleus
    offsets = np.array([[0, -4, -4], [0, 4, 4]], float)
    chrom_centers = np.concatenate([c + offsets for c in centers])
    chrom = syn.render_gaussian_spots(
        (12, 96, 96), chrom_centers, np.full(6, 3000.0),
        np.tile([1.2, 1.6, 1.6], (6, 1)), background=100.0)
    # decoys outside nuclei
    noise = syn.render_gaussian_spots(
        (12, 96, 96), np.array([[6, 5, 90.0]]), np.array([3000.0]),
        np.array([[1.2, 1.6, 1.6]]), background=0.0)
    coords, nuc_labels, counts = SG.find_candidate_chromosomes(
        jnp.asarray((chrom + noise).astype(np.float32)), labels,
        expected_per_nucleus=2, th_seed=800.0)
    assert sorted(counts.values()) == [2, 2, 2]
    for c in chrom_centers:
        d = np.linalg.norm(coords - c, axis=1).min()
        assert d < 2.0
