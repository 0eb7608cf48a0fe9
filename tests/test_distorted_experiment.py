"""Distorted-experiment end-to-end: planted optics are undone through the
full profile-generation + driver chain, and the chromosome image is
generated from the experiment's own data.

Covers the reference chains:
  * Generate_illumination_correction   correction_tools/illumination.py:16-145
  * Generate_bleedthrough_correction   correction_tools/bleedthrough.py:353-520
  * Generate_chromatic_abbrevation     correction_tools/chromatic.py:119+
  * correct_fov_image full chain       io_tools/load.py:166-521
  * chromosome image generation        classes/field_of_view.py:1716-1935
  * identify_chromosomes               segmentation_tools/chromosome.py:409-486

Unlike test_experiment.py's identity-profile wiring test, every distortion
here is real: the .dax files carry vignetting, channel bleed, and a
chromatic shift field, and the profiles that undo them are regenerated from
the experiment's own calibration rounds — nothing is handed to the driver
from ground truth.
"""

import os

import numpy as np
import pytest

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                       FitConfig, DriftConfig,
                                       CorrectionConfig)
from imageanalysis3_tpu.io.dax import read_dax, split_channels
from imageanalysis3_tpu.io.store import FovStore
from imageanalysis3_tpu.pipeline.experiment import ExperimentDriver

SHAPE = (12, 128, 128)
CHANNELS = ("750", "647", "488")
CORR = ("750", "647")


def _planted_chromatic():
    """Small smooth order-2 shift field on channel '750' (about the image
    center, ops.warp monomial basis: 1, z, x, y, z2, zx, zy, x2, xy, y2)."""
    c = np.zeros((3, 10), np.float32)
    c[0, 0] = 0.20                    # constant z shift
    c[1, 0] = 0.30                    # constant x shift
    c[1, 2] = 0.004                   # linear in x
    c[2, 0] = -0.25                   # constant y shift
    c[2, 3] = 0.003                   # linear in y
    return c


@pytest.fixture(scope="module")
def distorted(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp_distorted")
    truth = syn.write_synthetic_experiment(
        str(root), shape=SHAPE, n_rounds=3, n_spots=10, seed=7,
        buffer_frames=4, channels=CHANNELS,
        illumination_falloff=0.35, bleed_leak=0.08,
        chromatic_constants={"750": _planted_chromatic()},
        corr_channels=CORR, calibration_rounds=True)
    return root, truth


def _read_round(folder, fov="Conv_zscan_00.dax"):
    movie, _ = read_dax(os.path.join(folder, fov))
    stacks = split_channels(movie, list(CHANNELS), list(CHANNELS),
                            n_z=SHAPE[0], buffer_frames=4)
    return np.stack(stacks)


def _generate_profiles(root, truth):
    """Regenerate all three profiles from the experiment's own rounds."""
    import jax.numpy as jnp

    from imageanalysis3_tpu.ops.corrections import bleedthrough_unmix
    from imageanalysis3_tpu.ops.profiles import (
        IlluminationProfiler, generate_bleed_profile_from_rounds,
        generate_chromatic_constants)

    # illumination: accumulate every data round per channel
    profs = {}
    for ci, ch in enumerate(CHANNELS):
        p = IlluminationProfiler(SHAPE[1:], smooth_sigma=8.0)
        for folder in truth["folders"]:
            p.add_stack(_read_round(folder)[ci])
        profs[ch] = p.finalize()

    # bleedthrough: one single-labeled calibration round per corr channel
    cal = [_read_round(truth["bleed_folders"][ch])[
        [CHANNELS.index(c) for c in CORR]] for ch in CORR]
    bleed = generate_bleed_profile_from_rounds(
        cal, th_seeds=[500.0, 500.0], rsq_th=0.5, min_spots=5)

    # chromatic: multi-color bead round, unmixed then flat-fielded first
    # (profiles are generated from *corrected* images in the reference)
    chromcal = _read_round(truth["chromatic_folder"])[
        [CHANNELS.index(c) for c in CORR]]
    unmixed = np.asarray(bleedthrough_unmix(jnp.asarray(chromcal),
                                            jnp.asarray(bleed)))
    flat = np.stack([unmixed[i] / profs[ch][None]
                     for i, ch in enumerate(CORR)])
    constants, n_pairs = generate_chromatic_constants(
        flat[CORR.index("750")], flat[CORR.index("647")],
        th_seed=500.0, max_num_seeds=64)
    assert n_pairs >= 8
    return profs, bleed, {"750": constants,
                          "647": np.zeros((3, 10), np.float32)}


@pytest.fixture(scope="module")
def processed(distorted, tmp_path_factory):
    root, truth = distorted
    profs, bleed, chrom = _generate_profiles(root, truth)

    # planted vs recovered chromatic: compare the *fields* at spot scale
    rng = np.random.default_rng(0)
    pts = rng.uniform([2, 8, 8], np.asarray(SHAPE) - [2, 8, 8], (64, 3))
    planted = syn._poly_shift_np(pts, _planted_chromatic(),
                                 np.asarray(SHAPE, np.float64) / 2)
    got = syn._poly_shift_np(pts, chrom["750"],
                             np.asarray(SHAPE, np.float64) / 2)
    assert np.median(np.linalg.norm(planted - got, axis=1)) < 0.05

    cfg = ExperimentConfig(
        image_size=SHAPE,
        corr_channels=CORR,
        correction=CorrectionConfig(illumination=True, hot_pixel=False,
                                    bleedthrough=True),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=4, lm_iters=20),
        num_buffer_frames=4)
    save = tmp_path_factory.mktemp("save_distorted")
    drv = ExperimentDriver(str(root), str(save), cfg=cfg,
                           illumination_profiles=profs,
                           bleed_profile=bleed,
                           chromatic_constants=chrom)
    counts = drv.process_fov("Conv_zscan_00.dax")
    assert counts["unique"] == 6
    return drv, truth


def test_distortions_undone_to_twentieth_pixel(processed):
    """Corrected spot coordinates land on truth (round-0 frame) to
    <= 0.05 px median despite planted vignetting + bleed + chromatic."""
    drv, truth = processed
    errs, n_truth = [], 0
    with FovStore(drv.store_path("Conv_zscan_00.dax"), "r") as store:
        for rid, info in truth["regions"].items():
            spots, _drift, flag = store.load_spots("unique", rid)
            assert flag == 2
            got = spots[:, 1:4]
            for c in info["centers"]:
                n_truth += 1
                d = np.linalg.norm(got - c, axis=1).min()
                if d < 1.0:
                    errs.append(d)
    assert len(errs) >= 0.9 * n_truth
    assert np.median(errs) <= 0.05


def test_chromosome_image_from_data_and_identify(processed):
    """The driver generates a chromosome image from its own processed
    region stacks (drift-aligned sum) and identifies candidate chromosome
    centers on it (reference _generate_chrom_im_from_data +
    identify_chromosomes)."""
    drv, truth = processed
    chrom_im = drv.generate_chromosome_image("Conv_zscan_00.dax")
    assert chrom_im.shape == SHAPE
    # all truth spots (round-0 frame) must be bright in the combined image
    bg = np.median(chrom_im)
    for info in truth["regions"].values():
        for c in info["centers"]:
            zi, xi, yi = np.round(c).astype(int)
            assert chrom_im[zi, xi, yi] > bg * 1.5

    # cached on second call (store signal group)
    again = drv.generate_chromosome_image("Conv_zscan_00.dax")
    np.testing.assert_allclose(again, chrom_im)

    coords, labels, counts = drv.identify_chromosomes(
        "Conv_zscan_00.dax", expected_per_nucleus=4)
    assert len(coords) == 4 and set(labels) == {1}
    # every candidate is a real spot of some region (within 1.5 px)
    all_truth = np.vstack([info["centers"]
                           for info in truth["regions"].values()])
    for c in coords:
        assert np.linalg.norm(all_truth - c, axis=1).min() < 1.5
    with FovStore(drv.store_path("Conv_zscan_00.dax"), "r") as store:
        assert store.load_signal("chrom_coords") is not None


def test_select_chromosomes_by_spots_keeps_supported(processed):
    """After identify_chromosomes, spot-support screening keeps all real
    candidates (every one is a planted spot with support in every round)
    and persists the screened set; a candidate that is forced to lose
    every round via an impossible intensity threshold is removed
    (reference _select_chromosome_by_candidate_spots; removal mechanics
    unit-tested in tests/test_segmentation.py)."""
    drv, truth = processed
    coords0, _, _ = drv.identify_chromosomes("Conv_zscan_00.dax",
                                             expected_per_nucleus=4)
    coords = drv.select_chromosomes_by_spots("Conv_zscan_00.dax",
                                             data_type="unique",
                                             cand_spot_intensity_th=0.2,
                                             good_chr_loss_th=0.5)
    assert len(coords) == len(coords0)       # all real candidates survive
    with FovStore(drv.store_path("Conv_zscan_00.dax"), "r") as store:
        np.testing.assert_allclose(store.load_signal("chrom_coords"),
                                   coords)
    # an impossible intensity threshold starves every candidate -> all
    # are removed (the degenerate all-lost case degrades cleanly)
    none = drv.select_chromosomes_by_spots("Conv_zscan_00.dax",
                                           cand_spot_intensity_th=1e9,
                                           good_chr_loss_th=0.5,
                                           save=False)
    assert len(none) == 0
