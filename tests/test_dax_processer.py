"""DaxProcesser facade: stepwise corrections + ledger semantics
(reference classes/preprocess.py:337-1256)."""

import numpy as np
import pytest

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.io.dax import interleave_channels, write_dax
from imageanalysis3_tpu.pipeline.dax_processer import DaxProcesser


@pytest.fixture(scope="module")
def dax_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    shape = (10, 96, 96)
    stacks = []
    truths = []
    for c in range(2):
        im, t = syn.random_spot_field(shape, 8, rng, min_separation=12.0,
                                      height_range=(1500.0, 4000.0))
        stacks.append(np.clip(im, 0, 65535).astype(np.uint16))
        truths.append(t)
    movie = interleave_channels(stacks, buffer_frames=4)
    path = str(tmp_path_factory.mktemp("dax") / "Conv_zscan_01.dax")
    write_dax(path, movie)
    return path, shape, truths


def test_find_helpers(dax_file):
    path, shape, _ = dax_file
    meta = DaxProcesser._LoadInfFile(path)
    assert meta.number_frames == 4 + 10 * 2 + 4
    size = DaxProcesser._FindImageSize(path, 2, num_buffer_frames=4)
    assert size == shape
    chs = DaxProcesser._FindDaxChannels(path, single_im_size=shape,
                                        num_buffer_frames=4)
    assert len(chs) == 2


def test_stepwise_corrections_and_ledger(dax_file):
    path, shape, truths = dax_file
    dp = DaxProcesser(path, all_channels=["750", "647"],
                      single_im_size=shape, num_buffer_frames=4)
    dp._load_image()
    assert set(dp.ims) == {"750", "647"}
    assert dp.correction_log["750"]["load"]

    dp._corr_hot_pixels_3D()
    before = dp.ims["750"].copy()
    dp._corr_hot_pixels_3D()            # ledger: second call is a no-op
    np.testing.assert_array_equal(dp.ims["750"], before)

    prof = {"750": np.ones(shape[1:], np.float32) * 2.0}
    dp._corr_illumination(prof)
    np.testing.assert_allclose(dp.ims["750"], before / 2.0, rtol=1e-5)
    assert "illumination" not in dp.correction_log["647"] or \
        not dp.correction_log["647"].get("illumination")

    fits = dp._fit_spots(channels=["647"], th_seed=500.0, max_num_seeds=32)
    got = np.asarray(fits["647"].spots)[np.asarray(fits["647"].valid)]
    matched = sum(np.linalg.norm(got[:, 1:4] - c, axis=1).min() < 0.5
                  for c in truths[1]["centers"])
    assert matched >= 0.8 * len(truths[1]["centers"])


def test_drift_and_coord_correction(dax_file):
    path, shape, truths = dax_file
    dp = DaxProcesser(path, all_channels=["750", "647"],
                      single_im_size=shape, num_buffer_frames=4)
    dp._load_image()
    # drift vs a shifted copy of its own bead channel
    shift = np.array([0.0, 3.0, -2.0])
    ref = np.roll(np.roll(dp.ims["647"], 3, axis=1), -2, axis=2)
    drift = dp._calculate_drift(ref, drift_channel="647", drift_size=48)
    np.testing.assert_allclose(drift, shift, atol=0.2)
    corr = dp._correct_spot_coords(np.array([[5.0, 10.0, 10.0]]), "647")
    np.testing.assert_allclose(corr, [[5.0, 13.0, 8.0]], atol=0.2)


def test_batch_process_image_quick(dax_file, tmp_path):
    """Quick wrapper (reference batch_process_image_quick,
    classes/preprocess.py:1257+): load + hot-pixel + illumination via
    convention-named profiles in a correction folder."""
    from imageanalysis3_tpu.pipeline import batch_process_image_quick
    from imageanalysis3_tpu.io.profiles_io import save_correction_profile

    path, shape, _ = dax_file
    corr = str(tmp_path / "corrections")
    save_correction_profile("illumination",
                            {"750": np.full(shape[1:], 2.0, np.float32)},
                            corr, corr_channels=["750"], im_size=shape)
    ims = batch_process_image_quick(path, corr, ["750", "647"],
                                    verbose=True,
                                    all_channels=["750", "647"],
                                    single_im_size=shape,
                                    num_buffer_frames=4)
    assert set(ims) == {"750", "647"}
    assert ims["750"].shape == shape
    # profile for 750 halves its intensities relative to 647's scale
    raw = batch_process_image_quick(path, None, ["750"],
                                    corr_illumination=False,
                                    all_channels=["750", "647"],
                                    single_im_size=shape,
                                    num_buffer_frames=4)
    np.testing.assert_allclose(np.median(ims["750"]),
                               np.median(raw["750"]) / 2.0, rtol=0.05)
