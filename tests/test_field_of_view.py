"""FieldOfView facade: dax folder -> spots -> picked trace -> distance map
(reference classes/field_of_view.py + legacy Cell_Data workflow)."""

import numpy as np
import pytest

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                       FitConfig, DriftConfig,
                                       CorrectionConfig)
from imageanalysis3_tpu.pipeline import FieldOfView

SHAPE = (12, 128, 128)


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp_fov")
    truth = syn.write_synthetic_experiment(
        str(root), shape=SHAPE, n_rounds=3, n_spots=10, seed=2,
        buffer_frames=4, channels=("750", "647", "488"))
    return root, truth


def test_field_of_view_end_to_end(experiment, tmp_path):
    root, truth = experiment
    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=False, hot_pixel=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=4, lm_iters=20),
        num_buffer_frames=4)
    fov = FieldOfView(str(root), str(tmp_path / "save"),
                      "Conv_zscan_00.dax", cfg=cfg)
    counts = fov.process_image_to_spots()
    assert counts["unique"] == 6

    cands = fov.load_candidate_spots("unique")
    assert len(cands) == 6
    drifts, dflags = fov.drifts("unique")
    assert drifts.shape == (6, 3)

    res = fov.pick_spots(method="EM", num_iters=5)
    trace = np.asarray(res.trace)
    assert trace.shape == (6, 11)
    # picked rows sit on real candidates (region truth has >= 1 spot)
    assert np.asarray(res.sel_valid).sum() >= 5

    dm = fov.distance_map(trace)
    assert dm.shape == (6, 6)
    assert np.isfinite(np.diagonal(dm)).all()

    # naive method also runs
    res2 = fov.pick_spots(method="naive")
    assert np.asarray(res2.sel_valid).sum() >= 5
