"""Legacy Cell_List / Cell_Data compatibility workflow
(reference classes/__init__.py:817-4513)."""

import numpy as np
import pytest

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                       FitConfig, DriftConfig,
                                       CorrectionConfig)
from imageanalysis3_tpu.legacy import CellData, CellList

SHAPE = (12, 128, 128)


def _cand_spots(rng, n_regions=20):
    steps = rng.normal(0, 300 / np.sqrt(3), (n_regions, 3))
    zxys = np.array([2000.0, 5000, 5000]) + np.cumsum(steps, axis=0)
    out = {}
    for r in range(n_regions):
        rows = np.zeros((3, 11), np.float32)
        rows[0, 0] = rng.uniform(900, 1500)
        rows[0, 1:4] = (zxys[r] + rng.normal(0, 30, 3)) / [200, 108, 108]
        for d in (1, 2):
            rows[d, 0] = rng.uniform(600, 2000)
            rows[d, 1:4] = (zxys.mean(0)
                            + rng.normal(0, 4000, 3)) / [200, 108, 108]
        out[r] = rows
    return out, zxys


def test_cell_data_pick_methods():
    rng = np.random.default_rng(0)
    cand, zxys = _cand_spots(rng)
    cell = CellData(cand)
    for method in ("EM", "dynamic", "naive"):
        traces = cell._pick_spots(method=method)
        assert len(traces) == 1 and traces[0].shape == (20, 11)
    # EM picks mostly the planted (slot-0) spots
    em_trace = cell._pick_spots(method="EM")[0]
    got = em_trace[:, 1:4] * [200.0, 108, 108]
    err = np.linalg.norm(got - zxys, axis=1)
    assert np.median(err) < 100.0
    dms = cell._generate_distance_map()
    assert dms[0].shape == (20, 20)


def test_cell_list_population_map(tmp_path):
    root = tmp_path / "exp"
    syn.write_synthetic_experiment(str(root), shape=SHAPE, n_rounds=2,
                                   n_spots=8, seed=3, buffer_frames=4)
    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=False, hot_pixel=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=3, lm_iters=15),
        num_buffer_frames=4)
    cl = CellList(str(root), str(tmp_path / "save"), cfg=cfg)
    counts = cl._process_fovs()
    assert counts["Conv_zscan_00.dax"]["unique"] == 4
    cells = cl._create_cells("unique")
    assert len(cells) == 1
    pop = cl._calculate_population_map()
    assert pop.shape == (4, 4)
    assert np.isfinite(pop[np.triu_indices(4, 1)]).any()
