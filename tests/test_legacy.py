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
    pop, n_used = cl._calculate_population_map()
    assert pop.shape == (4, 4)
    assert n_used >= 1
    assert np.isfinite(pop[np.triu_indices(4, 1)]).any()
    # mean and contact variants (reference _stat_type options, :1668-1677)
    mean_map, _ = cl._calculate_population_map(stat_type="mean")
    assert mean_map.shape == (4, 4)
    contact, _, all_maps = cl._calculate_population_map(
        stat_type="contact", contact_th=1e9, return_all_maps=True)
    off = contact[np.triu_indices(4, 1)]
    assert np.all(off[np.isfinite(off)] >= 0) and np.nanmax(off) <= 1
    # with an infinite threshold every measured pair is a contact
    assert np.nanmax(off) == 1.0
    assert all_maps.ndim == 3


def test_cell_data_rna_merge_and_crop(tmp_path):
    """RNA->DNA attribute merge (reference classes/__init__.py:4274-4327)
    and per-cell image crops (:2780-2962) against a stored experiment."""
    from imageanalysis3_tpu.io.store import FovStore

    root = tmp_path / "exp"
    syn.write_synthetic_experiment(str(root), shape=SHAPE, n_rounds=2,
                                   n_spots=8, seed=5, buffer_frames=4)
    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=False, hot_pixel=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=3, lm_iters=15),
        num_buffer_frames=4)
    cl = CellList(str(root), str(tmp_path / "save"), cfg=cfg,
                  save_images=True)
    cl._process_fovs()
    dna_cell = cl._create_cells("unique")[0]

    rna_cell = CellData({1: np.zeros((2, 11), np.float32)})
    rna_cell.gene_counts = {"GENE1": 3}
    added = dna_cell._merge_RNA_to_DNA(rna_cell)
    assert "rna-gene_counts" in added
    assert dna_cell.rna_gene_counts == {"GENE1": 3}
    assert dna_cell.rna_cand_spots[1].shape == (2, 11)

    # crops: whole-frame "cell" 1 with a tiny bounding mask
    seg = np.zeros(SHAPE, np.int32)
    seg[:, 40:80, 30:90] = 1
    fov = cl.driver.fovs[0]
    with FovStore(cl.driver.store_path(fov), "r") as store:
        crops = CellData._crop_images(store, "unique", seg, 1,
                                      extend_dim=4)
    assert len(crops) == 4
    im = next(iter(crops.values()))
    assert im.shape == (SHAPE[0], 80 - 40 + 8, 90 - 30 + 8)
