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


def test_cell_data_save_load_roundtrip(tmp_path):
    """_save_to_file / _load_from_file carry cand_spots, chrom_coords,
    picked traces and distance maps (reference cell_info checkpoint,
    classes/__init__.py:3012-3446)."""
    rng = np.random.default_rng(2)
    cand, _ = _cand_spots(rng)
    cell = CellData(cand, chrom_coords=[np.array([6.0, 60.0, 60.0])])
    cell._pick_spots(method="EM")
    cell._generate_distance_map()
    p = str(tmp_path / "cell0.npz")
    cell._save_to_file(p)
    back = CellData._load_from_file(p)
    assert set(back.cand_spots) == set(cand)
    np.testing.assert_array_equal(back.cand_spots[3], cand[3])
    np.testing.assert_array_equal(back.chrom_coords[0],
                                  cell.chrom_coords[0])
    np.testing.assert_array_equal(back.picked_traces[0],
                                  cell.picked_traces[0])
    np.testing.assert_array_equal(back.distance_maps[0],
                                  cell.distance_maps[0])


def test_cell_data_check_full_set_and_background():
    rng = np.random.default_rng(4)
    cand, _ = _cand_spots(rng, n_regions=6)
    cell = CellData(cand)
    assert cell._check_full_set(range(6))
    assert not cell._check_full_set(range(7))
    ims = {"750": [np.full((4, 8, 8), 100.0) + i for i in range(3)],
           "647": [np.full((4, 8, 8), 50.0)]}
    bg = CellData._calculate_background(ims, function_type="median")
    assert bg["750"] == pytest.approx(101.0)
    assert bg["647"] == pytest.approx(50.0)
    with pytest.raises(KeyError):
        CellData._calculate_background(ims, function_type="max")


def test_cell_data_identify_and_multifit():
    """_identify_chromosomes seeds the planted chromosome centers and
    _multi_fitting_for_chromosome fills cand_spots around them."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    shape = (12, 96, 96)
    chrom_centers = np.array([[6.0, 30.0, 30.0], [6.0, 70.0, 64.0]])
    base = syn.render_spots_device(
        shape, chrom_centers, np.array([3000.0, 2800.0]),
        background=100.0, sigma_zxy=(2.0, 4.0, 4.0))
    chrom_im = np.asarray(syn.noisy_uint16_device(base, seed=1),
                          np.float32)
    cell = CellData({})
    coords = cell._identify_chromosomes(chrom_im, th_seed=500.0,
                                        expected_per_nucleus=2)
    assert len(cell.chrom_coords) >= 2
    d = np.linalg.norm(coords[:, None] - chrom_centers[None], axis=2)
    assert (d.min(axis=0) < 3.0).all()

    # region image: one spot near each chromosome
    spot_centers = chrom_centers + [[0.0, 3.0, -2.0], [0.0, -3.0, 2.0]]
    im = np.asarray(syn.noisy_uint16_device(
        syn.render_spots_device(shape, spot_centers,
                                np.array([2500.0, 2500.0]),
                                background=100.0), seed=2), np.float32)
    out = cell._multi_fitting_for_chromosome({5: im}, fit_window=24,
                                             th_seed=400.0,
                                             max_seed_count=4)
    assert 5 in out and len(out[5]) >= 2
    dd = np.linalg.norm(out[5][:, None, 1:4]
                        - spot_centers[None], axis=2)
    assert (dd.min(axis=0) < 0.5).all()


def test_cell_list_intensity_stats_and_pval():
    """Intensity stats pool per region; p-value flags are the reference's
    ternary one-sided-sf flags (classes/__init__.py:2050-2070)."""
    rng = np.random.default_rng(9)
    cand, _ = _cand_spots(rng)

    class _FakeDriver:
        data_folder = save_folder = "."
        fovs = []

    cl = CellList.__new__(CellList)
    cl.driver = _FakeDriver()
    cl.cells = [CellData(cand)]
    stats = cl._get_intensity_stats()
    assert set(stats) == set(range(20))
    pooled = cand[0][:, 0]
    assert stats[0]["mean"] == pytest.approx(float(np.mean(pooled)))
    flags = cl._p_value_filter(pval_th=(1e-6, 0.01))
    f0 = flags[0][0]
    assert f0.dtype == np.int8 and set(np.unique(f0)) <= {-1, 0, 1}
    # a 10-sigma outlier must be flagged +1
    hot = dict(cand)
    hot[0] = hot[0].copy()
    hot[0][0, 0] = stats[0]["mean"] + 10 * stats[0]["std"]
    cl.cells = [CellData(hot)]
    flags = cl._p_value_filter(pval_th=(1e-6, 0.01),
                               ref_dist_params=stats)
    assert flags[0][0][0] == 1


def test_cell_data_domain_calling_and_batch():
    """Per-cell domain calling dispatches every analysis.domains variant
    on the picked trace (reference Cell_List._batch_domain_calling,
    classes/__init__.py:2218-2370)."""
    rng = np.random.default_rng(11)
    cand, _ = _cand_spots(rng, n_regions=24)
    cell = CellData(cand)
    cell._pick_spots(method="EM")
    starts = cell._domain_calling(method="basic")
    assert starts.ndim == 1 and starts[0] == 0
    with pytest.raises(ValueError):
        cell._domain_calling(method="nope")

    class _FakeDriver:
        data_folder = save_folder = "."
        fovs = []

    cl = CellList.__new__(CellList)
    cl.driver = _FakeDriver()
    cl.cells = [cell]
    batch = cl._batch_domain_calling(method="basic")
    np.testing.assert_array_equal(batch[0][0], starts)


def test_cell_list_save_load_cells(tmp_path):
    rng = np.random.default_rng(13)

    class _FakeDriver:
        data_folder = "."
        save_folder = str(tmp_path)
        fovs = []

    cl = CellList.__new__(CellList)
    cl.driver = _FakeDriver()
    cl.cells = [CellData(_cand_spots(rng)[0]) for _ in range(3)]
    paths = cl._save_cells_to_files()
    assert len(paths) == 3
    cl2 = CellList.__new__(CellList)
    cl2.driver = _FakeDriver()
    cells = cl2._load_cells_from_files()
    assert len(cells) == 3
    np.testing.assert_array_equal(cells[1].cand_spots[2],
                                  cl.cells[1].cand_spots[2])


def test_cell_list_segmented_cells_and_batch_loads(tmp_path):
    """Per-segmented-cell creation + the batch drift/segmentation/crop/
    chromosome loaders (reference _create_cells_fov :817-966,
    _load_drift :2708, _check_drift :2687, _load_segmentation :2593,
    _crop_image_for_cells :967, _update_chromosomes_for_cells :1373,
    _spot_finding_for_cells :1494)."""
    from imageanalysis3_tpu.io.store import FovStore

    root = tmp_path / "exp"
    syn.write_synthetic_experiment(str(root), shape=SHAPE, n_rounds=2,
                                   n_spots=8, seed=7, buffer_frames=4)
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
    fov = "Conv_zscan_00.dax"

    # two fake cells: y halves of the FOV
    labels = np.zeros(SHAPE, np.int32)
    labels[:, :, :64] = 1
    labels[:, :, 64:] = 2
    with FovStore(cl.driver.store_path(fov)) as store:
        store.save_segmentation(labels)
        total = sum(len(v) for v in store.load_all_spots("unique").values())

    cells = cl._create_cells_fov(fov)
    assert [c.cell_id for c in cells] == [1, 2]
    assert all(c.fov_name == fov for c in cells)
    # every stored spot lands in exactly one cell, on its own y side
    got = 0
    for cell in cells:
        for sp in cell.cand_spots.values():
            got += len(sp)
            if len(sp):
                y = sp[:, 3]
                assert np.all(y < 64) if cell.cell_id == 1 \
                    else np.all(y >= 64)
    assert got == total > 0

    # drift table + completeness check
    cl._load_drift()
    assert cells[0]._check_drift()
    assert cells[0].drifts.shape[1] == 3
    # a fresh cell with no table attached fails the check
    assert not CellData({}, fov_name=fov)._check_drift()

    # per-cell segmentation mask + crop
    cl._load_segmentation()
    seg, crop = cells[0].segmentation_label, cells[0].segmentation_crop
    assert seg.shape == SHAPE and set(np.unique(seg)) == {-1, 1}
    assert crop[1][0] == 0 and crop[1][1] <= 64 + 20

    # per-cell image crops from the stored corrected images
    crops = cl._crop_image_for_cells("unique")
    region = next(iter(crops[len(cl.cells) - 2].values()))
    assert region.shape[0] == SHAPE[0] and region.shape[2] <= 64 + 20

    # distribute manual chromosome picks; short list pads with empties
    cl._update_chromosomes_for_cells(
        [[] for _ in range(len(cl.cells) - 2)]
        + [[np.array([6.0, 64.0, 32.0])]])
    assert len(cells[0].chrom_coords) == 1
    assert cells[1].chrom_coords == []

    # batch multi-fit fills cand_spots for the cell with a chromosome
    cl._spot_finding_for_cells("unique", th_seed=400.0)
    assert set(cells[0].cand_spots) == {1, 2, 3, 4}
    with pytest.raises(ValueError):
        cl._update_chromosomes_for_cells(
            [[] for _ in range(len(cl.cells) + 1)])


def test_cell_list_dapi_image(tmp_path):
    """DAPI round loading: corrected + drift-aligned + store-cached
    (reference _load_dapi_image classes/__init__.py:2649-2686)."""
    import csv

    root = tmp_path / "exp"
    syn.write_synthetic_experiment(str(root), shape=SHAPE, n_rounds=2,
                                   n_spots=8, seed=9, buffer_frames=4)
    # mark round 1 / channel 0 as the DAPI round in Color_Usage
    cu = root / "Color_Usage.csv"
    rows = list(csv.reader(open(cu)))
    rows[2][1] = "DAPI"
    with open(cu, "w", newline="") as fh:
        csv.writer(fh).writerows(rows)

    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=False, hot_pixel=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=3, lm_iters=15),
        num_buffer_frames=4)
    cl = CellList(str(root), str(tmp_path / "save"), cfg=cfg)
    cl._process_fovs()
    cl._create_cells("unique")
    ims = cl._load_dapi_image()
    fov = "Conv_zscan_00.dax"
    assert ims[fov].shape == SHAPE
    assert cl.cells[0].dapi_im is ims[fov]
    # cached in the signal group: a second load round-trips the store
    from imageanalysis3_tpu.io.store import FovStore
    with FovStore(cl.driver.store_path(fov), "r") as store:
        cached = store.load_signal("dapi_im")
    np.testing.assert_allclose(cached, ims[fov], atol=0.5)


def test_cell_list_translate_old_segmentations(tmp_path):
    """Old-experiment labels carry over through rotation + FFT-recovered
    residual drift in one nearest-neighbor warp (reference
    _translate_old_segmentations classes/__init__.py:663-787 ->
    visual_tools.translate_segmentation)."""
    import jax.numpy as jnp

    from imageanalysis3_tpu.analysis.partition import (
        translate_label_image, translate_volume)

    rng = np.random.default_rng(21)
    z, x, y = 8, 96, 96
    # old experiment: blobby nuclei labels + DAPI as smoothed labels
    labels = np.zeros((z, x, y), np.int32)
    for lid, (cx, cy) in enumerate([(30, 30), (64, 60), (40, 72)], 1):
        zz, xx, yy = np.indices((z, x, y))
        r2 = ((xx - cx) ** 2 + (yy - cy) ** 2) / 10.0 ** 2 \
            + ((zz - z / 2) ** 2) / 3.0 ** 2
        labels[r2 < 1.0] = lid
    dapi = (labels > 0).astype(np.float32) * 800.0 \
        + rng.normal(0, 5.0, (z, x, y)).astype(np.float32)

    # ground-truth transform into the "new" experiment's frame
    th = np.deg2rad(3.0)
    rot = np.array([[np.cos(th), -np.sin(th)],
                    [np.sin(th), np.cos(th)]], np.float32)
    true_drift = np.array([1.0, 2.5, -3.5], np.float32)
    new_labels = np.asarray(translate_label_image(
        jnp.asarray(labels), jnp.asarray(rot), jnp.asarray(true_drift)))
    new_dapi = np.asarray(translate_volume(
        jnp.asarray(dapi), jnp.asarray(rot), jnp.asarray(true_drift)))

    old_seg = tmp_path / "old_seg"
    old_dapi_dir = tmp_path / "old_dapi"
    old_seg.mkdir()
    old_dapi_dir.mkdir()
    fov = "Conv_zscan_00.dax"
    np.save(old_seg / "Conv_zscan_00_segmentation.npy", labels)
    np.save(old_dapi_dir / "Conv_zscan_00.npy", dapi)

    class _FakeDriver:
        data_folder = "."
        save_folder = str(tmp_path / "save")
        fovs = [fov]

    cl = CellList.__new__(CellList)
    cl.driver = _FakeDriver()
    cl.cells = [CellData({}, fov_name=fov)]
    got = cl._translate_old_segmentations(
        str(old_seg), str(old_dapi_dir), rot,
        new_dapi_by_fov={fov: new_dapi})
    lab = got[fov]
    inter = np.sum((lab > 0) & (new_labels > 0))
    union = np.sum((lab > 0) | (new_labels > 0))
    assert inter / union > 0.9
    # per-label identity is preserved, not just the foreground
    for lid in (1, 2, 3):
        a, b = lab == lid, new_labels == lid
        assert np.sum(a & b) / np.sum(a | b) > 0.85
    # attached to the FOV's cells and persisted for reuse
    assert cl.cells[0].segmentation_label is lab
    import os as _os
    saved = _os.path.join(cl.driver.save_folder, "Segmentation",
                          "Conv_zscan_00_segmentation.npy")
    assert _os.path.exists(saved)
    # cached file short-circuits recomputation
    got2 = cl._translate_old_segmentations(
        str(old_seg), str(old_dapi_dir), rot,
        new_dapi_by_fov={fov: new_dapi})
    np.testing.assert_array_equal(got2[fov], lab)


def test_cell_list_translate_chromosome_coords():
    """Chromosome centers carry over between experiments through
    border-aware per-cell rotation centers (reference
    _translate_chromosome_coords classes/__init__.py:1422-1491 ->
    visual_tools.translate_chromosome_coordinates:2857-2960)."""
    from imageanalysis3_tpu.legacy import _border_aware_centers

    th = np.deg2rad(10.0)
    rot = np.array([[np.cos(th), -np.sin(th)],
                    [np.sin(th), np.cos(th)]])

    class _FakeDriver:
        data_folder = save_folder = "."
        fovs = []

        class cfg:
            image_size = (9, 200, 200)

    def _make(fov, cid, crop, coords=None):
        c = CellData({}, fov_name=fov, cell_id=cid)
        c.segmentation_crop = np.asarray(crop)
        if coords is not None:
            c.chrom_coords = [np.asarray(x, float) for x in coords]
        return c

    # interior cell: centers are the crop midpoints
    src = _make("f0", 1, [[20, 60], [30, 70]],
                coords=[[4.0, 45.0, 55.0]])
    tar = _make("f0", 1, [[25, 65], [28, 68]])
    # unmatched cell is skipped with None
    lone = _make("f1", 2, [[0, 10], [0, 10]])

    src_cl = CellList.__new__(CellList)
    src_cl.driver = _FakeDriver()
    src_cl.cells = [src]
    tar_cl = CellList.__new__(CellList)
    tar_cl.driver = _FakeDriver()
    tar_cl.cells = [tar, lone]

    got = tar_cl._translate_chromosome_coords(src_cl, rot,
                                              rotation_order="forward")
    assert got[1] is None
    rel = np.array([45.0, 55.0]) - np.array([40.0, 50.0])
    want_xy = rot @ rel + np.array([45.0, 48.0])
    np.testing.assert_allclose(got[0][0][1:], want_xy, atol=1e-9)
    assert got[0][0][0] == 4.0  # z center identical in both stacks
    assert tar.chrom_coords is not None  # attached (no prior coords)
    # 'reverse' transposes: forward-then-reverse round-trips the xy
    back = src_cl._translate_chromosome_coords(
        tar_cl, rot, rotation_order="reverse", overwrite=True)
    np.testing.assert_allclose(back[0][0], [4.0, 45.0, 55.0], atol=1e-9)

    # border re-anchoring: a crop clipped at the low edge uses the
    # partner's half-width measured from the far (in-FOV) edge
    s, t = _border_aware_centers(2, 42, 30, 70, 200, border_lim=10)
    assert (s, t) == (42 - 20.0, 70 - 20.0)
    # both clipped high: anchored to crop starts with the max half-width
    s, t = _border_aware_centers(160, 198, 170, 196, 200, border_lim=10)
    assert (s, t) == (160 + 19.0, 170 + 19.0)


def test_cell_list_dependent_maps_and_transfer(tmp_path):
    """Flag-gated population maps (reference _generate_dependent_maps
    classes/__init__.py:2095-2217) and data-type group cloning
    (reference _transfer_data_type classes/__init__.py:4329-4443)."""
    rng = np.random.default_rng(33)
    cells = []
    for i in range(6):
        cand, _ = _cand_spots(rng, n_regions=12)
        c = CellData(cand, fov_name="Conv_zscan_00.dax")
        c._pick_spots(method="naive")
        c._generate_distance_map()
        # 'on' cells get a compacted (scaled-down) structure
        if i < 3:
            c.distance_maps = [m * 0.5 for m in c.distance_maps]
        cells.append(c)

    class _FakeDriver:
        data_folder = save_folder = str(tmp_path)
        fovs = []

        def store_path(self, fov):
            import os
            return os.path.join(str(tmp_path), fov + ".hdf5")

    cl = CellList.__new__(CellList)
    cl.driver = _FakeDriver()
    cl.cells = cells
    flags = [[1]] * 3 + [[0]] * 3
    dep = cl._generate_dependent_maps(flags, stat_type="median")
    on_map, n_on = dep["on"]
    off_map, n_off = dep["off"]
    assert n_on == 3 and n_off == 3
    tri = np.triu_indices_from(on_map, k=1)
    assert np.nanmedian(on_map[tri]) < 0.6 * np.nanmedian(off_map[tri])
    # dict flags require a gene_id
    with pytest.raises(ValueError):
        cl._generate_dependent_maps([[{7: 1}]] * 6)
    dep2 = cl._generate_dependent_maps(
        [[{7: int(i < 3)}] for i in range(6)], gene_id=7)
    np.testing.assert_allclose(dep2["on"][0], on_map, equal_nan=True)

    # store-side transfer: clone 'unique' -> 'rna-unique'
    from imageanalysis3_tpu.io.store import FovStore
    path = cl.driver.store_path("Conv_zscan_00.dax")
    spots = np.arange(33, dtype=np.float32).reshape(3, 11)
    with FovStore(path, "a") as store:
        store.init_data_type("unique", region_ids=[1, 2],
                             channels=["750", "647"], spot_capacity=3)
        store.save_spots("unique", 1, spots, spots, np.zeros(3))
    assert cl._transfer_data_type("unique", "rna-unique") \
        == ["Conv_zscan_00.dax"]
    with FovStore(path, "r") as store:
        assert "rna-unique" in store.data_types()
        got_spots, _, _ = store.load_spots("rna-unique", 1)
        np.testing.assert_array_equal(got_spots, spots)
        with pytest.raises(KeyError):
            store.transfer_data_type("unique", "rna-unique")
        store_ids = store._fh["unique"]["ids"][:]
    with FovStore(path, "a") as store:
        store.transfer_data_type("unique", "rna-unique", overwrite=True)
        np.testing.assert_array_equal(store._fh["rna-unique"]["ids"][:],
                                      store_ids)
