"""End-to-end experiment driver: on-disk .dax -> store, with resume.

Covers the reference chain batch_process_image_to_spots
(classes/batch_functions.py:60-302) + _process_image_to_spots
(classes/field_of_view.py:901-1158): folder scan, reference round, per-round
correct/drift/fit, persistence, and rerun-is-a-no-op resumability
(classes/field_of_view.py:1453-1522).
"""

import numpy as np
import pytest

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                       FitConfig, DriftConfig,
                                       CorrectionConfig)
from imageanalysis3_tpu.io.dax import (interleave_channels, split_channels,
                                       read_dax)
from imageanalysis3_tpu.io.store import FovStore
from imageanalysis3_tpu.pipeline.experiment import (ExperimentDriver,
                                                    parse_region_entry)

SHAPE = (12, 128, 128)


def _driver(root, tmp_path, **kwargs):
    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=False, hot_pixel=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=4, lm_iters=20),
        num_buffer_frames=4,
    )
    return ExperimentDriver(str(root), str(tmp_path / "save"), cfg=cfg,
                            **kwargs)


def test_parse_region_entry():
    assert parse_region_entry("u101") == ("unique", 101)
    assert parse_region_entry("c5") == ("combo", 5)
    assert parse_region_entry("m12") == ("merfish", 12)
    assert parse_region_entry("beads") is None
    assert parse_region_entry("DAPI") is None
    assert parse_region_entry("") is None
    assert parse_region_entry("u1_chrom") is None


def test_interleave_roundtrip():
    rng = np.random.default_rng(3)
    stacks = [rng.integers(0, 1000, size=(5, 8, 8)).astype(np.uint16)
              for _ in range(3)]
    movie = interleave_channels(stacks, buffer_frames=4)
    back = split_channels(movie, ["a", "b", "c"], ["a", "b", "c"], n_z=5,
                          buffer_frames=4)
    for orig, rec in zip(stacks, back):
        np.testing.assert_array_equal(orig, rec)


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp")
    truth = syn.write_synthetic_experiment(
        str(root), shape=SHAPE, n_rounds=3, n_spots=10, seed=1,
        buffer_frames=4, channels=("750", "647", "488"))
    return root, truth


def test_driver_end_to_end_and_resume(experiment, tmp_path):
    root, truth = experiment
    drv = _driver(root, tmp_path)

    # the plan covers 3 rounds x 2 data channels = 6 unique regions
    table = drv.region_table()
    assert set(table) == {"unique"}
    assert len(table["unique"]) == 6

    counts = drv.process_fov("Conv_zscan_00.dax")
    assert counts["unique"] == 6

    with FovStore(drv.store_path("Conv_zscan_00.dax"), "r") as store:
        assert store.pending_regions("unique").size == 0
        dflags = store.drift_flags("unique")
        assert dflags.shape == (6,)
        # recovered drifts match the planted per-round scene displacements
        # (stored drift is the correction shift applied to spot coords,
        # i.e. the negated displacement — skimage/reference convention)
        g_ids = list(store._fh["unique"]["ids"][:])
        for rid, info in truth["regions"].items():
            i = g_ids.index(rid)
            drift = store._fh["unique"]["drifts"][i]
            np.testing.assert_allclose(drift,
                                       -truth["drifts"][info["round"]],
                                       atol=0.5)
        # drift-corrected spot coords land on the round-0 frame truth
        for rid, info in truth["regions"].items():
            spots, drift, flag = store.load_spots("unique", rid)
            assert flag == 2
            got = spots[:, 1:4]
            matched = 0
            for c in info["centers"]:
                d = np.linalg.norm(got - c, axis=1).min()
                if d < 0.5:
                    matched += 1
            assert matched >= len(info["centers"]) * 0.8

    # rerun: everything is flagged done -> no-op
    counts2 = drv.process_fov("Conv_zscan_00.dax")
    assert counts2["unique"] == 0
    # per-stage structured timing was recorded
    summary = drv.timings.summary()
    assert "process_round" in summary and "load_dax" in summary


def test_driver_partial_resume(experiment, tmp_path):
    """Clearing one region's flag makes exactly that work pending again."""
    root, truth = experiment
    drv = _driver(root, tmp_path)
    drv.process_fov("Conv_zscan_00.dax")
    path = drv.store_path("Conv_zscan_00.dax")
    with FovStore(path) as store:
        g = store._fh["unique"]
        g["flags"][2] = 0
        cleared_rid = int(g["ids"][2])
    drv2 = _driver(root, tmp_path)
    counts = drv2.process_fov("Conv_zscan_00.dax")
    assert counts["unique"] == 1
    with FovStore(path, "r") as store:
        assert store.pending_regions("unique").size == 0
    # only the round containing the cleared region was reprocessed
    rounds_run = [r["folder"] for r in drv2.timings.records
                  if r["stage"] == "process_round"]
    cleared_round = truth["regions"][cleared_rid]["round"]
    assert rounds_run == [f"H{cleared_round}R{cleared_round}"]


def test_device_deinterleave_mode_parity(experiment, tmp_path):
    """Raw-pread input mode (host = one sequential read, de-interleave
    on device inside the round program) must produce the same store
    contents as the fused host loader — same spots, drifts, flags."""
    root, _truth = experiment
    drv_a = _driver(root, tmp_path / "a")
    drv_b = _driver(root, tmp_path / "b", device_deinterleave=True)
    fov = "Conv_zscan_00.dax"
    counts_a = drv_a.process_fov(fov)
    counts_b = drv_b.process_fov(fov)
    assert counts_a == counts_b
    with FovStore(drv_a.store_path(fov), "r") as sa, \
            FovStore(drv_b.store_path(fov), "r") as sb:
        ids = list(sa._fh["unique"]["ids"][:])
        assert ids == list(sb._fh["unique"]["ids"][:])
        for rid in ids:
            spots_a, drift_a, flag_a = sa.load_spots("unique", rid)
            spots_b, drift_b, flag_b = sb.load_spots("unique", rid)
            assert flag_a == flag_b
            np.testing.assert_allclose(drift_a, drift_b, atol=1e-5)
            assert spots_a.shape == spots_b.shape
            np.testing.assert_allclose(spots_a, spots_b, rtol=1e-4,
                                       atol=1e-4)


def test_sequential_drift_mode(experiment, tmp_path):
    """Sequential mode: drifts stored as cumulative sums vs round 0 and
    corrected spots land on round-0 truth (reference Calculate_Bead_Drift
    sequential mode, corrections.py:21-278)."""
    root, truth = experiment
    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=False, hot_pixel=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=4, lm_iters=20),
        num_buffer_frames=4)
    drv = ExperimentDriver(str(root), str(tmp_path / "save_seq"), cfg=cfg,
                           sequential_drift=True)
    counts = drv.process_fov("Conv_zscan_00.dax")
    assert counts["unique"] == 6
    with FovStore(drv.store_path("Conv_zscan_00.dax"), "r") as store:
        g_ids = list(store._fh["unique"]["ids"][:])
        for rid, info in truth["regions"].items():
            i = g_ids.index(rid)
            drift = store._fh["unique"]["drifts"][i]
            # cumulative drift vs round 0 = -(scene displacement)
            np.testing.assert_allclose(
                drift, -truth["drifts"][info["round"]], atol=0.7)
            spots, _, flag = store.load_spots("unique", rid)
            got = spots[:, 1:4]
            matched = sum(np.linalg.norm(got - c, axis=1).min() < 0.7
                          for c in info["centers"])
            assert matched >= len(info["centers"]) * 0.8


def test_driver_full_correction_chain(tmp_path):
    """Driver wiring with illumination + bleedthrough + chromatic profiles
    simultaneously: planted optics are undone and traces still land on
    truth (io_tools/load.py:166-521 full chain)."""
    rng = np.random.default_rng(31)
    root = tmp_path / "exp_full"
    truth = syn.write_synthetic_experiment(
        str(root), shape=SHAPE, n_rounds=2, n_spots=8, seed=13,
        buffer_frames=4, channels=("750", "647", "488"))

    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=True, hot_pixel=False,
                                    bleedthrough=True),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=4, lm_iters=20),
        num_buffer_frames=4)
    # identity-ish profiles: flat illumination (value 1 => no-op), identity
    # unmix, zero chromatic shifts — the full chain must flow through the
    # driver without disturbing the result
    illum = {ch: np.ones(SHAPE[1:], np.float32)
             for ch in ("750", "647", "488")}
    bleed = np.zeros((3, 3) + SHAPE[1:], np.float32)
    for i in range(3):
        bleed[i, i] = 1.0
    chrom = {ch: np.zeros((3, 10), np.float32)
             for ch in ("750", "647")}
    drv = ExperimentDriver(str(root), str(tmp_path / "save_full"), cfg=cfg,
                           illumination_profiles=illum,
                           bleed_profile=bleed,
                           chromatic_constants=chrom)
    counts = drv.process_fov("Conv_zscan_00.dax")
    assert counts["unique"] == 4
    with FovStore(drv.store_path("Conv_zscan_00.dax"), "r") as store:
        for rid, info in truth["regions"].items():
            spots, drift, flag = store.load_spots("unique", rid)
            got = spots[:, 1:4]
            matched = sum(np.linalg.norm(got - c, axis=1).min() < 0.5
                          for c in info["centers"])
            assert matched >= len(info["centers"]) * 0.8


def test_driver_loads_correction_folder(tmp_path):
    """A reference-convention correction folder auto-populates driver
    profiles and the bleed profile is subset to each round's channels
    (reference _load_correction_profiles + per-round subsetting)."""
    from imageanalysis3_tpu.io.profiles_io import save_correction_profile

    rng = np.random.default_rng(41)
    root = tmp_path / "exp_cf"
    syn.write_synthetic_experiment(str(root), shape=SHAPE, n_rounds=2,
                                   n_spots=6, seed=17, buffer_frames=4,
                                   channels=("750", "647", "488"))
    cfg = ExperimentConfig(
        image_size=SHAPE,
        corr_channels=("750", "647"),
        correction=CorrectionConfig(illumination=True, hot_pixel=False,
                                    bleedthrough=True),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=3, lm_iters=15),
        num_buffer_frames=4)
    folder = str(tmp_path / "Corrections")
    illum = {c: np.full(SHAPE[1:], 1.0, np.float32)
             for c in ("750", "647")}
    save_correction_profile("illumination", illum, folder,
                            ("750", "647"), im_size=SHAPE)
    bleed = np.zeros((2, 2) + SHAPE[1:], np.float32)
    bleed[0, 0] = 1.0
    bleed[1, 1] = 1.0
    save_correction_profile("bleedthrough", bleed, folder,
                            ("750", "647"), im_size=SHAPE)

    drv = ExperimentDriver(str(root), str(tmp_path / "save_cf"), cfg=cfg,
                           correction_folder=folder)
    assert set(drv.illumination_profiles) == {"750", "647"}
    assert drv.bleed_profile is not None
    counts = drv.process_fov("Conv_zscan_00.dax")
    assert counts["unique"] == 4


def test_sequential_drift_partial_resume(experiment, tmp_path):
    """Clearing one late region reprocesses only that round; the chain
    resumes from the stored cumulative drift of the previous round
    (reference sequential-resume semantics, corrections.py:96-140)."""
    root, truth = experiment
    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=False, hot_pixel=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=4, lm_iters=20),
        num_buffer_frames=4)
    save = str(tmp_path / "save_seqres")
    drv = ExperimentDriver(str(root), save, cfg=cfg, sequential_drift=True)
    drv.process_fov("Conv_zscan_00.dax")
    path = drv.store_path("Conv_zscan_00.dax")
    # clear one region of the LAST round
    last_round = max(info["round"] for info in truth["regions"].values())
    rid = next(r for r, info in truth["regions"].items()
               if info["round"] == last_round)
    with FovStore(path) as store:
        i = store.region_index("unique", rid)
        store._fh["unique"]["flags"][i] = 0

    drv2 = ExperimentDriver(str(root), save, cfg=cfg,
                            sequential_drift=True)
    counts = drv2.process_fov("Conv_zscan_00.dax")
    assert counts["unique"] == 1
    # only the pending round and its predecessor were read from disk
    loaded = [r["folder"] for r in drv2.timings.records
              if r["stage"] == "load_dax"]
    assert set(loaded) == {f"H{last_round - 1}R{last_round - 1}",
                           f"H{last_round}R{last_round}"}
    # resumed spots still land on round-0 truth
    with FovStore(path, "r") as store:
        info = truth["regions"][rid]
        spots, drift, flag = store.load_spots("unique", rid)
        np.testing.assert_allclose(drift, -truth["drifts"][last_round],
                                   atol=0.7)
        got = spots[:, 1:4]
        matched = sum(np.linalg.norm(got - c, axis=1).min() < 0.7
                      for c in info["centers"])
        assert matched >= len(info["centers"]) * 0.8


def test_async_and_sync_writes_produce_identical_stores(experiment,
                                                        tmp_path):
    """The AsyncFovWriter path (driver default) must persist exactly what
    synchronous writes do — dataset for dataset."""
    import h5py

    root, _truth = experiment
    drv_a = _driver(root, tmp_path / "a", async_writes=True)
    drv_s = _driver(root, tmp_path / "s", async_writes=False)
    assert drv_a.process_fov("Conv_zscan_00.dax")["unique"] == 6
    assert drv_s.process_fov("Conv_zscan_00.dax")["unique"] == 6
    # async path recorded a drain stage (the writer thread existed)
    assert "save_drain" in drv_a.timings.summary()

    with h5py.File(drv_a.store_path("Conv_zscan_00.dax"), "r") as fa, \
            h5py.File(drv_s.store_path("Conv_zscan_00.dax"), "r") as fs:
        ga, gs = fa["unique"], fs["unique"]
        assert set(ga.keys()) == set(gs.keys())
        for k in ga.keys():
            np.testing.assert_array_equal(ga[k][:], gs[k][:], err_msg=k)


def test_load_region_crops_matches_stored_images(experiment, tmp_path):
    """Disk-crop loads (windowed read + drift resample) must reproduce the
    drift-warped stored corrected images on the crop window (the
    save_images=False side of Cell_Data._crop_images)."""
    import jax.numpy as jnp
    from imageanalysis3_tpu.ops.warp import warp_image_drift

    root, truth = experiment
    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(illumination=False, hot_pixel=False,
                                    z_shift=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=4, lm_iters=20),
        num_buffer_frames=4,
    )
    drv = ExperimentDriver(str(root), str(tmp_path / "save_crops"),
                           cfg=cfg, save_images=True)
    drv.process_fov("Conv_zscan_00.dax")

    lims = [[2, 10], [30, 90], [24, 100]]
    crops = drv.load_region_crops("Conv_zscan_00.dax", lims, "unique")
    assert len(crops) == 6

    with FovStore(drv.store_path("Conv_zscan_00.dax"), "r") as store:
        g_ids = list(store._fh["unique"]["ids"][:])
        for rid, crop in crops.items():
            assert crop.shape == (8, 60, 76)
            i = g_ids.index(rid)
            stored = store._fh["unique"]["ims"][i].astype(np.float32)
            drift = store._fh["unique"]["drifts"][i]
            warped = np.asarray(warp_image_drift(jnp.asarray(stored),
                                                 jnp.asarray(drift)))
            ref = warped[2:10, 30:90, 24:100]
            # stored ims are rounded to uint16 after correction; the crop
            # path stays float — allow the quantization plus interp noise
            assert np.median(np.abs(crop - ref)) < 1.0
            np.testing.assert_allclose(crop, ref, atol=6.0)

    # 2x2 limits take the full z range; explicit region subset honored
    sub = drv.load_region_crops("Conv_zscan_00.dax", [[30, 90], [24, 100]],
                                "unique", region_ids=[g_ids[0]])
    assert list(sub) == [int(g_ids[0])]
    assert sub[int(g_ids[0])].shape == (12, 60, 76)


def test_crop_images_from_disk_cell_bbox(experiment, tmp_path):
    """Legacy CellData._crop_images_from_disk crops every region to the
    cell's extended bounding box via the windowed disk loader."""
    from imageanalysis3_tpu.legacy import CellData

    root, truth = experiment
    drv = _driver(root, tmp_path)
    drv.process_fov("Conv_zscan_00.dax")

    labels = np.zeros(SHAPE, np.int32)
    labels[:, 40:60, 50:80] = 3
    crops = CellData._crop_images_from_disk(
        drv, "Conv_zscan_00.dax", "unique", labels, 3, extend_dim=10)
    assert len(crops) == 6
    for crop in crops.values():
        assert crop.shape == (SHAPE[0], 40, 50)
    with pytest.raises(ValueError):
        CellData._crop_images_from_disk(
            drv, "Conv_zscan_00.dax", "unique", labels, 99)
