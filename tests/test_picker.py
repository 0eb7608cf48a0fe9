"""SpotPicker facade: parity with a NumPy/scipy transliteration of the
reference scoring (classes/picker.py) plus end-to-end assignment on a
planted two-homolog table."""

import numpy as np
import pandas as pd
import pytest

from imageanalysis3_tpu.decode.picker import (
    SpotPicker, batch_pick_spots, cdf_scores, prepare_score_metrics_by_chr,
    DEFAULT_WEIGHTS)


def ref_cdf_scores(values, refs, greater=True):
    """Literal transliteration of reference cdf_scores
    (classes/picker.py:601-612) via scipy percentileofscore."""
    from scipy.stats import percentileofscore

    refs = np.ravel(refs)
    if np.isnan(refs).all():
        return np.nan * np.ones(np.shape(values))
    n = len(refs)
    out = []
    for v in np.ravel(values):
        if np.isnan(v):
            # the reference ran pre-1.9 scipy, where percentileofscore is
            # literally count(refs <= score)/n*100 — a NaN score compares
            # False everywhere, count 0 (modern scipy propagates NaN
            # instead, so emulate the old behavior here)
            cnt = 0.0
        else:
            p = percentileofscore(refs, v, kind="weak", nan_policy="omit")
            # scipy >= 1.9 also omits NaNs from the denominator; the
            # reference's behavior keeps them — rescale to that form
            n_fin = np.sum(~np.isnan(refs))
            cnt = p / 100.0 * n_fin
        p_ref = cnt / n * 100.0
        if greater:
            out.append(p_ref / 100 * n / (n + 2) + 1 / (n + 2))
        else:
            out.append(1 - p_ref / 100 * n / (n + 2) - 1 / (n + 2))
    return np.array(out).reshape(np.shape(values))


def test_cdf_scores_matches_reference_formula():
    rng = np.random.default_rng(0)
    refs = rng.normal(10, 3, 200)
    refs[::17] = np.nan                      # NaNs stay in the pool
    vals = np.concatenate([rng.normal(10, 3, 50), [np.nan]])
    for greater in (True, False):
        got = cdf_scores(vals, refs, greater=greater)
        want = ref_cdf_scores(vals, refs, greater=greater)
        np.testing.assert_allclose(got, want, rtol=1e-10)
        fin = got[~np.isnan(vals)]
        assert np.all(fin > 0) and np.all(fin < 1)


def ref_metrics(hzxys, region_ids, centers, prev=None, local_range=5):
    """Literal transliteration of prepare_score_metrics_by_chr
    (classes/picker.py:560-600)."""
    from scipy.spatial.distance import cdist

    m = np.ones([3, len(centers), len(hzxys)]) * np.nan
    m[0, :, :] = hzxys[:, 0]
    m[1, :, :] = cdist(centers, hzxys[:, 1:])
    if prev is None:
        for i, rid in enumerate(region_ids):
            sel = np.where((region_ids >= rid - local_range)
                           & (region_ids <= rid + local_range))[0]
            sel = np.setdiff1d(sel, [i])
            if len(sel) > 0:
                d = np.linalg.norm(
                    hzxys[i, 1:] - np.nanmean(hzxys[sel, 1:], axis=0))
                m[2, :, i] = d
    else:
        for i, rid in enumerate(region_ids):
            sel = np.arange(max(0, rid - local_range),
                            min(len(prev[0]), rid + local_range + 1))
            sel = np.setdiff1d(sel, [i])
            if len(sel) == 0:
                continue
            for h, ref_h in enumerate(prev):
                d = np.linalg.norm(
                    hzxys[i, 1:] - np.nanmean(ref_h[sel, 1:], axis=0))
                m[2, h, i] = d
    return m


def test_metrics_match_reference_transliteration():
    rng = np.random.default_rng(1)
    n = 60
    hzxys = np.column_stack([rng.uniform(100, 1000, n),
                             rng.normal(0, 5, (n, 3)) + 50])
    ids = rng.integers(0, 20, n)
    centers = np.array([[48.0, 50.0, 52.0], [55.0, 45.0, 50.0]])
    got = prepare_score_metrics_by_chr(hzxys, ids, centers)
    want = ref_metrics(hzxys, ids, centers)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)

    prev = rng.normal(50, 5, (2, 20, 4))
    prev[0, 3] = np.nan
    got2 = prepare_score_metrics_by_chr(hzxys, ids, centers,
                                        prev_homolog_hzxys=prev)
    want2 = ref_metrics(hzxys, ids, centers, prev=prev)
    np.testing.assert_allclose(got2, want2, rtol=1e-12, equal_nan=True)


def planted_table(rng, n_regions=20, chrom="1", offset=0.0):
    """Two well-separated homolog traces + noise candidates."""
    centers = {0: np.array([20.0, 30.0, 30.0]),
               1: np.array([20.0, 80.0, 80.0])}
    rows = []
    truth = {0: [], 1: []}
    for r in range(n_regions):
        start = 1_000_000 * (r + 1) + offset
        name = f"{chrom}:{int(start)}-{int(start + 500_000)}"
        for h in (0, 1):
            zxy = centers[h] + rng.normal(0, 2.0, 3)
            truth[h].append(zxy)
            rows.append({"region_name": name, "chr": chrom,
                         "start": start, "end": start + 500_000,
                         "center_z": zxy[0], "center_x": zxy[1],
                         "center_y": zxy[2],
                         "center_intensity": rng.uniform(500, 1500),
                         "center_internal_dist": rng.uniform(0, 1)})
        # a dim far-away distractor every few regions
        if r % 3 == 0:
            rows.append({"region_name": name, "chr": chrom,
                         "start": start, "end": start + 500_000,
                         "center_z": 50.0, "center_x": 150.0,
                         "center_y": 150.0,
                         "center_intensity": rng.uniform(50, 80),
                         "center_internal_dist": rng.uniform(0, 1)})
    coords = pd.DataFrame(rows)
    names = sorted(coords["region_name"].unique(),
                   key=lambda s: int(s.split(":")[1].split("-")[0]))
    codebook = pd.DataFrame({"name": names, "chr": chrom,
                             "id": np.arange(len(names))})
    return coords, codebook, truth


def test_iterative_assignment_recovers_homologs():
    rng = np.random.default_rng(7)
    coords, codebook, truth = planted_table(rng)
    picker = SpotPicker(coords=coords, codebook=codebook,
                        chr_2_copy_num={"1": 2})
    picker.iterative_assignment(max_niter=10)
    picked = picker.chr_2_homolog_hzxys["1"]         # (2, 20, 4)
    assert picked.shape == (2, 20, 4)
    # each homolog trace matches one planted cluster
    means = np.nanmean(picked[:, :, 1:], axis=1)
    planted = np.array([np.mean(truth[0], 0), np.mean(truth[1], 0)])
    d = np.linalg.norm(means[:, None] - planted[None], axis=-1)
    perm = d.argmin(1)
    assert sorted(perm.tolist()) == [0, 1]
    assert d[np.arange(2), perm].max() < 3.0
    # the distractors (dim, far) were never picked
    picked_x = picked[:, :, 2]
    assert np.nanmax(np.abs(picked_x - 55)) < 40     # not at x=150
    # convergence happened (change fraction settled)
    assert not any(picker.chr_2_change.values())
    # scores were written back per homolog
    assert "score_h0" in picker.merged_coords.columns
    assert "score_h1" in picker.merged_coords.columns


def test_score_filter_invalidates_low_scores():
    rng = np.random.default_rng(3)
    coords, codebook, _ = planted_table(rng)
    picker = SpotPicker(coords=coords, codebook=codebook,
                        chr_2_copy_num={"1": 2},
                        valid_score_th=-0.0001)       # harsh threshold
    picker.iterative_assignment(max_niter=3)
    filt = picker.chr_2_filtered_inds["1"]
    raw = picker.chr_2_homolog_inds["1"]
    # the harsh threshold must have removed at least one pick, and every
    # removal is mirrored as NaN coordinates
    removed = (filt == -1) & (raw >= 0)
    assert removed.any()
    assert np.isnan(
        picker.chr_2_filtered_hzxys["1"][removed]).all()


def test_decoded_file_roundtrip(tmp_path):
    from imageanalysis3_tpu.io.spots import save_dataframe_hdf5

    rng = np.random.default_rng(11)
    coords, codebook, _ = planted_table(rng)
    # emulate a decoded file with one combo library
    decoded = str(tmp_path / "decoded.hdf5")
    coords2 = coords.copy()
    coords2["height_0"] = 100.0
    coords2["height_1"] = np.nan
    save_dataframe_hdf5(coords2, decoded, "libA/spotGroups")
    save_dataframe_hdf5(codebook, decoded, "libA/codebook")

    picked_path = str(tmp_path / "picked.hdf5")
    picker = batch_pick_spots(decoded, picked_path, num_expected_lib=1,
                              chr_2_copy_num={"1": 2})
    assert picker is not None
    assert int(picker.merged_coords["num_spots"].iloc[0]) == 1
    # reload and compare
    back = SpotPicker.load_picked(picked_path)
    np.testing.assert_allclose(back.chr_2_homolog_hzxys["1"],
                               picker.chr_2_homolog_hzxys["1"],
                               equal_nan=True)
    assert back.chr_2_copy_num["1"] == 2
    df = back.picked_dataframe(filtered=False)
    assert len(df) == 2 * 20
    # wrong library count bails out (reference batch_pick_spots guard)
    assert batch_pick_spots(decoded, picked_path,
                            num_expected_lib=3) is None
