"""Genome-wide summary distances, matrix assembly, interaction groups.

Parity model: a straight NumPy transliteration of the reference
structure_tools/distance.py flow on small synthetic codebooks, plus
planted-geometry checks for interaction groups and density clouds.
"""

import numpy as np
import pandas as pd
import pytest

from imageanalysis3_tpu.analysis import (
    assemble_dist_dict_to_matrix, center_chr_traces, chr_to_density_clouds,
    contact_prob, find_interaction_groups, generate_plot_chr_edges,
    generate_plot_order, genome_summary_dict, merge_chr_traces, sort_chr,
    summarize_chr_pair)


def _codebook():
    # chromosomes deliberately out of order in the frame
    rows = []
    rid = 0
    for chrom, n in [("2", 3), ("1", 4), ("X", 2)]:
        for k in range(n):
            rows.append({"id": rid, "chr": chrom, "chr_order": k})
            rid += 1
    return pd.DataFrame(rows)


def _cells(rng, n_cells=6):
    sizes = {"1": 4, "2": 3, "X": 2}
    cells = []
    for _ in range(n_cells):
        cell = {}
        for chrom, n in sizes.items():
            h = 1 if chrom == "X" else 2
            cell[chrom] = rng.normal(size=(h, n, 3)).astype(np.float32)
        cells.append(cell)
    return cells


def test_sort_chr_ordering():
    names = ["X", "2", "10", "1", "Y"]
    assert sorted(names, key=sort_chr) == ["1", "2", "10", "X", "Y"]


def test_summary_pair_cis_trans_match_manual():
    rng = np.random.default_rng(0)
    cells = _cells(rng)
    out = summarize_chr_pair(cells, "1", "1", {"1": 4})
    # manual: cis = per-homolog self distances, trans = ordered pairs
    cis, trans = [], []
    for cell in cells:
        a, b = cell["1"]
        for h in (a, b):
            cis.append(np.linalg.norm(h[:, None] - h[None], axis=-1))
        trans.append(np.linalg.norm(a[:, None] - b[None], axis=-1))
        trans.append(np.linalg.norm(b[:, None] - a[None], axis=-1))
    np.testing.assert_allclose(out["cis_1"], np.nanmedian(cis, 0),
                               rtol=1e-5)
    np.testing.assert_allclose(out["trans_1"], np.nanmedian(trans, 0),
                               rtol=1e-5)


def test_summary_pair_inter_and_missing():
    rng = np.random.default_rng(1)
    cells = _cells(rng)
    out = summarize_chr_pair(cells, "1", "X", {"1": 4, "X": 2})
    manual = []
    for cell in cells:
        for a in cell["1"]:
            for b in cell["X"]:
                manual.append(np.linalg.norm(a[:, None] - b[None], axis=-1))
    np.testing.assert_allclose(out[("1", "X")], np.nanmedian(manual, 0),
                               rtol=1e-5)
    # a chromosome never observed yields an all-NaN block of codebook size
    empty = summarize_chr_pair([{"1": cells[0]["1"]}], "1", "X",
                               {"1": 4, "X": 2})
    assert empty[("1", "X")].shape == (4, 2)
    assert np.isnan(empty[("1", "X")]).all()


def test_assemble_matrix_blocks_and_edges():
    rng = np.random.default_rng(2)
    cb = _codebook()
    cells = _cells(rng)
    summary = genome_summary_dict(cells, cb)
    # sort_by_region=False stacks chromosomes in sorted order
    mat, edges, names = assemble_dist_dict_to_matrix(
        summary, cb, use_cis=True, sort_by_region=False)
    assert mat.shape == (9, 9)
    assert names == ["1", "2", "X"]
    np.testing.assert_array_equal(edges, [0, 4, 7, 9])
    # diagonal block of chr 1 equals its cis map
    np.testing.assert_allclose(mat[:4, :4], summary["cis_1"], rtol=1e-5)
    # off-diagonal block equals the inter map (chr pair sorted as (1, 2))
    key = ("1", "2") if ("1", "2") in summary else ("2", "1")
    block = summary[key]
    if key == ("2", "1"):
        block = block.T
    np.testing.assert_allclose(mat[:4, 4:7], block, rtol=1e-5)
    # symmetric fill
    np.testing.assert_allclose(mat, mat.T, rtol=1e-5, atol=1e-6)
    # diagonal blocks are intra distances -> zero diagonal
    assert np.allclose(np.diag(mat), 0.0, atol=1e-5)


def test_plot_order_sort_by_region_uses_sel_indices():
    cb = _codebook()
    sel = cb[cb["chr"] != "X"].reset_index(drop=True)
    inds, orders = generate_plot_order(cb, sel, sort_by_region=True)
    assert "X" not in inds
    # chr 2 rows sit first in sel (frame order), so its plot indices are 0..2
    np.testing.assert_array_equal(inds["2"], [0, 1, 2])
    np.testing.assert_array_equal(inds["1"], [3, 4, 5, 6])
    np.testing.assert_array_equal(orders["1"], [0, 1, 2, 3])
    edges, names = generate_plot_chr_edges(sel, inds, sort_by_region=True)
    np.testing.assert_array_equal(edges, [0, 3, 7])
    assert names == ["2", "1"]


def test_contact_prob_counts_finite_only():
    mat = np.array([[0.2, np.nan], [1.5, 0.5]])
    p = contact_prob(mat, contact_th=0.6, axis=0)
    np.testing.assert_allclose(p, [0.5, 1.0])


def test_merge_and_center_traces():
    rng = np.random.default_rng(3)
    cb = _codebook()
    cell = _cells(rng, 1)[0]
    cell["1"][0, 2] = np.nan
    centered = center_chr_traces(cell)
    pooled = np.concatenate([z.reshape(-1, 3)
                             for z in centered.values()])
    np.testing.assert_allclose(np.nanmean(pooled, 0), 0.0, atol=1e-5)
    zxys, rids = merge_chr_traces(cell, cb, keep_valid=True)
    # one NaN row dropped: 2*4 + 2*3 + 1*2 - 1 = 15
    assert zxys.shape == (15, 3)
    assert np.isfinite(zxys).all()
    # region ids index into the chromosome-sorted order (chr 1 first)
    assert rids.min() >= 0 and rids.max() < 9


def test_find_interaction_groups_planted_hub():
    cb = _codebook()
    # place one locus from each of chr 1, 2, X at a common hub; rest far
    cell = {
        "1": np.full((1, 4, 3), 100.0, np.float32),
        "2": np.full((1, 3, 3), 200.0, np.float32),
        "X": np.full((1, 2, 3), 300.0, np.float32),
    }
    cell["1"][0, 0] = (0.0, 0.0, 0.0)
    cell["2"][0, 1] = (0.1, 0.0, 0.0)
    cell["X"][0, 0] = (0.0, 0.1, 0.0)
    coords, rids, chrs = find_interaction_groups(cell, cb,
                                                 search_radius=0.5,
                                                 min_chrs=3)
    assert len(coords) == 1
    assert sorted(np.unique(chrs[0])) == ["1", "2", "X"]
    assert coords[0].shape == (3, 3)


def test_density_clouds_shapes_and_screens():
    rng = np.random.default_rng(4)
    n = 40
    good = rng.normal(scale=1.0, size=(n, 3)).astype(np.float32)
    bad = np.full((n, 3), np.nan, np.float32)       # fails valid screen
    cell = {"1": np.stack([good, bad]),
            "2": np.stack([good + 0.5])}
    clouds = chr_to_density_clouds(cell, pixel_size=0.5, im_radius=4.0,
                                   gaussian_sigma=0.5, min_valid_spots=10)
    assert clouds["1"].shape == (1, 16, 16, 16)     # bad homolog dropped
    assert clouds["2"].shape == (1, 16, 16, 16)
    # default scale sums ~ n_spots * gaussian mass
    sigma_vox = 0.5 / 0.5
    expect = n * (2 * np.pi) ** 1.5 * sigma_vox ** 3
    total = float(clouds["2"][0].sum())
    assert total == pytest.approx(expect, rel=0.25)  # grid-edge losses
    pdf = chr_to_density_clouds(cell, pixel_size=0.5, im_radius=4.0,
                                gaussian_sigma=0.5, min_valid_spots=10,
                                normalize_pdf=True)
    assert float(pdf["2"][0].sum()) == pytest.approx(1.0, rel=1e-4)


# ---------------------------------------------------------------------------
# spAligner bridge (io_tools/aligner.py parity)
# ---------------------------------------------------------------------------


def test_spaligner_to_chr_homologs():
    from imageanalysis3_tpu.io import spaligner_to_chr_homologs

    cb = _codebook()
    rows = []
    for fbr in (0, 1):
        for hyb in (0, 2, 3):
            rows.append({"chr": "chr1", "fiberidx": fbr, "hyb": hyb,
                         "z_um": float(hyb), "x_um": float(fbr),
                         "y_um": 0.0, "fov_id": 7, "cell_id": 3,
                         "uid": "c3"})
    df = pd.DataFrame(rows)
    homologs, info = spaligner_to_chr_homologs(df, cb)
    assert list(homologs) == ["1"]
    assert len(homologs["1"]) == 2
    trace = homologs["1"][0]
    assert trace.shape == (4, 3)                     # chr 1 has 4 regions
    assert np.isnan(trace[1]).all()                  # hyb 1 unobserved
    np.testing.assert_allclose(trace[2], [2.0, 0.0, 0.0])
    assert info == {"fov_id": 7, "cell_id": 3, "uid": "c3"}
    sparse, _ = spaligner_to_chr_homologs(df, cb, fill_blank=False)
    assert sparse["1"][0].shape == (3, 3)


# ---------------------------------------------------------------------------
# KS domain statistics (domain_tools/distance.py:285-443 parity)
# ---------------------------------------------------------------------------


def test_domain_stat_matches_scipy_transliteration():
    from scipy.stats import ks_2samp

    from imageanalysis3_tpu.analysis import (domain_neighboring_stats,
                                             domain_stat)

    rng = np.random.default_rng(5)
    # two tight blobs far apart: strong positive KS separation
    zxy = np.concatenate([rng.normal(0, 10, (12, 3)),
                          rng.normal(1000, 10, (10, 3))]).astype(float)
    stat, pval = domain_stat(zxy, (0, 12), (12, 22), method="ks")
    mat = np.linalg.norm(zxy[:, None] - zxy[None], axis=-1)
    intra = np.concatenate([
        mat[:12, :12][np.triu_indices(12, 1)],
        mat[12:, 12:][np.triu_indices(10, 1)]])
    inter = mat[:12, 12:].ravel()
    ref_stat, ref_pval = ks_2samp(inter, intra)
    assert stat == pytest.approx(ref_stat)           # sign: inter > intra
    assert pval == pytest.approx(ref_pval)
    assert stat > 0.9
    # distance-matrix input gives the identical result
    stat2, _ = domain_stat(mat, (0, 12), (12, 22), method="ks")
    assert stat2 == pytest.approx(stat)
    # one uniform blob: near-zero separation
    blob = rng.normal(0, 10, (24, 3))
    stat3, pval3 = domain_stat(blob, (0, 12), (12, 24), method="ks")
    assert abs(stat3) < 0.35 and pval3 > 1e-3
    # t-test variant runs and separates the planted case
    t_stat, t_pval = domain_stat(zxy, (0, 12), (12, 22), method="ttest")
    assert t_stat > 0 and t_pval < 1e-6
    # per-boundary driver
    stats, pvals = domain_neighboring_stats(zxy, [0, 12], method="ks")
    assert stats.shape == (1,) and stats[0] == pytest.approx(stat, abs=0.1)


def test_plot_boundary_probability_smoke(tmp_path):
    from imageanalysis3_tpu.figures import plot_boundary_probability

    ax = plot_boundary_probability(
        np.arange(20), [[0, 5, 12], [5, 12], [5]],
        save_path=str(tmp_path / "bp.png"))
    line = ax.lines[0]
    y = line.get_ydata()
    assert y[5] == pytest.approx(1.0)
    assert y[12] == pytest.approx(2 / 3)
    assert y[0] == 0.0                               # start 0 skipped
    assert (tmp_path / "bp.png").exists()
    import matplotlib.pyplot as plt
    plt.close(ax.figure)


def test_plot_genome_wide_distance_map_smoke(tmp_path):
    from imageanalysis3_tpu.figures import plot_genome_wide_distance_map

    rng = np.random.default_rng(6)
    cb = _codebook()
    cell = _cells(rng, 1)[0]
    traces = [cell[c][0] for c in ("1", "2", "X")]
    edges = np.array([0, 4, 7, 9])
    ax = plot_genome_wide_distance_map(traces, ["1", "2", "X"], edges,
                                       save_path=str(tmp_path / "gw.png"))
    assert (tmp_path / "gw.png").exists()
    img = ax.images[0].get_array()
    assert img.shape == (9, 9)
    import matplotlib.pyplot as plt
    plt.close(ax.figure)
