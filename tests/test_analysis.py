"""Post-analysis: partitioning, domain calling, compartments.

Behavior targets: reference classes/partition_spots.py,
domain_tools/{calling,distance}.py, compartment_tools/scoring.py.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from imageanalysis3_tpu.analysis import partition as PT
from imageanalysis3_tpu.analysis import domains as DM
from imageanalysis3_tpu.analysis import compartments as CP


# ---------------------------------------------------------------------------
# Partitioning
# ---------------------------------------------------------------------------


def _label_volume():
    labels = np.zeros((12, 64, 64), np.int32)
    labels[:, 5:25, 5:25] = 1
    labels[:, 35:60, 10:40] = 2
    labels[2:9, 30:34, 45:60] = 3
    return labels


def test_spots_to_labels_mode_vote():
    labels = _label_volume()
    coords = np.array([
        [6, 15, 15],     # inside cell 1
        [6, 45, 25],     # inside cell 2
        [5, 31, 50],     # inside cell 3
        [6, 26, 27],     # just outside cell 1: nearest labels win
        [6, 2, 62],      # empty corner -> -1
    ], np.float32)
    valid = np.ones(5, bool)
    got = np.asarray(PT.spots_to_labels(jnp.asarray(labels),
                                        jnp.asarray(coords),
                                        jnp.asarray(valid),
                                        search_radius=3))
    assert list(got[:3]) == [1, 2, 3]
    assert got[3] in (1, 2)
    assert got[4] == -1
    # invalid spots report -1
    got2 = np.asarray(PT.spots_to_labels(jnp.asarray(labels),
                                         jnp.asarray(coords),
                                         jnp.zeros(5, bool),
                                         search_radius=3))
    assert (got2 == -1).all()


def test_spots_to_intensity():
    im = np.zeros((8, 32, 32), np.float32)
    im[4, 16, 16] = 500.0
    coords = np.array([[4, 14, 14], [1, 2, 2]], np.float32)
    got = np.asarray(PT.spots_to_intensity(jnp.asarray(im),
                                           jnp.asarray(coords),
                                           jnp.ones(2, bool),
                                           search_radius=3))
    assert got[0] == 500.0
    assert got[1] == 0.0


def test_count_genes():
    labels_per_bit = {1: np.array([1, 1, 2, -1]), 2: np.array([2, 2, 2])}
    counts, cells, bits = PT.count_genes(labels_per_bit)
    assert list(cells) == [1, 2] and list(bits) == [1, 2]
    np.testing.assert_array_equal(counts, [[2, 0], [1, 3]])


def test_translate_label_image_identity_and_shift():
    labels = _label_volume()
    eye = jnp.eye(2)
    out = np.asarray(PT.translate_label_image(jnp.asarray(labels), eye,
                                              jnp.zeros(3)))
    np.testing.assert_array_equal(out, labels)
    # integer xy shift moves the mask
    out2 = np.asarray(PT.translate_label_image(jnp.asarray(labels), eye,
                                               jnp.asarray([0.0, 3.0, -2.0])))
    np.testing.assert_array_equal(out2[:, 8:28, 3:23], labels[:, 5:25, 5:25])


# ---------------------------------------------------------------------------
# Domains
# ---------------------------------------------------------------------------


def _block_polymer(rng, sizes, step=80.0, jump=900.0):
    """Trace with dense blocks separated by large jumps (clear domains)."""
    pts = []
    origin = np.zeros(3)
    for s in sizes:
        blk = origin + np.cumsum(rng.normal(0, step / np.sqrt(3), (s, 3)),
                                 axis=0)
        pts.append(blk)
        origin = blk[-1] + rng.normal(0, jump / np.sqrt(3), 3) \
            + np.array([jump, 0, 0])
    return np.concatenate(pts)


def test_sliding_window_dist_boundary_peak():
    rng = np.random.default_rng(0)
    zxys = _block_polymer(rng, [12, 12])
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    sig = np.asarray(DM.sliding_window_dist(jnp.asarray(dm), 5))
    assert np.argmax(sig) == 12


def test_basic_domain_calling_recovers_blocks():
    rng = np.random.default_rng(1)
    sizes = [14, 12, 16]
    zxys = _block_polymer(rng, sizes)
    starts = DM.basic_domain_calling(zxys, min_domain_size=5)
    true_starts = np.cumsum([0] + sizes[:-1])
    assert 0 in starts
    for t in true_starts[1:]:
        assert np.min(np.abs(starts - t)) <= 2, (starts, true_starts)
    # no spurious extra boundaries (allow one)
    assert len(starts) <= len(true_starts) + 1


def test_insulation_domain_calling():
    rng = np.random.default_rng(2)
    sizes = [15, 15]
    zxys = _block_polymer(rng, sizes)
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    starts = DM.insulation_domain_calling(dm, min_domain_size=5)
    assert 0 in starts
    assert np.min(np.abs(starts - 15)) <= 2, starts


def test_domain_pdists_separation():
    rng = np.random.default_rng(3)
    zxys = _block_polymer(rng, [12, 12])
    d = DM.domain_pdists(zxys, [0, 12])
    assert d.shape == (1,)
    assert d[0] > 1.0      # far-separated blocks


def test_merge_domains_absorbs_false_boundary():
    rng = np.random.default_rng(4)
    # one well-mixed globule: both halves occupy the same space
    zxys = rng.normal(0.0, 100.0, (24, 3))
    starts = DM.merge_domains(zxys, [0, 12], dist_th=0.65)
    assert list(starts) == [0]
    # but truly separated blocks survive merging
    zxys2 = _block_polymer(rng, [12, 12])
    starts2 = DM.merge_domains(zxys2, [0, 12], dist_th=0.65)
    assert list(starts2) == [0, 12]


# ---------------------------------------------------------------------------
# Compartments
# ---------------------------------------------------------------------------


def test_ab_projection_and_scores():
    rng = np.random.default_rng(5)
    n = 40
    a_mask = np.zeros(n, bool)
    a_mask[:20] = True
    b_mask = ~a_mask
    # A cloud around +x, B cloud around -x (in normalized coords)
    zxys = np.where(a_mask[:, None],
                    rng.normal([8.0, 0, 0], 2.0, (n, 3)),
                    rng.normal([-8.0, 0, 0], 2.0, (n, 3)))
    valid = np.ones(n, bool)
    proj = np.asarray(CP.ab_axis_projection(jnp.asarray(zxys, jnp.float32),
                                            jnp.asarray(valid),
                                            jnp.asarray(a_mask),
                                            jnp.asarray(b_mask)))
    assert proj[a_mask, 0].mean() > proj[b_mask, 0].mean()

    scores = np.asarray(CP.compartment_scores(
        jnp.asarray(zxys, jnp.float32), jnp.asarray(valid),
        jnp.asarray(a_mask), jnp.asarray(b_mask), grid_radius=16,
        sigma=2.0))
    assert np.nanmean(scores[a_mask]) > 0 > np.nanmean(scores[b_mask])
    assert (scores[a_mask] > 0).mean() > 0.9


def test_ab_eigenscore_splits_checkerboard():
    rng = np.random.default_rng(6)
    n = 40
    comp = (np.arange(n) // 10) % 2      # ABAB blocks of 10
    base = 600.0
    dm = np.full((n, n), base)
    same = comp[:, None] == comp[None, :]
    dm[same] = 300.0
    dm += rng.normal(0, 10, (n, n))
    dm = (dm + dm.T) / 2
    np.fill_diagonal(dm, 0.0)
    ev = CP.ab_compartment_eigenscore(dm)
    s = np.sign(np.nanmean(ev[comp == 0]))
    assert (np.sign(ev[comp == 0]) == s).mean() > 0.9
    assert (np.sign(ev[comp == 1]) == -s).mean() > 0.9


def test_normalize_center_spots():
    rng = np.random.default_rng(7)
    zxys = rng.normal(5.0, 2.0, (30, 3)).astype(np.float32)
    valid = np.ones(30, bool)
    valid[3] = False
    out = np.asarray(CP.normalize_center_spots(jnp.asarray(zxys),
                                               jnp.asarray(valid)))
    assert np.isnan(out[3]).all()
    np.testing.assert_allclose(np.nanmean(out[valid], axis=0), 0.0,
                               atol=1e-4)


def test_arrowhead_transform():
    """Inside a single tight domain next to a distant one, arrowhead
    entries spanning the boundary flip sign (reference
    External/DomainTools.py:265-330)."""
    rng = np.random.default_rng(8)
    zxys = _block_polymer(rng, [10, 10], step=50.0, jump=3000.0)
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    a = DM.arrowhead_transform(dm)
    assert a.shape == dm.shape
    # i in domain 0, j also in domain 0, mirror i-k in domain 0: |A| small
    inside = a[6, 8]
    # i near the boundary, j across it (far), mirror still inside: A < 0
    crossing = a[8, 12]
    assert np.isfinite(inside) and np.isfinite(crossing)
    assert crossing < -0.5
    assert abs(inside) < 0.5


def test_cell_locations_pipeline():
    """Mask -> locations -> stage frame -> multi-FOV merge (reference
    meta_tools/cell_locations.py:13-245)."""
    import pandas as pd
    from imageanalysis3_tpu.analysis.cell_locations import (
        segmentation_to_cell_locations, translate_cell_locations,
        merge_cell_locations)

    labels = _label_volume()
    df = segmentation_to_cell_locations(labels, fov_id=3)
    assert set(df["cell_id"]) == {1, 2, 3}
    c1 = df[df["cell_id"] == 1].iloc[0]
    # cell 1 spans x,y in [5,25): center ~14.5 px -> relative to 32 center
    assert abs(c1["center_x"] - (14.5 - 32) * 0.108) < 0.01
    assert c1["volume"] == 12 * 20 * 20
    assert abs(c1["min_x"] - (5 - 32) * 0.108) < 0.01

    t = translate_cell_locations(df, [0.0, 100.0, 200.0])
    assert abs(t[t["cell_id"] == 1].iloc[0]["center_x"]
               - (100 + (14.5 - 32) * 0.108)) < 0.01

    # second FOV overlaps: its cell 1 center duplicates FOV A's
    t2 = translate_cell_locations(df, [0.0, 100.0, 200.0])
    merged = merge_cell_locations([t, t2], duplicate_distance_um=5.0)
    assert len(merged) == 3          # all duplicates dropped
    t3 = translate_cell_locations(df, [0.0, 300.0, 200.0])
    merged2 = merge_cell_locations([t, t3])
    assert len(merged2) == 6


# ---------------------------------------------------------------------------
# Domain-calling variants (reference domain_tools/calling.py:294-881)
# ---------------------------------------------------------------------------


def test_find_peaks_np_matches_scipy():
    """Prominence + distance peak screening matches scipy.signal (which
    the reference calls directly, calling.py:628-630)."""
    import scipy.signal

    rng = np.random.default_rng(7)
    x = np.cumsum(rng.normal(size=200))
    x += 3 * np.sin(np.arange(200) / 5.0)
    for distance, prom in [(1, None), (4, None), (1, 0.5), (6, 1.0)]:
        kw = {"distance": distance}
        if prom is not None:
            kw["prominence"] = (prom, None)
        want = scipy.signal.find_peaks(x, **kw)[0]
        got = DM._find_peaks_np(x, distance=distance, min_prominence=prom)
        np.testing.assert_array_equal(got, want)


def test_iterative_domain_calling_recovers_nested_blocks():
    """Iterative split-merge finds a sub-boundary the first basic pass
    misses inside a long weakly-split domain."""
    rng = np.random.default_rng(3)
    sizes = [14, 13, 15, 12]
    zxys = _block_polymer(rng, sizes)
    starts = DM.iterative_domain_calling(zxys, dom_sz=5, num_iter=4)
    true_starts = np.cumsum([0] + sizes[:-1])
    assert 0 in starts
    for t in true_starts[1:]:
        assert np.min(np.abs(starts - t)) <= 2, (starts, true_starts)


def test_sliding_window_domain_calling_reproducibility():
    rng = np.random.default_rng(4)
    sizes = [14, 14, 14]
    zxys = _block_polymer(rng, sizes)
    starts, strengths = DM.sliding_window_domain_calling(
        zxys, window_size=5, min_domain_size=4, min_prominence=0.25,
        return_strength=True)
    assert 0 in starts
    for t in (14, 28):
        assert np.min(np.abs(np.asarray(starts) - t)) <= 2, starts
    assert len(strengths) == len(starts)
    # raising the prominence bar prunes boundaries (random walks do carry
    # transient density structure, so an absolute zero is not expected)
    flat = np.cumsum(rng.normal(0, 30, (40, 3)), axis=0)
    weak = DM.sliding_window_domain_calling(flat, window_size=5,
                                            min_prominence=0.25,
                                            merge_candidates=False)
    strict = DM.sliding_window_domain_calling(flat, window_size=5,
                                              min_prominence=3.0,
                                              merge_candidates=False)
    assert len(strict) <= len(weak)


def test_contact_correlation_domain_calling():
    """Boundaries from the contact-frequency merge; a spurious split in
    the middle of one tight block is merged away because the adjacent
    halves stay in contact."""
    rng = np.random.default_rng(5)
    sizes = [16, 16]
    zxys = _block_polymer(rng, sizes, step=60.0, jump=2500.0)
    starts = DM.contact_correlation_domain_calling(
        zxys, domain_size=5, cand_domain_th=0.2, contact_th=500.0,
        corr_th=0.3)
    assert np.min(np.abs(np.asarray(starts) - 16)) <= 2, starts
    # NaN rows are tolerated and indices map back to original positions
    zxys_nan = zxys.copy()
    zxys_nan[3] = np.nan
    starts2 = DM.contact_correlation_domain_calling(
        zxys_nan, domain_size=5, cand_domain_th=0.2, contact_th=500.0,
        corr_th=0.3)
    assert all(0 <= s < len(zxys) for s in starts2)


def test_iterative_interdomain_calling():
    """Two far-apart domains folded back into contact are called as an
    interacting pair and survive refinement; non-interacting pairs don't."""
    from imageanalysis3_tpu.analysis import structure as ST

    rng = np.random.default_rng(6)
    sizes = [12, 12, 12, 12]
    zxys = _block_polymer(rng, sizes, jump=1500.0)
    # fold domain 3 back onto domain 0 (spatial contact, far in sequence)
    zxys[36:48] = zxys[:12] + rng.normal(0, 60.0, (12, 3))
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    starts = np.array([0, 12, 24, 36])
    pairs = ST.iterative_interdomain_calling(
        dm, starts, init_th=0.55, mean_contact_ratio=0.05,
        contact_th=700.0)
    assert (0, 3) in pairs, pairs
    assert (0, 2) not in pairs and (1, 3) not in pairs


def test_load_position_file(tmp_path):
    """position.txt stage table (reference
    meta_tools/global_alignments.py:4-9)."""
    from imageanalysis3_tpu.analysis import load_position_file

    p = tmp_path / "position.txt"
    p.write_text("100.5,-200.25\n300.0,400.0\n")
    pos = load_position_file(str(p))
    assert list(pos.columns) == ["x", "y"]
    assert len(pos) == 2 and pos.iloc[1]["x"] == 300.0


def test_find_matched_starts():
    """Manual-vs-automatic boundary matching (reference
    domain_tools/manual.py:262-280)."""
    from imageanalysis3_tpu.analysis import find_matched_starts

    ref = [0, 10, 20, 30]
    got = find_matched_starts([1, 11, 26, 29], ref, dom_sz=5)
    # 1->0, 11->10, 26 matches nothing (|26-30|=4 > 2), 29->30
    assert got.tolist() == [0, 10, 30]
    # multi-match dropped by default, first taken otherwise
    near = find_matched_starts([10], [9, 11], dom_sz=5)
    assert near.tolist() == []
    near2 = find_matched_starts([10], [9, 11], dom_sz=5,
                                ignore_multi_match=False)
    assert near2.tolist() == [9]


def test_winsorize_and_randomize_and_overlap():
    """Compartment scoring controls (compartment_tools/scoring.py:18-360)."""
    from imageanalysis3_tpu.analysis import (winsorize, randomize_index_dict,
                                             density_overlaps)
    s = np.concatenate([np.arange(100.0), [np.nan]])
    w = winsorize(s, 5, 5)
    assert np.isnan(w[-1])
    finite = w[np.isfinite(w)]
    assert finite.min() == pytest.approx(np.percentile(np.arange(100.0), 5))
    assert finite.max() == pytest.approx(np.percentile(np.arange(100.0), 95))
    wn = winsorize(s, 5, 5, normalize=True)
    assert np.nanmin(wn) == 0.0 and np.nanmax(wn) == pytest.approx(1.0)

    rng = np.random.default_rng(3)
    d = {"A": np.arange(10), "B": np.arange(10, 25)}
    sf = randomize_index_dict(d, rng=rng)
    assert len(sf["A"]) == 10 and len(sf["B"]) == 15
    np.testing.assert_array_equal(
        np.sort(np.concatenate([sf["A"], sf["B"]])), np.arange(25))
    with pytest.raises(KeyError):
        randomize_index_dict({"A": [1]}, rng=rng)

    # identical clouds overlap 1; disjoint clouds overlap 0
    d1 = np.zeros((4, 4, 4)); d1[0] = 1.0
    d2 = np.zeros((4, 4, 4)); d2[2] = 1.0
    assert density_overlaps(d1, d1) == pytest.approx(1.0)
    assert density_overlaps(d1, d2) == pytest.approx(0.0)
