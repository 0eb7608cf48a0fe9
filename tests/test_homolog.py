"""Homolog assignment: two planted homolog traces recovered from merged
decoded groups, and parity of the full five-metric E/M against a NumPy
transliteration of the reference algorithm (classes/decode.py:694-2213).
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.decode import homolog as H


def _two_homolog_cell(rng, n_regions=25, step=250.0, sep=6000.0):
    """Two random-walk homolog traces, merged group table with noise."""
    base_a = np.array([2000.0, 4000.0, 4000.0])
    base_b = base_a + np.array([0.0, sep, sep])
    tr_a = base_a + np.cumsum(rng.normal(0, step / np.sqrt(3),
                                         (n_regions, 3)), axis=0)
    tr_b = base_b + np.cumsum(rng.normal(0, step / np.sqrt(3),
                                         (n_regions, 3)), axis=0)
    cents, rids, truth = [], [], []
    for r in range(n_regions):
        for t, tr in ((0, tr_a), (1, tr_b)):
            cents.append(tr[r] + rng.normal(0, 50, 3))
            rids.append(r)
            truth.append(t)
    # decoys: far-flung false groups
    for _ in range(10):
        cents.append(rng.uniform(15000, 30000, 3))
        rids.append(int(rng.integers(0, n_regions)))
        truth.append(-1)
    return (np.asarray(cents, np.float32), np.asarray(rids, np.int32),
            np.asarray(truth), tr_a, tr_b)


def _group_features(rng, cents, truth):
    """Per-group intensity/CV/internal-distance features: planted groups
    bright, tight, and consistent; decoys dim and loose."""
    g = len(cents)
    real = truth >= 0
    ints = np.where(real, rng.uniform(900, 1500, g),
                    rng.uniform(400, 800, g)).astype(np.float32)
    cv = np.where(real, rng.uniform(0.05, 0.2, g),
                  rng.uniform(0.5, 1.0, g)).astype(np.float32)
    inner = np.where(real, rng.uniform(50, 150, g),
                     rng.uniform(300, 600, g)).astype(np.float32)
    n_spots = np.full(g, 3, np.int32)
    member = cents[:, None, :] + rng.normal(0, 30, (g, 3, 3))
    member_ok = np.ones((g, 3), bool)
    return ints, cv, inner, n_spots, member.astype(np.float32), member_ok


def test_init_homolog_centers_separates():
    rng = np.random.default_rng(0)
    cents, rids, truth, tr_a, tr_b = _two_homolog_cell(rng)
    valid = truth >= 0
    c1, c2 = H.init_homolog_centers(jnp.asarray(cents), jnp.asarray(rids),
                                    jnp.asarray(valid))
    c1, c2 = np.asarray(c1), np.asarray(c2)
    ma, mb = tr_a.mean(0), tr_b.mean(0)
    d_same = min(np.linalg.norm(c1 - ma) + np.linalg.norm(c2 - mb),
                 np.linalg.norm(c1 - mb) + np.linalg.norm(c2 - ma))
    # both centers land on distinct homolog territories
    assert np.linalg.norm(c1 - c2) > 3000.0
    assert d_same < 6000.0


def _run_assign(cents, rids, truth, rng, n_regions, **kw):
    g = len(cents)
    ints, cv, inner, n_spots, member, member_ok = _group_features(
        rng, cents, truth)
    valid = np.ones(g, bool)
    init = jnp.asarray(np.stack([
        cents[truth == 0].mean(0) + rng.normal(0, 500, 3),
        cents[truth == 1].mean(0) + rng.normal(0, 500, 3)]), jnp.float32)
    res = H.assign_groups_to_homologs(
        jnp.asarray(cents), jnp.asarray(ints), jnp.asarray(cv),
        jnp.asarray(inner), jnp.asarray(rids), jnp.asarray(n_spots),
        jnp.asarray(valid), jnp.asarray(member), jnp.asarray(member_ok),
        init, n_regions=n_regions, **kw)
    return res, (ints, cv, inner, n_spots, member, member_ok, valid, init)


def test_assign_groups_recovers_homolog_traces():
    rng = np.random.default_rng(1)
    cents, rids, truth, tr_a, tr_b = _two_homolog_cell(rng)
    n_regions = 25
    res, _ = _run_assign(cents, rids, truth, rng, n_regions)
    flags = np.asarray(res.flags)
    # orientation: homolog 0 should correspond to one of the planted traces
    f_a = flags[truth == 0]
    f_b = flags[truth == 1]
    maj_a = np.bincount(f_a[f_a >= 0], minlength=2).argmax()
    maj_b = 1 - maj_a
    acc_a = (f_a == maj_a).mean()
    acc_b = (f_b == maj_b).mean()
    assert acc_a >= 0.9 and acc_b >= 0.9, (acc_a, acc_b)
    # traces summarize per region
    zxys = np.asarray(res.zxys)
    okz = np.asarray(res.zxys_valid)
    assert zxys.shape == (2, n_regions, 3)
    tr = {maj_a: tr_a, maj_b: tr_b}
    for hh in (0, 1):
        err = np.linalg.norm(np.where(okz[hh][:, None], zxys[hh]
                                      - tr[hh], 0.0), axis=1)
        assert okz[hh].mean() >= 0.85
        assert np.median(err[okz[hh]]) < 200.0
    # member-spot coordinates back the trace: their mean is the zxy
    mem = np.asarray(res.member_zxys)
    mok = np.asarray(res.member_ok)
    sel = np.asarray(res.sel_group)
    for hh in (0, 1):
        for r in range(n_regions):
            if okz[hh, r]:
                assert sel[hh, r] >= 0
                assert mok[hh, r].sum() == 3
                got = np.nanmean(mem[hh, r], axis=0)
                want = cents[sel[hh, r]]
                assert np.linalg.norm(got - want) < 60.0


# ---------------------------------------------------------------------------
# Parity vs a NumPy transliteration of the reference E/M
# ---------------------------------------------------------------------------


def _np_reference_em(centroids, mean_int, cv_int, d_int, rindex, n_spots,
                     valid, init_centers, n_regions,
                     weights=np.ones(5), score_th_percentile=1.0,
                     max_iters=10, n_neighbors=10, flag_diff_th=0.005):
    """Transliteration of the reference NEW assignment path:
    generate_score_metrics (decode.py:1900-1995) + cdf_scores (:2018-2027)
    + generate_scores/summarize_score (:2029-2070) +
    assign_spot_groups_2_homologs (:1598-1662) looped as
    iterative_assign_spot_groups_2_homologs (:951-1023)."""
    from scipy.spatial import cKDTree
    from scipy import stats

    g = len(centroids)
    h = len(init_centers)
    pts = centroids[valid]
    chr_tree = cKDTree(pts)

    def nb_dists(tree):
        if tree.n < n_neighbors:
            return np.full(g, np.nan)
        d, _ = tree.query(centroids, n_neighbors)
        return d.mean(1)

    chr_nb = nb_dists(chr_tree)
    flags = np.full(g, -1)
    centers = np.array(init_centers, float).copy()
    homolog_trees = [None] * h        # None -> fall back to chr tree
    it = 0
    diff = 1.0
    while it < max_iters and diff >= flag_diff_th:
        # --- metrics (G, H, 5)
        metrics = np.full((g, h, 5), np.nan)
        metrics[:, :, 0] = mean_int[:, None]
        metrics[:, :, 1] = cv_int[:, None]
        metrics[:, :, 2] = d_int[:, None]
        for hh in range(h):
            tree = homolog_trees[hh]
            metrics[:, hh, 3] = chr_nb if tree is None else nb_dists(tree)
            metrics[:, hh, 4] = np.linalg.norm(
                centroids - centers[hh], axis=1)
        # --- weak-CDF scores over the (valid group, homolog) population
        greater = [True, False, False, False, False]
        finals = np.zeros((g, h))
        for m in range(5):
            refs = metrics[valid][:, :, m].ravel()
            n = len(refs)
            scores = np.full((g, h), np.nan)
            for gi in range(g):
                for hh in range(h):
                    v = metrics[gi, hh, m]
                    if np.isnan(v):
                        continue
                    pct = np.sum(refs[~np.isnan(refs)] <= v) / n
                    cdf = (pct + 0.5 / n if greater[m]
                           else 1 - pct + 0.5 / n)
                    scores[gi, hh] = np.log(cdf)
            finals += np.nan_to_num(weights[m] * scores, nan=0.0)
        finals /= np.maximum(n_spots, 1)[:, None]
        finals = np.where(valid[:, None], finals, -np.inf)
        # --- M-step
        score_th = stats.scoreatpercentile(
            finals[valid].ravel(), score_th_percentile)
        pref = np.argmax(finals, axis=1)
        pref_score = np.max(finals, axis=1)
        new_flags = np.full(g, -1)
        trace = np.full((h, n_regions, 3), np.nan)
        for hh in range(h):
            for r in range(n_regions):
                cand = np.where(valid & (pref == hh) & (rindex == r))[0]
                if len(cand) == 0:
                    continue
                best = cand[np.argmax(pref_score[cand])]
                if pref_score[best] >= score_th:
                    new_flags[best] = hh
                    trace[hh, r] = centroids[best]
        # --- centers: median of flagged centroids
        for hh in range(h):
            m = new_flags == hh
            if np.any(m):
                centers[hh] = np.median(centroids[m], axis=0)
        # --- rebuild homolog trees from the trace
        for hh in range(h):
            ok = ~np.isnan(trace[hh]).any(1)
            homolog_trees[hh] = cKDTree(trace[hh][ok]) if ok.any() else None
        diff = np.mean((new_flags != flags)[valid])
        flags = new_flags
        it += 1
    return flags, trace, centers


def test_parity_vs_reference_transliteration():
    """>= 95% flag agreement with the NumPy reference E/M on a planted
    two-homolog cell (the round-3 'done' criterion)."""
    rng = np.random.default_rng(7)
    cents, rids, truth, tr_a, tr_b = _two_homolog_cell(rng)
    n_regions = 25
    res, (ints, cv, inner, n_spots, member, member_ok, valid, init) = \
        _run_assign(cents, rids, truth, rng, n_regions)
    ref_flags, ref_trace, ref_centers = _np_reference_em(
        cents.astype(float), ints.astype(float), cv.astype(float),
        inner.astype(float), rids, n_spots, valid, np.asarray(init),
        n_regions)
    flags = np.asarray(res.flags)
    agree = (flags == ref_flags).mean()
    assert agree >= 0.95, (agree, flags, ref_flags)
    # traces agree wherever both picked
    both = ~np.isnan(ref_trace).any(-1) & np.asarray(res.zxys_valid)
    assert both.sum() > 0.8 * 2 * n_regions
    d = np.linalg.norm(np.asarray(res.zxys)[both] - ref_trace[both],
                       axis=-1)
    assert np.nanmax(d) < 1.0, d.max()
    # centers agree
    assert np.linalg.norm(np.asarray(res.centers) - ref_centers,
                          axis=1).max() < 50.0


def test_decode_chromosome_homologs_front_door():
    """SpotGroups-shaped input through the host front door."""
    from imageanalysis3_tpu.decode.merfish import SpotGroups

    rng = np.random.default_rng(2)
    n_regions = 15
    cents, rids, truth, tr_a, tr_b = _two_homolog_cell(
        rng, n_regions=n_regions)
    g = len(cents)
    # synthesize spots: each group = 3 spots around its centroid
    px = np.array([200.0, 108.0, 108.0])
    spots = np.zeros((g * 3, 11), np.float32)
    spot_idx = np.full((g, 4), -1, np.int32)
    for k in range(g):
        for j in range(3):
            spots[k * 3 + j, 1:4] = (cents[k] + rng.normal(0, 40, 3)) / px
            spots[k * 3 + j, 0] = rng.uniform(800, 1500)
        spot_idx[k, :3] = np.arange(k * 3, k * 3 + 3)
    groups = SpotGroups(
        spot_idx=jnp.asarray(spot_idx),
        region=jnp.asarray(rids + 100),
        n_spots=jnp.full(g, 3, jnp.int32),
        ok=jnp.ones(g, bool),
        spot_usage=jnp.zeros(g * 3, jnp.int32))
    res = H.decode_chromosome_homologs(groups, spots, rids + 100)
    assert np.asarray(res.zxys).shape[1] == n_regions
    flags = np.asarray(res.flags)
    real = truth >= 0
    assert (flags[real] >= 0).mean() > 0.7
    # member spots of picked cells are real candidate coordinates
    mem = np.asarray(res.member_zxys)
    okz = np.asarray(res.zxys_valid)
    sel = np.asarray(res.sel_group)
    hh, rr = np.argwhere(okz)[0]
    got = mem[hh, rr][np.asarray(res.member_ok)[hh, rr]]
    want = spots[spot_idx[sel[hh, rr], :3], 1:4] * px
    assert np.allclose(np.sort(got, 0), np.sort(want, 0), atol=0.5)


def test_kmeans_init_three_homologs():
    rng = np.random.default_rng(3)
    pts = np.concatenate([rng.normal(c, 200, (30, 3)) for c in
                          ([0, 0, 0], [8000, 0, 0], [0, 8000, 0])])
    centers = H.init_centers_kmeans(pts.astype(np.float32),
                                    np.ones(len(pts), bool), 3)
    want = np.array([[0, 0, 0], [8000, 0, 0], [0, 8000, 0]], float)
    d = np.linalg.norm(centers[:, None] - want[None], axis=-1)
    # each true cluster center matched by exactly one k-means center
    assert (d.min(0) < 300).all()
