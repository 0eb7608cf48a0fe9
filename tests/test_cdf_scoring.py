"""CDF-metric scoring, merge/assign utilities vs NumPy transliterations.

Behavior targets: reference spot_tools/scoring.py:6-107 (metric='cdf'
branches, _cum_prob), :217-305 (ref_dist_metric='cdf'), :411-546
(radius_of_gyration, chromosomal_spot_scores, Normalize_Intensities,
generate_cdf_scores, log/exp distance scores) and
spot_tools/picking.py:662-795 (merge_spot_list,
assign_spots_to_chromosomes).
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.decode import scoring as S
from imageanalysis3_tpu.decode import picking as P

PX = np.array([200.0, 108.0, 108.0])
RNG = np.random.default_rng


# --- NumPy transliterations of the reference semantics ------------------


def _np_cum_prob(data, targets, vmin=-np.inf, vmax=np.inf):
    data = np.asarray(data, float)
    data = data[~np.isnan(data)]
    t = np.array(targets, float)
    t[np.isnan(t)] = np.inf
    n = len(data)
    p = np.array([np.sum(data <= v) / n for v in t.ravel()])
    min_p = np.sum(data <= vmin) / n
    max_p = np.sum(data <= vmax) / n
    if max_p <= min_p:
        p = p - min_p
    else:
        p = (p - min_p) / (max_p - min_p)
    return np.clip(p, 0, 1).reshape(np.shape(targets))


def _np_cdf_distance_score(dist, ref, w=1.0, limits=(-np.inf, np.inf),
                           nan_mask=-1000.0):
    surv = 1 - _np_cum_prob(ref, dist, min(limits), max(limits))
    out = np.where(surv > 0, np.log(np.maximum(surv, 1e-300)) * w, -np.inf)
    return np.where(np.isnan(dist), nan_mask, out)


def _np_cdf_intensity_score(ints, ref, w=1.0, th=0.0, nan_mask=0.0,
                            inf_mask=-1000.0):
    p = _np_cum_prob(ref, ints, vmin=th)
    out = np.where(p > 0, np.log(np.maximum(p, 1e-300)) * w, -np.inf)
    out = np.where(np.isnan(out), nan_mask, out)
    return np.where(np.isinf(out), inf_mask, out)


def test_cum_prob_matches_transliteration():
    rng = RNG(0)
    ref = rng.uniform(0, 50, 101)
    ref[::7] = np.nan              # force +inf padding in the sorted row
    row, cnt = S.sort_ref_values(jnp.asarray(ref, jnp.float32))
    assert int(cnt) < len(ref)
    targets = np.concatenate([rng.uniform(-10, 60, 40), [np.nan]])
    for vmin, vmax in [(-np.inf, np.inf), (5.0, np.inf), (5.0, 40.0),
                       (60.0, 70.0)]:
        got = np.asarray(S.cum_prob(row, cnt,
                                    jnp.asarray(targets, jnp.float32),
                                    vmin=vmin, vmax=vmax))
        want = _np_cum_prob(ref, targets, vmin, vmax)
        assert np.allclose(got, want, atol=1e-5)


def test_cdf_scores_match_transliteration():
    rng = RNG(1)
    ref = rng.uniform(100, 2000, 77)
    row, cnt = S.sort_ref_values(jnp.asarray(ref, jnp.float32))
    d = np.concatenate([rng.uniform(0, 2500, 30), [np.nan]])
    got = np.asarray(S.cdf_distance_score(
        jnp.asarray(d, jnp.float32), row, cnt, weight=1.5,
        distance_limits=(0.0, np.inf)))
    want = _np_cdf_distance_score(d, ref, 1.5, (0.0, np.inf))
    fin = np.isfinite(want)
    assert np.allclose(got[fin], want[fin], rtol=1e-4, atol=1e-4)
    assert np.array_equal(np.isneginf(got), np.isneginf(want))

    ints = np.concatenate([rng.uniform(0, 3000, 30), [np.nan]])
    got_i = np.asarray(S.cdf_intensity_score(
        jnp.asarray(ints, jnp.float32), row, cnt, weight=2.0,
        intensity_th=150.0))
    want_i = _np_cdf_intensity_score(ints, ref, 2.0, 150.0)
    assert np.allclose(got_i, want_i, rtol=1e-4, atol=1e-4)


def test_radius_of_gyration():
    rng = RNG(2)
    zxys = rng.normal(0, 100, (40, 3))
    got = float(S.radius_of_gyration(jnp.asarray(zxys, jnp.float32)))
    rs = np.linalg.norm(zxys - zxys.mean(0), axis=1)
    assert abs(got - np.sqrt((rs ** 2).mean())) < 1e-2
    # NaN rows ignored
    zxys2 = zxys.copy()
    zxys2[3] = np.nan
    got2 = float(S.radius_of_gyration(jnp.asarray(zxys2, jnp.float32)))
    keep = np.ones(40, bool)
    keep[3] = False
    rs2 = np.linalg.norm(zxys[keep] - zxys[keep].mean(0), axis=1)
    assert abs(got2 - np.sqrt((rs2 ** 2).mean())) < 1e-2


def test_generate_cdf_scores_matches_percentileofscore():
    from scipy import stats
    rng = RNG(3)
    pos = rng.uniform(0, 10, 53)
    neg = rng.uniform(5, 15, 31)
    vals = rng.uniform(-1, 16, 25)
    pr, pc = S.sort_ref_values(jnp.asarray(pos, jnp.float32))
    nr, nc = S.sort_ref_values(jnp.asarray(neg, jnp.float32))
    got = np.asarray(S.generate_cdf_scores(
        jnp.asarray(vals, jnp.float32), pr, pc, nr, nc))
    pos_cdf = np.log([stats.percentileofscore(pos, v, kind="weak") / 100
                      + 0.5 / len(pos) for v in vals])
    neg_cdf = np.log([1 - stats.percentileofscore(neg, v, kind="weak")
                      / 100 + 0.5 / len(neg) for v in vals])
    want = (pos_cdf - np.log(0.5 / len(pos))
            - (neg_cdf - np.log(0.5 / len(neg))))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4)
    got_pos = np.asarray(S.generate_cdf_scores(
        jnp.asarray(vals, jnp.float32), pr, pc))
    assert np.allclose(got_pos, pos_cdf - np.log(0.5 / len(pos)),
                       rtol=1e-4, atol=1e-4)


def test_log_exp_distance_scores_and_normalize():
    v = np.array([0.0, 500.0, 2000.0, 4000.0])
    assert np.allclose(np.asarray(S.log_distance_scores(v)),
                       np.log(v / 2000 + 1), rtol=1e-5)
    assert np.allclose(np.asarray(S.exp_distance_scores(v)),
                       -np.exp(v / 2000), rtol=1e-5)
    spots = np.zeros((5, 11), np.float32)
    spots[:, 0] = [10, 20, 30, 40, 50]
    out = np.asarray(S.normalize_intensities(
        jnp.asarray(spots), jnp.asarray(spots[:, 0])))
    assert np.allclose(out[:, 0], spots[:, 0] / 30.0)


def _np_chromosomal_scores(cand, valid, sel, sel_ok, local_size=5,
                           intensity_th=1.0):
    """Transliteration: flat-spot scoring with cdf refs from sel trace."""
    r, m = valid.shape
    sel_zxys = sel[:, 1:4] * PX
    sel_zxys = np.where(sel_ok[:, None], sel_zxys, np.nan)
    center = np.nanmean(sel_zxys[sel_ok], axis=0)
    # references from the selected trace
    ct_ref = np.linalg.norm(sel_zxys - center, axis=1)[sel_ok]
    half = (local_size - 1) // 2
    lc_ref = []
    for i in range(r):
        if not sel_ok[i]:
            continue
        win = [j for j in range(max(0, i - half), min(r, i + half + 1))
               if j != i and sel_ok[j]]
        if win:
            lc_ref.append(np.linalg.norm(
                sel_zxys[win].mean(0) - sel_zxys[i]))
    nb_ref = [np.linalg.norm(sel_zxys[i + 1] - sel_zxys[i])
              for i in range(r - 1) if sel_ok[i] and sel_ok[i + 1]]
    int_ref = sel[sel_ok, 0]
    int_ref = int_ref[int_ref > intensity_th]

    scores = np.zeros((r, m, 4))
    cz = cand[..., 1:4] * PX
    for i in range(r):
        half_w = [j for j in range(max(0, i - half), min(r, i + half + 1))
                  if j != i and sel_ok[j]]
        lc_ct = (sel_zxys[half_w].mean(0) if half_w else None)
        # candidate-cloud neighbor targets
        nxt = [cz[i + 1, k] for k in range(m)
               if i + 1 < r and valid[i + 1, k]]
        prv = [cz[i - 1, k] for k in range(m) if i >= 1 and valid[i - 1, k]]
        for k in range(m):
            if not valid[i, k]:
                continue
            ct_d = np.linalg.norm(cz[i, k] - center)
            scores[i, k, 0] = _np_cdf_distance_score(
                np.array([ct_d]), ct_ref, limits=(0, np.inf))[0]
            lc_d = (np.linalg.norm(cz[i, k] - lc_ct)
                    if lc_ct is not None else np.nan)
            scores[i, k, 1] = _np_cdf_distance_score(
                np.array([lc_d]), lc_ref, limits=(0, np.inf))[0]
            if nxt:
                fwd = np.median([np.linalg.norm(cz[i, k] - q) for q in nxt])
                rev = (np.median([np.linalg.norm(cz[i, k] - q)
                                  for q in prv]) if prv else np.nan)
                nb_d = np.nanmean([fwd, rev])
            else:
                nb_d = np.nan
            scores[i, k, 2] = _np_cdf_distance_score(
                np.array([nb_d]), nb_ref, limits=(0, np.inf))[0]
            scores[i, k, 3] = _np_cdf_intensity_score(
                np.array([cand[i, k, 0]]), int_ref, th=intensity_th)[0]
    return scores


def test_chromosomal_spot_scores_matches_transliteration():
    rng = RNG(4)
    r, m = 24, 3
    sel = np.zeros((r, 11), np.float32)
    sel_ok = rng.uniform(size=r) > 0.15
    trace = np.cumsum(rng.normal(0, 2.0, (r, 3)), 0) + 50
    sel[:, 1:4] = trace
    sel[:, 0] = rng.uniform(500, 1500, r)
    cand = np.zeros((r, m, 11), np.float32)
    valid = rng.uniform(size=(r, m)) > 0.3
    cand[..., 1:4] = trace[:, None] + rng.normal(0, 3.0, (r, m, 3))
    cand[..., 0] = rng.uniform(300, 2000, (r, m))

    ct_s, lc_s, nb_s, int_s = S.chromosomal_spot_scores(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(sel),
        jnp.asarray(sel_ok), local_size=5, intensity_th=1.0,
        return_separate=True)
    want = _np_chromosomal_scores(cand, valid, sel, sel_ok)
    got = np.stack([np.asarray(ct_s), np.asarray(lc_s),
                    np.asarray(nb_s), np.asarray(int_s)], axis=-1)
    v = valid[..., None] & np.isfinite(want) & (want > -999)
    assert np.allclose(got[v], want[v], rtol=1e-3, atol=2e-3)
    # -inf / masked agreement on valid slots
    neg = valid[..., None] & np.isneginf(want)
    assert np.all(np.isneginf(got[neg]) | (got[neg] < -20))


def _np_merge_spot_list(spots, dist_th, intensity_th, hard, n_lists):
    kept = np.ones(len(spots), bool)
    ints = spots[:, 0]
    if hard:
        kept &= ints >= intensity_th
    else:
        top = np.argsort(ints)[-max(n_lists, int(np.sum(
            ints >= intensity_th))):]
        mask = np.zeros(len(spots), bool)
        mask[top] = True
        kept &= mask
    for i in range(len(spots)):
        if kept[i]:
            d = np.linalg.norm(spots[:, 1:4] - spots[i, 1:4], axis=1)
            flag = d < dist_th
            flag[i] = False
            kept[flag] = False
    return kept


def test_merge_spot_lists_matches_transliteration():
    rng = RNG(5)
    n = 60
    spots = np.zeros((n, 11), np.float32)
    # clusters of near-duplicates from 3 "lists"
    base = rng.uniform(0, 50, (20, 3))
    spots[:, 1:4] = np.concatenate([base + rng.normal(0, 0.02, (20, 3))
                                    for _ in range(3)])
    spots[:, 0] = rng.uniform(50, 500, n)
    for hard in (True, False):
        got = np.asarray(P.merge_spot_lists(
            jnp.asarray(spots), jnp.ones(n, bool), dist_th=0.1,
            intensity_th=100.0, hard_intensity_th=hard, n_lists=3))
        want = _np_merge_spot_list(spots, 0.1, 100.0, hard, 3)
        assert np.array_equal(got, want)
    # each surviving cluster keeps exactly one member (hard mode, th=0)
    got0 = np.asarray(P.merge_spot_lists(
        jnp.asarray(spots), jnp.ones(n, bool), dist_th=0.1,
        intensity_th=0.0))
    assert got0.sum() == 20


def test_assign_spots_to_chromosomes():
    rng = RNG(6)
    chrom = np.array([[10, 10, 10], [40, 40, 40]], np.float32)
    spots = np.zeros((8, 11), np.float32)
    spots[:, 1:4] = np.concatenate([
        chrom[0] + rng.normal(0, 1, (5, 3)),
        chrom[1] + rng.normal(0, 1, (3, 3))])
    valid = np.ones(8, bool)
    valid[7] = False
    got = np.asarray(P.assign_spots_to_chromosomes(
        jnp.asarray(spots), jnp.asarray(valid), jnp.asarray(chrom)))
    assert np.array_equal(got[:5], np.zeros(5))
    assert np.array_equal(got[5:7], np.ones(2))
    assert got[7] == -1
