"""Decode-layer pickers: scoring, DP chain, EM — vs truth and brute force.

Behavior targets: reference spot_tools/scoring.py (linear metric scores,
reference stats) and spot_tools/picking.py:902-1530 (dynamic + EM pickers).
"""

import itertools

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.decode import picking as P
from imageanalysis3_tpu.decode import scoring as S

PX = np.array([200.0, 108.0, 108.0])


def _polymer_trace(n, rng, step_nm=300.0, start=(2000, 5000, 5000)):
    """Random-walk chromosome trace in nm."""
    steps = rng.normal(0, step_nm / np.sqrt(3), size=(n, 3))
    return np.asarray(start) + np.cumsum(steps, axis=0)


def _make_cell(rng, n_regions=40, n_decoys=3, drop_frac=0.15,
               decoy_spread_nm=4000.0):
    """Candidate table with a planted trace + bright decoys; some regions
    empty.  Returns (cand, valid, ids, truth_idx (R,), truth mask)."""
    zxys = _polymer_trace(n_regions, rng)
    m = n_decoys + 1
    cand = np.zeros((n_regions, m, 11), np.float32)
    valid = np.zeros((n_regions, m), bool)
    truth_idx = np.zeros(n_regions, np.int64)
    kept = np.ones(n_regions, bool)
    center = zxys.mean(0)
    for i in range(n_regions):
        if rng.uniform() < drop_frac:
            kept[i] = False
            continue
        slot = rng.integers(0, m)
        truth_idx[i] = slot
        for j in range(m):
            if j == slot:
                pos_nm = zxys[i] + rng.normal(0, 30.0, 3)
                h = rng.uniform(800, 1500)
            else:
                pos_nm = center + rng.normal(0, decoy_spread_nm, 3)
                h = rng.uniform(800, 2500)   # decoys can be brighter
            cand[i, j, 0] = h
            cand[i, j, 1:4] = pos_nm / PX
            valid[i, j] = True
    ids = np.arange(n_regions, dtype=np.int32)
    return cand, valid, ids, truth_idx, kept


def test_local_centers_matches_naive():
    rng = np.random.default_rng(0)
    zxys = rng.normal(size=(12, 3)).astype(np.float32)
    valid = rng.uniform(size=12) > 0.3
    got_c, got_has = S.local_centers(jnp.asarray(zxys), jnp.asarray(valid),
                                     local_size=5)
    for i in range(12):
        idx = [j for j in range(max(0, i - 2), min(12, i + 3))
               if j != i and valid[j]]
        if idx:
            assert bool(got_has[i])
            np.testing.assert_allclose(np.asarray(got_c[i]),
                                       zxys[idx].mean(0), rtol=1e-5)
        else:
            assert not bool(got_has[i])


def test_ref_stats_medians():
    rng = np.random.default_rng(1)
    zxys = _polymer_trace(30, rng)
    spots = np.zeros((30, 11), np.float32)
    spots[:, 1:4] = zxys / PX
    spots[:, 0] = rng.uniform(500, 1500, 30)
    valid = np.ones(30, bool)
    refs = S.chromosome_ref_stats(jnp.asarray(spots), jnp.asarray(valid))
    ct = np.linalg.norm(zxys - zxys.mean(0), axis=1)
    np.testing.assert_allclose(float(refs.ct_dist), np.median(ct), rtol=0.01)
    nb = np.linalg.norm(np.diff(zxys, axis=0), axis=1)
    np.testing.assert_allclose(float(refs.nb_dist), np.median(nb), rtol=0.01)
    np.testing.assert_allclose(float(refs.intensity),
                               np.median(spots[:, 0]), rtol=0.01)


def test_dynamic_pick_matches_brute_force():
    """DP result equals exhaustive search of the same objective."""
    rng = np.random.default_rng(2)
    r_regions, m = 6, 3
    cand = np.zeros((r_regions, m, 11), np.float32)
    cand[..., 1:4] = rng.uniform(0, 60, size=(r_regions, m, 3))
    valid = np.ones((r_regions, m), bool)
    valid[2, 1:] = False           # region with a single candidate
    scores = rng.normal(0, 2, size=(r_regions, m)).astype(np.float32)
    ids = np.array([0, 1, 2, 4, 5, 6], np.int32)   # one id gap
    nb_ref, w_nb, lim = 500.0, 2.0, 3000.0

    sel, total = P.dynamic_pick_spots(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(scores),
        jnp.asarray(ids), jnp.float32(nb_ref), w_nbdist=w_nb,
        max_distance_limit=lim)

    def objective(combo):
        tot, prev = 0.0, None
        for i, c in enumerate(combo):
            if not valid[i, c]:
                return -np.inf
            tot += scores[i, c]
            if prev is not None:
                pi, pc = prev
                d = np.linalg.norm((cand[i, c, 1:4] - cand[pi, pc, 1:4]) * PX)
                gap = max(abs(float(ids[i]) - float(ids[pi])), 1.0)
                ref = max(nb_ref, 1e-6)
                s = -w_nb * d / ref - w_nb * max(d - lim, 0.0) / ref
                tot += s / gap
            prev = (i, c)
        return tot

    best_combo, best_val = None, -np.inf
    for combo in itertools.product(range(m), repeat=r_regions):
        v = objective(combo)
        if v > best_val:
            best_val, best_combo = v, combo
    np.testing.assert_allclose(float(total), best_val, rtol=1e-4)
    assert tuple(np.asarray(sel)) == best_combo


def test_em_beats_naive_and_recovers_truth():
    rng = np.random.default_rng(3)
    cand, valid, ids, truth_idx, kept = _make_cell(rng)

    res = P.em_pick_spots(jnp.asarray(cand), jnp.asarray(valid),
                          jnp.asarray(ids))
    sel = np.asarray(res.sel_idx)
    em_correct = np.mean(sel[kept] == truth_idx[kept])

    naive_sel = np.argmax(np.where(valid, cand[..., 0], -np.inf), axis=1)
    naive_correct = np.mean(naive_sel[kept] == truth_idx[kept])

    assert em_correct >= 0.9, f"EM only {em_correct:.2f} correct"
    assert em_correct >= naive_correct
    # unkept regions are reported invalid
    assert not np.asarray(res.sel_valid)[~kept].any()
    assert int(res.n_iters) >= 1


def test_em_multi_chromosome_shared_candidates():
    """Two chromosomes, merged candidate pool: each EM run should stay on
    its own homolog's spots (reference chrom_share_spots=True mode)."""
    rng = np.random.default_rng(4)
    n_regions = 30
    zxys_a = _polymer_trace(n_regions, rng, start=(2000, 3000, 3000))
    zxys_b = _polymer_trace(n_regions, rng, start=(2000, 12000, 12000))
    m = 2
    cand = np.zeros((n_regions, m, 11), np.float32)
    valid = np.ones((n_regions, m), bool)
    for i in range(n_regions):
        cand[i, 0, 0] = rng.uniform(800, 1500)
        cand[i, 0, 1:4] = (zxys_a[i] + rng.normal(0, 30, 3)) / PX
        cand[i, 1, 0] = rng.uniform(800, 1500)
        cand[i, 1, 1:4] = (zxys_b[i] + rng.normal(0, 30, 3)) / PX
    ids = np.arange(n_regions, dtype=np.int32)
    centers = np.stack([zxys_a.mean(0) / PX, zxys_b.mean(0) / PX])

    res = P.em_pick_spots_for_chromosomes(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids), centers)
    sel = np.asarray(res.sel_idx)
    assert (sel[0] == 0).mean() >= 0.95
    assert (sel[1] == 1).mean() >= 0.95


def test_build_candidate_table():
    spots = {
        7: np.random.default_rng(0).uniform(size=(3, 11)),
        2: np.zeros((0, 11)),
        5: np.random.default_rng(1).uniform(size=(6, 11)),
    }
    cand, valid, ids = P.build_candidate_table(spots, capacity=4)
    assert list(ids) == [2, 5, 7]
    assert cand.shape == (3, 4, 11)
    assert valid[0].sum() == 0
    assert valid[1].sum() == 4          # capped at capacity, brightest kept
    assert valid[2].sum() == 3
    full = np.sort(spots[5][:, 0])[::-1][:4]
    np.testing.assert_allclose(np.sort(cand[1, :, 0])[::-1],
                               np.sort(full)[::-1], rtol=1e-6)


def test_score_candidates_matches_reference_transliteration():
    """E-step scores equal a NumPy transliteration of the reference's
    linear-metric spot_score_in_chromosome (spot_tools/scoring.py:306-410
    with distance_score :23-30 and intensity_score :63-66)."""
    rng = np.random.default_rng(9)
    r, m = 12, 3
    sel = np.zeros((r, 11), np.float32)
    sel[:, 1:4] = rng.uniform(10, 50, (r, 3))
    sel[:, 0] = rng.uniform(500, 1500, r)
    sel_valid = np.ones(r, bool)
    cand = np.zeros((r, m, 11), np.float32)
    cand[..., 1:4] = rng.uniform(10, 50, (r, m, 3))
    cand[..., 0] = rng.uniform(100, 2000, (r, m))
    valid = np.ones((r, m), bool)
    w_ct, w_lc, w_int = 2.0, 1.0, 1.0
    limit = 3000.0
    local_size = 5

    got = np.asarray(S.score_candidates(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(sel),
        jnp.asarray(sel_valid), None, None, (200.0, 108.0, 108.0),
        local_size, w_ct, w_lc, w_int, limit))

    # --- NumPy transliteration of the reference linear metric
    px = np.array([200.0, 108.0, 108.0])
    sel_z = sel[:, 1:4] * px
    center = sel_z.mean(0)

    # reference stats (generate_ref_from_chromosome, median metric)
    ct_ref = np.median(np.linalg.norm(sel_z - center, axis=1))
    half = (local_size - 1) // 2
    lc_list, lc_centers = [], {}
    for i in range(r):
        idx = [j for j in range(i - half, i + half + 1)
               if 0 <= j < r and j != i]
        lc_centers[i] = sel_z[idx].mean(0)
        lc_list.append(np.linalg.norm(sel_z[i] - lc_centers[i]))
    lc_ref = np.median(lc_list)
    int_ref = np.median(sel[:, 0])

    def dscore(d, ref, w):
        s = -w * d / ref
        s = s - w * np.maximum(d - limit, 0) / ref
        return s

    want = np.zeros((r, m))
    for i in range(r):
        for k in range(m):
            z = cand[i, k, 1:4] * px
            ct = np.linalg.norm(z - center)
            lc = np.linalg.norm(z - lc_centers[i])
            ints = cand[i, k, 0]
            want[i, k] = (dscore(ct, ct_ref, w_ct)
                          + dscore(lc, lc_ref, w_lc)
                          + w_int * np.log(ints / (ints + int_ref)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_em_exclusive_contested_candidate():
    """chrom_share_spots=False semantics: when two chromosomes' DPs both
    want the same bright candidate, exactly one wins (the better-scoring
    chromosome) and the loser falls back to its own homolog's spot
    (reference spot-disjoint combination enumeration,
    spot_tools/picking.py:1106-1125)."""
    rng = np.random.default_rng(5)
    n_regions = 24
    zxys_a = _polymer_trace(n_regions, rng, start=(2000, 3000, 3000))
    zxys_b = _polymer_trace(n_regions, rng, start=(2000, 9000, 9000))
    m = 3
    cand = np.zeros((n_regions, m, 11), np.float32)
    valid = np.zeros((n_regions, m), bool)
    contested = 12
    for i in range(n_regions):
        cand[i, 0, 0] = rng.uniform(800, 1500)
        cand[i, 0, 1:4] = (zxys_a[i] + rng.normal(0, 30, 3)) / PX
        cand[i, 1, 0] = rng.uniform(800, 1500)
        cand[i, 1, 1:4] = (zxys_b[i] + rng.normal(0, 30, 3)) / PX
        valid[i, :2] = True
    # region `contested`: only ONE candidate exists, midway between the
    # homologs but slightly closer to A's trace -- both want it
    cand[contested] = 0
    valid[contested] = False
    mid = 0.55 * zxys_a[contested] + 0.45 * zxys_b[contested]
    cand[contested, 2, 0] = 5000.0
    cand[contested, 2, 1:4] = mid / PX
    valid[contested, 2] = True
    ids = np.arange(n_regions, dtype=np.int32)
    centers = np.stack([zxys_a.mean(0) / PX, zxys_b.mean(0) / PX])

    res = P.em_pick_spots_for_chromosomes(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids), centers,
        share_spots=False)
    sel = np.asarray(res.sel_idx)
    sel_valid = np.asarray(res.sel_valid)
    # exactly one chromosome holds the contested spot
    holders = [c for c in range(2)
               if sel_valid[c, contested] and sel[c, contested] == 2]
    assert len(holders) == 1
    # the winner is the chromosome whose trace it sits closer to (A)
    assert holders == [0]
    # no other (region, candidate) is double-assigned
    for i in range(n_regions):
        if sel_valid[0, i] and sel_valid[1, i]:
            assert sel[0, i] != sel[1, i]
    # both chromosomes still track their own traces elsewhere
    others = np.ones(n_regions, bool)
    others[contested] = False
    assert (sel[0][others] == 0).mean() >= 0.9
    assert (sel[1][others] == 1).mean() >= 0.9
    # the resolve rounds settled every contest — no hard invalidations
    assert np.asarray(res.n_unresolved).sum() == 0

    # with zero resolve rounds the same contest CANNOT settle: the loser
    # is hard-invalidated and the surfaced counter reports it
    res0 = P.em_pick_spots_for_chromosomes(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids), centers,
        share_spots=False, n_resolve_rounds=0)
    assert np.asarray(res0.n_unresolved).sum() >= 1
    v0 = np.asarray(res0.sel_valid)
    s0 = np.asarray(res0.sel_idx)
    # still never double-assigned even on the unresolved path
    both = v0[0] & v0[1] & (s0[0] == s0[1])
    assert not both.any()


def test_em_exclusive_matches_shared_when_disjoint():
    """With naturally disjoint homolog candidates, exclusivity must not
    change the result of the shared-mode EM."""
    rng = np.random.default_rng(4)
    n_regions = 20
    zxys_a = _polymer_trace(n_regions, rng, start=(2000, 3000, 3000))
    zxys_b = _polymer_trace(n_regions, rng, start=(2000, 12000, 12000))
    cand = np.zeros((n_regions, 2, 11), np.float32)
    valid = np.ones((n_regions, 2), bool)
    for i in range(n_regions):
        cand[i, 0, 0] = rng.uniform(800, 1500)
        cand[i, 0, 1:4] = (zxys_a[i] + rng.normal(0, 30, 3)) / PX
        cand[i, 1, 0] = rng.uniform(800, 1500)
        cand[i, 1, 1:4] = (zxys_b[i] + rng.normal(0, 30, 3)) / PX
    ids = np.arange(n_regions, dtype=np.int32)
    centers = np.stack([zxys_a.mean(0) / PX, zxys_b.mean(0) / PX])

    shared = P.em_pick_spots_for_chromosomes(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids), centers,
        share_spots=True)
    excl = P.em_pick_spots_for_chromosomes(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids), centers,
        share_spots=False)
    np.testing.assert_array_equal(np.asarray(shared.sel_idx),
                                  np.asarray(excl.sel_idx))
    np.testing.assert_array_equal(np.asarray(shared.sel_valid),
                                  np.asarray(excl.sel_valid))
