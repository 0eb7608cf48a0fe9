"""Population-reference picking vs ragged NumPy transliterations + truth.

Behavior targets: reference spot_tools/picking.py:1567-2279
(pick_spots_by_intensities, chromosome/local center dists,
generate_reference_from_population, cum_val, pick_spots_by_scores,
EM_pick_scores_in_population).
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.decode import population_picking as PP

RNG = np.random.default_rng


def _polymer_trace(n, rng, step_nm=300.0, start=(2000.0, 5000.0, 5000.0)):
    steps = rng.normal(0, step_nm / np.sqrt(3), size=(n, 3))
    return np.asarray(start) + np.cumsum(steps, axis=0)


def _make_population(rng, n_chr=5, n_regions=30, max_cands=4,
                     drop_frac=0.1, decoy_spread_nm=3500.0,
                     decoy_bright=True):
    """(cand (N,R,C,4), valid, ids, truth zxy (N,R,3), truth_idx (N,R))."""
    cand = np.full((n_chr, n_regions, max_cands, 4), np.nan, np.float32)
    valid = np.zeros((n_chr, n_regions, max_cands), bool)
    truth = np.zeros((n_chr, n_regions, 3), np.float64)
    truth_idx = np.full((n_chr, n_regions), -1, np.int64)
    for ci in range(n_chr):
        start = rng.uniform(3000, 9000, 3)
        zxys = _polymer_trace(n_regions, rng, start=start)
        truth[ci] = zxys
        center = zxys.mean(0)
        for ri in range(n_regions):
            if rng.uniform() < drop_frac:
                continue
            n_c = rng.integers(1, max_cands + 1)
            slot = rng.integers(0, n_c)
            truth_idx[ci, ri] = slot
            for j in range(n_c):
                if j == slot:
                    pos = zxys[ri] + rng.normal(0, 30.0, 3)
                    h = rng.uniform(800, 1500)
                else:
                    pos = center + rng.normal(0, decoy_spread_nm, 3)
                    h = (rng.uniform(800, 2500) if decoy_bright
                         else rng.uniform(300, 900))
                cand[ci, ri, j, 0] = h
                cand[ci, ri, j, 1:4] = pos
                valid[ci, ri, j] = True
    return cand, valid, np.arange(n_regions), truth, truth_idx


def _ragged(cand, valid):
    """Dense table -> the reference's per-chromosome ragged lists."""
    out = []
    for ci in range(cand.shape[0]):
        chr_list = []
        for ri in range(cand.shape[1]):
            rows = cand[ci, ri][valid[ci, ri]]
            chr_list.append(rows.astype(np.float64))
        out.append(chr_list)
    return out


# --- ragged NumPy transliterations of the reference semantics ----------


def _np_pick_by_intensities(ragged):
    out = []
    for chr_list in ragged:
        rows = []
        for cands in chr_list:
            if len(cands) == 0:
                rows.append(np.full(4, np.nan))
            else:
                rows.append(cands[np.argmax(cands[:, 0])])
        out.append(np.stack(rows))
    return np.stack(out)


def _np_local_center(picked, ids, rid, neighbor_len):
    sel = (np.abs(ids - ids[rid]) > 0) & (np.abs(ids - ids[rid])
                                          <= neighbor_len)
    nb = picked[sel]
    fin = np.all(np.isfinite(nb), axis=1)
    if fin.sum() == 0:
        return np.full(4, np.nan)
    return nb[fin].mean(0)


def _np_exact_cum(sorted_vals, target):
    """Exact-rank CDF with the module's documented clamps."""
    n = len(sorted_vals)
    if n == 0:
        return 0.5
    if np.isnan(target):
        rank = 0.0
    else:
        rank = float(np.searchsorted(sorted_vals, target, side="left"))
    return float(np.clip(rank, 0.5, max(n - 1, 0.5))) / n


def _np_binary_cum(sorted_vals, target):
    """The reference's capped-binary-search cum_val (:1879-1899)."""
    n = len(sorted_vals)
    lo, hi = 0, n - 1
    it = 0
    mid = 0
    while True:
        mid = (lo + hi) // 2
        if sorted_vals[mid] < target:
            lo = mid
        else:
            hi = mid
        it += 1
        if (hi - lo) < 2 or it > 15:
            break
    return (0.5 if mid == 0 else mid) / float(n)


def _np_references(picked, ids, neighbor_len):
    """Pooled sorted metric populations over all chromosomes."""
    ct_all, lc_all, in_all = [], [], []
    for ci in range(picked.shape[0]):
        rows = picked[ci]
        fin = np.all(np.isfinite(rows), axis=1)
        center = rows[fin, 1:4].mean(0) if fin.any() else np.full(3, np.nan)
        for ri in range(rows.shape[0]):
            if not fin[ri]:
                continue
            in_all.append(rows[ri, 0])
            ct_all.append(np.linalg.norm(rows[ri, 1:4] - center))
            lc = _np_local_center(rows, ids, ri, neighbor_len)
            d = np.linalg.norm(rows[ri, 1:4] - lc[1:4])
            if np.isfinite(d):
                lc_all.append(d)
    return (np.sort(in_all), np.sort(ct_all), np.sort(lc_all))


def _np_scores(cand, valid, ids, picked, refs, neighbor_len,
               cum=_np_exact_cum, cw=1.0, lw=1.0):
    ints_ref, ct_ref, lc_ref = refs
    n_chr, n_reg, n_c = valid.shape
    scores = np.full((n_chr, n_reg, n_c), -np.inf)
    for ci in range(n_chr):
        rows = picked[ci]
        fin = np.all(np.isfinite(rows), axis=1)
        center = rows[fin, 1:4].mean(0)
        for ri in range(n_reg):
            lc = _np_local_center(rows, ids, ri, neighbor_len)
            for j in range(n_c):
                if not valid[ci, ri, j]:
                    continue
                hz = cand[ci, ri, j]
                s = np.log(cum(ints_ref, hz[0]))
                s += cw * np.log(1 - cum(ct_ref,
                                         np.linalg.norm(hz[1:4] - center)))
                d_lc = (np.linalg.norm(hz[1:4] - lc[1:4])
                        if np.all(np.isfinite(lc)) else np.nan)
                s += lw * np.log(1 - cum(lc_ref, d_lc))
                scores[ci, ri, j] = s
    return scores


# --- tests --------------------------------------------------------------


def test_pick_by_intensities_matches_ragged_reference():
    rng = RNG(0)
    cand, valid, ids, _, _ = _make_population(rng)
    got = np.asarray(PP.pick_spots_by_intensities(
        jnp.asarray(cand), jnp.asarray(valid)))
    want = _np_pick_by_intensities(_ragged(cand, valid))
    assert np.allclose(got, want, equal_nan=True, atol=1e-4)


def test_local_center_dists_matches_naive():
    rng = RNG(1)
    cand, valid, ids, _, _ = _make_population(rng, n_chr=1)
    picked = _np_pick_by_intensities(_ragged(cand, valid))[0]
    got = np.asarray(PP.local_center_dists(
        jnp.asarray(cand[0]), jnp.asarray(valid[0]), jnp.asarray(ids),
        jnp.asarray(picked.astype(np.float32)), jnp.asarray(ids),
        neighbor_len=5))
    for ri in range(cand.shape[1]):
        lc = _np_local_center(picked, ids, ri, 5)
        for j in range(cand.shape[2]):
            if not valid[0, ri, j]:
                continue
            want = (np.linalg.norm(cand[0, ri, j, 1:4] - lc[1:4])
                    if np.all(np.isfinite(lc)) else np.nan)
            if np.isnan(want):
                assert np.isnan(got[ri, j])
            else:
                assert abs(got[ri, j] - want) < 1e-2


def test_local_center_dists_channel_gate():
    """With channels, only same-channel refs shape the local center."""
    ids = np.arange(8)
    chans = np.array([0, 1] * 4)
    picked = np.zeros((8, 4), np.float32)
    picked[:, 1] = np.arange(8) * 100.0          # z spreads the refs out
    cand = picked[:, None, :].copy()
    valid = np.ones((8, 1), bool)
    got_split = np.asarray(PP.local_center_dists(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids),
        jnp.asarray(picked), jnp.asarray(ids), neighbor_len=2,
        channels=jnp.asarray(chans)))
    # region 2 (channel 0): same-channel neighbors within +-2 -> ids {0, 4}
    nb = picked[[0, 4], 1:4].mean(0)
    want = np.linalg.norm(picked[2, 1:4] - nb)
    assert abs(got_split[2, 0] - want) < 1e-3
    # without the gate it would be mean of ids {0,1,3,4}
    got_all = np.asarray(PP.local_center_dists(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids),
        jnp.asarray(picked), jnp.asarray(ids), neighbor_len=2))
    nb_all = picked[[0, 1, 3, 4], 1:4].mean(0)
    assert abs(got_all[2, 0] - np.linalg.norm(picked[2, 1:4] - nb_all)) \
        < 1e-3


def test_generate_reference_matches_pooled_transliteration():
    rng = RNG(2)
    cand, valid, ids, _, _ = _make_population(rng)
    picked = _np_pick_by_intensities(_ragged(cand, valid)).astype(
        np.float32)
    ref = PP.generate_reference_from_population(
        jnp.asarray(picked), jnp.asarray(ids), neighbor_len=7)
    want_in, want_ct, want_lc = _np_references(picked, ids, 7)
    for rows, counts, want in [(ref.ints, ref.int_counts, want_in),
                               (ref.ct_dists, ref.ct_counts, want_ct),
                               (ref.local_dists, ref.local_counts,
                                want_lc)]:
        got = np.asarray(rows)[0][: int(counts[0])]
        assert len(got) == len(want)
        assert np.allclose(np.sort(got), want, rtol=1e-4, atol=1e-2)


def test_cum_val_matches_exact_and_tracks_binary_search():
    rng = RNG(3)
    ref = np.sort(rng.uniform(0, 100, 257))
    targets = np.concatenate([rng.uniform(-5, 105, 64), [np.nan]])
    row = jnp.asarray(np.concatenate([ref, [np.inf] * 7]), jnp.float32)
    got = np.asarray(PP.cum_val(row, jnp.int32(len(ref)),
                                jnp.asarray(targets, jnp.float32)))
    for t, g in zip(targets, got):
        assert abs(g - _np_exact_cum(ref, t)) < 1e-5
        # the reference's capped binary search agrees to ~2 ranks
        assert abs(g - _np_binary_cum(ref, t)) <= 2.5 / len(ref)


def test_pick_by_scores_matches_transliteration():
    rng = RNG(4)
    cand, valid, ids, _, _ = _make_population(rng, n_chr=4, n_regions=24)
    picked = _np_pick_by_intensities(_ragged(cand, valid)).astype(
        np.float32)
    ref = PP.generate_reference_from_population(
        jnp.asarray(picked), jnp.asarray(ids), neighbor_len=7)
    res = PP.pick_spots_by_scores(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids),
        jnp.asarray(picked), ref, neighbor_len=7)
    refs_np = _np_references(picked, ids, 7)
    want = _np_scores(cand, valid, ids, picked, refs_np, 7)
    got = np.asarray(res.all_scores)
    m = np.isfinite(want)
    assert np.all(np.isfinite(got[m]))
    assert np.allclose(got[m], want[m], rtol=1e-3, atol=2e-3)
    # picks agree with the transliteration argmax wherever the margin is
    # clear, and with the binary-search cum_val variant as well
    want_bin = _np_scores(cand, valid, ids, picked, refs_np, 7,
                          cum=_np_binary_cum)
    for w in (want, want_bin):
        sel_np = np.argmax(np.where(np.isfinite(w), w, -np.inf), axis=-1)
        srt = np.sort(np.where(np.isfinite(w), w, -np.inf), axis=-1)
        with np.errstate(invalid="ignore"):
            margin = srt[..., -1] - srt[..., -2]
        clear = np.any(valid, -1) & ((margin > 0.15) | np.isinf(margin))
        assert np.mean(np.asarray(res.sel_idx)[clear]
                       == sel_np[clear]) == 1.0


def test_em_recovers_planted_traces_and_beats_intensity_init():
    rng = RNG(5)
    cand, valid, ids, truth, truth_idx = _make_population(
        rng, n_chr=6, n_regions=36, drop_frac=0.08)
    init = np.asarray(PP.pick_spots_by_intensities(
        jnp.asarray(cand), jnp.asarray(valid)))
    res = PP.em_pick_spots_in_population(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids),
        neighbor_len=5, max_niter=10)
    picked = np.asarray(res.sel_hzxys)
    has = truth_idx >= 0

    def med_err(sel):
        d = np.linalg.norm(sel[..., 1:4] - truth, axis=-1)
        return np.nanmedian(d[has])

    assert int(res.n_iters) >= 1
    assert med_err(picked) < med_err(init)
    assert med_err(picked) < 100.0           # fit jitter is 30 nm/axis
    acc = np.mean(np.asarray(res.sel_idx)[has] == truth_idx[has])
    assert acc > 0.9
    # scores populated exactly where a region has candidates
    assert np.all(np.isfinite(np.asarray(res.sel_scores)[has]))
    empty = ~np.any(valid, axis=-1)
    assert np.all(np.isnan(np.asarray(res.sel_scores)[empty]))


def test_split_intensity_channels_rescues_dim_channel():
    """Two channels with 8x different gain: pooled-intensity scoring
    systematically down-ranks the dim channel's true spots; per-channel
    CDFs restore the ranking (reference split_intensity_channels)."""
    rng = RNG(6)
    cand, valid, ids, truth, truth_idx = _make_population(
        rng, n_chr=6, n_regions=32, drop_frac=0.0, decoy_bright=False)
    chans = (ids % 2).astype(np.int32)
    # dim channel 1 by 8x (both true spots and decoys)
    cand[:, chans == 1, :, 0] /= 8.0
    picked = np.asarray(PP.pick_spots_by_intensities(
        jnp.asarray(cand), jnp.asarray(valid))).astype(np.float32)
    ref = PP.generate_reference_from_population(
        jnp.asarray(picked), jnp.asarray(ids), neighbor_len=5,
        channels=jnp.asarray(chans), n_channels=2)
    # channel rows pool disjoint populations: counts add up to 'all'
    assert int(ref.int_counts[1] + ref.int_counts[2]) \
        == int(ref.int_counts[0])
    res = PP.pick_spots_by_scores(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids),
        jnp.asarray(picked), ref, neighbor_len=5,
        channels=jnp.asarray(chans), n_channels=2,
        split_intensity_channels=True)
    # intensity CDF of a median dim-channel spot is now mid-ranked, not
    # bottom-ranked: its per-channel score beats its pooled score
    res_pooled = PP.pick_spots_by_scores(
        jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids),
        jnp.asarray(picked), ref, neighbor_len=5,
        channels=jnp.asarray(chans), n_channels=2)
    dim = np.zeros_like(np.asarray(res.all_scores), bool)
    dim[:, chans == 1] = True
    dim &= np.asarray(valid)
    assert (np.median(np.asarray(res.all_scores)[dim])
            > np.median(np.asarray(res_pooled.all_scores)[dim]))
