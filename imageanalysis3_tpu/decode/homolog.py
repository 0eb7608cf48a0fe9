"""Homolog assignment: decoded spot groups -> per-homolog chromosome traces.

Behavior targets (reference classes/decode.py, DNA_Merfish_Decoder):
  * homolog-center init ("BB")       :2079-2138 (init_homolog_centers_BB:
    over all candidate center pairs, split groups by nearest center,
    maximize rank(region coverage) x rank(-radius of gyration))
  * five score metrics                :1900-1995 (generate_score_metrics:
    [mean intensity, intensity CoV, median internal distance,
     mean 10-NN distance to the homolog trace, distance to homolog
     center]; the neighbor metric uses the all-group "chromosome tree"
    until a homolog trace exists, then that homolog's own trace)
  * weak-percentile CDF scores        :2007-2043 (cdf_scores:
    count(refs <= v)/n + 0.5/n, greater flags [T,F,F,F,F]; log; weighted
    nansum; 1/n_spots normalization — summarize_score :2045-2070)
  * iterative E/M homolog assignment  :951-1023 + :1598-1662
    (iterative_assign_spot_groups_2_homologs / assign_spot_groups_2_
    homologs: each group flags its best homolog, per (region, homolog)
    the best-scoring preferring group wins; winners below the
    score_th_percentile population percentile are invalidated
    (scoreatpercentile, :1602-1609); homolog centers update to the
    *median* of flagged centroids (calculate_homolog_centroids
    :1375-1382); homolog trees rebuild from the trace; iterate until
    the flag-change fraction < flag_diff_th)
  * per-region trace summary          :1214-1285 + :1361-1370
    (summarize_zxys_all_chromosomes / tuple_list_to_zxys -> the selected
    group's member-spot coordinates, NaN where below threshold)

TPU-first design: groups are fixed-capacity masked arrays.  The BB init
evaluates *all* center pairs as one (G, G, G) masked tensor program; the
E/M loop is a `lax.while_loop` whose E-step scores every
(group, homolog, metric) cell at once (population weak-CDF via sort +
searchsorted, 10-NN via top_k over a dense (H, G, R) distance tensor)
and whose M-step is two masked argmax passes (group -> best homolog,
then (region, homolog) -> best preferring group).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_METRIC_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0)   # decode.py:709
N_NEIGHBORS = 10                                      # decode.py:1901


def _rank_cdf(values: jnp.ndarray, ok: jnp.ndarray,
              bigger_is_better: bool) -> jnp.ndarray:
    """Population rank in (0, 1] (BB-init scoring, decode.py:2107-2111)."""
    v = jnp.where(bigger_is_better, values, -values)
    n_ok = jnp.maximum(jnp.sum(ok), 1)
    s = jnp.sort(jnp.where(ok, v, jnp.inf))
    ranks = jnp.searchsorted(s, v, side="right")
    return jnp.clip(ranks.astype(jnp.float32) / n_ok, 1e-4, 1.0)


@partial(jax.jit, static_argnames=())
def init_homolog_centers(centroids: jnp.ndarray, region_ids: jnp.ndarray,
                         valid: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """Two homolog centers from decoded group centroids (reference
    init_homolog_centers_BB, decode.py:2079-2138).

    For every pair of candidate centers, groups split to the nearer one;
    score = rank(coverage: regions present on both sides) x
    rank(-mean within-side distance); the best pair's centroids are the
    centers.  centroids: (G, 3) nm.
    """
    g = centroids.shape[0]
    d = jnp.linalg.norm(centroids[:, None] - centroids[None], axis=-1)
    d = jnp.where(valid[None, :] & valid[:, None], d, 0.0)
    # side2[i1, i2, k]: group k is closer to i2 than i1
    side2 = d[:, None, :] > d[None, :, :]
    okk = valid[None, None, :]
    n2 = jnp.maximum(jnp.sum(side2 & okk, axis=-1), 1)
    n1 = jnp.maximum(jnp.sum(~side2 & okk, axis=-1), 1)
    # mean within-side distance to the respective candidate center
    rg = (jnp.sum(jnp.where(~side2 & okk, d[:, None, :], 0.0), -1) / n1
          + jnp.sum(jnp.where(side2 & okk, d[None, :, :], 0.0), -1) / n2)
    # coverage: regions with >= 1 group on each side
    rid = region_ids.astype(jnp.int32)
    uniq = jnp.unique(rid, size=rid.shape[0], fill_value=-1)
    onehot = (rid[None, :] == uniq[:, None]) & valid[None, :]   # (R, G)
    cov1 = jnp.einsum("rg,abg->abr", onehot.astype(jnp.float32),
                      (~side2 & okk).astype(jnp.float32)) > 0
    cov2 = jnp.einsum("rg,abg->abr", onehot.astype(jnp.float32),
                      (side2 & okk).astype(jnp.float32)) > 0
    cov = jnp.sum(cov1 & cov2, axis=-1).astype(jnp.float32)

    pair_ok = valid[:, None] & valid[None, :] \
        & (jnp.arange(g)[:, None] > jnp.arange(g)[None, :])
    flat_ok = pair_ok.ravel()
    r_rg = _rank_cdf(rg.ravel(), flat_ok, bigger_is_better=False)
    r_cov = _rank_cdf(cov.ravel(), flat_ok, bigger_is_better=True)
    score = jnp.where(flat_ok, r_rg * r_cov, -jnp.inf)
    best = jnp.argmax(score)
    i1, i2 = jnp.unravel_index(best, (g, g))
    return centroids[i1], centroids[i2]


def init_centers_kmeans(centroids: np.ndarray, valid: np.ndarray,
                        n_homologs: int, n_iters: int = 25,
                        seed: int = 0) -> np.ndarray:
    """K-means homolog-center init for n_homologs != 2 (reference
    initial_assign_homologs_by_chr, decode.py:1536-1596, sklearn KMeans).
    Host-side numpy: farthest-point seeding + Lloyd iterations."""
    pts = np.asarray(centroids, np.float64)[np.asarray(valid, bool)]
    if len(pts) < n_homologs:
        raise ValueError(f"need >= {n_homologs} valid groups for k-means")
    rng = np.random.default_rng(seed)
    centers = [pts[rng.integers(len(pts))]]
    for _ in range(n_homologs - 1):
        d2 = np.min([np.sum((pts - c) ** 2, 1) for c in centers], axis=0)
        centers.append(pts[int(np.argmax(d2))])
    centers = np.asarray(centers)
    for _ in range(n_iters):
        lab = np.argmin(
            ((pts[:, None] - centers[None]) ** 2).sum(-1), axis=1)
        for k in range(n_homologs):
            if np.any(lab == k):
                centers[k] = pts[lab == k].mean(0)
    return centers.astype(np.float32)


# ---------------------------------------------------------------------------
# Score metrics (reference generate_score_metrics, decode.py:1900-1995)
# ---------------------------------------------------------------------------


def _chr_tree_nb_dists(centroids: jnp.ndarray, valid: jnp.ndarray,
                       n_neighbors: int) -> jnp.ndarray:
    """(G,) mean distance to the n_neighbors nearest *group centroids*
    (the "chromosome tree" of decode.py:1025; self included at d=0 as the
    KDTree query does).  NaN when the tree holds < n_neighbors points."""
    d = jnp.linalg.norm(centroids[:, None] - centroids[None], axis=-1)
    d = jnp.where(valid[None, :], d, jnp.inf)
    neg, _ = jax.lax.top_k(-d, min(n_neighbors, centroids.shape[0]))
    out = jnp.mean(-neg, axis=1)
    return jnp.where(jnp.sum(valid) >= n_neighbors, out, jnp.nan)


def _trace_nb_dists(centroids: jnp.ndarray, trace: jnp.ndarray,
                    trace_valid: jnp.ndarray, chr_nb: jnp.ndarray,
                    n_neighbors: int) -> jnp.ndarray:
    """(G, H) mean distance to the n_neighbors nearest points of each
    homolog's trace (reference neighboring_dists over per-homolog KDTrees,
    decode.py:1931-1936 + tree rebuild :1003-1009: an empty trace falls
    back to the chromosome tree; a short one yields NaN)."""
    # (H, G, R)
    d = jnp.linalg.norm(centroids[None, :, None] - trace[:, None, :],
                        axis=-1)
    d = jnp.where(trace_valid[:, None, :], d, jnp.inf)
    k = min(n_neighbors, trace.shape[1])
    neg, _ = jax.lax.top_k(-d, k)
    mean_k = jnp.mean(-neg, axis=-1)                       # (H, G)
    n_valid = jnp.sum(trace_valid, axis=1)                 # (H,)
    per_h = jnp.where(n_valid[:, None] >= n_neighbors, mean_k, jnp.nan)
    per_h = jnp.where(n_valid[:, None] == 0, chr_nb[None, :], per_h)
    return per_h.T                                         # (G, H)


def _cdf_weak(values: jnp.ndarray, refs_sorted: jnp.ndarray,
              n_refs: jnp.ndarray, greater: bool) -> jnp.ndarray:
    """Reference cdf_scores (decode.py:2018-2027):
    percentileofscore(refs, v, kind='weak')/100 + 0.5/n for greater,
    1 - percentileofscore/100 + 0.5/n otherwise.  NaN refs sort to the
    end (counted in n, never <= v), NaN values stay NaN."""
    count = jnp.searchsorted(refs_sorted, jnp.nan_to_num(
        values, nan=0.0), side="right").astype(jnp.float32)
    n = jnp.maximum(n_refs.astype(jnp.float32), 1.0)
    cdf = jnp.where(greater, count / n + 0.5 / n,
                    1.0 - count / n + 0.5 / n)
    return jnp.where(jnp.isnan(values), jnp.nan, cdf)


_GREATER_FLAGS = (True, False, False, False, False)   # decode.py:2030


def score_groups(metrics: jnp.ndarray, valid: jnp.ndarray,
                 n_spots: jnp.ndarray,
                 weights: jnp.ndarray) -> jnp.ndarray:
    """metrics (G, H, 5) -> final scores (G, H).

    Population refs per metric = all (valid group, homolog) cells
    (reference collect_metrics, decode.py:2000-2010); scores =
    log weak-CDF, weighted nansum, normalized by 1/n_spots
    (generate_scores :2029-2043 + summarize_score :2045-2057)."""
    g, h, m = metrics.shape
    flat_ok = jnp.repeat(valid, h)
    n_refs = jnp.sum(flat_ok)
    finals = jnp.zeros((g, h), jnp.float32)
    for i in range(m):
        vals = metrics[:, :, i]
        refs = jnp.where(flat_ok, vals.ravel(), jnp.nan)
        refs_sorted = jnp.sort(jnp.nan_to_num(refs, nan=jnp.inf))
        cdf = _cdf_weak(vals, refs_sorted, n_refs, _GREATER_FLAGS[i])
        term = weights[i] * jnp.log(cdf)
        finals = finals + jnp.nan_to_num(term, nan=0.0)
    return finals / jnp.maximum(n_spots, 1)[:, None].astype(jnp.float32)


def _percentile_linear(values: jnp.ndarray, ok: jnp.ndarray,
                       pct: float) -> jnp.ndarray:
    """scipy.stats.scoreatpercentile (fraction-interpolated) over the
    masked population (reference score_th, decode.py:1602-1609)."""
    s = jnp.sort(jnp.where(ok, values, jnp.inf))
    n_ok = jnp.maximum(jnp.sum(ok), 1)
    rank = pct / 100.0 * (n_ok - 1).astype(jnp.float32)
    lo = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, values.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, values.shape[0] - 1)
    frac = rank - lo.astype(jnp.float32)
    hi = jnp.where(hi >= n_ok, lo, hi)
    return s[lo] * (1.0 - frac) + s[hi] * frac


# ---------------------------------------------------------------------------
# E/M assignment
# ---------------------------------------------------------------------------


class HomologResult(NamedTuple):
    zxys: jnp.ndarray         # (H, R, 3) per-homolog traces (nm, NaN missing)
    zxys_valid: jnp.ndarray   # (H, R)
    sel_group: jnp.ndarray    # (H, R) selected group index, -1 none
    member_zxys: jnp.ndarray  # (H, R, S, 3) selected groups' member spots
    member_ok: jnp.ndarray    # (H, R, S)
    flags: jnp.ndarray        # (G,) homolog index per group, -1 unassigned
    final_scores: jnp.ndarray  # (G, H) last E-step scores
    score_th: jnp.ndarray     # () population score threshold
    centers: jnp.ndarray      # (H, 3) final homolog centers
    n_iters: jnp.ndarray      # ()


@partial(jax.jit, static_argnames=("n_regions", "max_iters",
                                   "n_neighbors"))
def assign_groups_to_homologs(centroids: jnp.ndarray,
                              mean_intensity: jnp.ndarray,
                              cv_intensity: jnp.ndarray,
                              internal_dists: jnp.ndarray,
                              region_index: jnp.ndarray,
                              n_spots: jnp.ndarray,
                              valid: jnp.ndarray,
                              member_zxys: jnp.ndarray,
                              member_ok: jnp.ndarray,
                              init_centers: jnp.ndarray,
                              n_regions: int,
                              weights=DEFAULT_METRIC_WEIGHTS,
                              score_th_percentile: float = 1.0,
                              max_iters: int = 10,
                              n_neighbors: int = N_NEIGHBORS,
                              flag_diff_th: float = 0.005) -> HomologResult:
    """Iterative E/M assignment of decoded groups to homologs.

    centroids (G, 3) nm; mean_intensity/cv_intensity (G,); internal_dists
    (G,) median within-group distance; region_index (G,) in [0,
    n_regions); n_spots (G,); member_zxys (G, S, 3) nm member-spot
    coordinates (NaN padded) with member_ok (G, S); init_centers (H, 3).

    E-step = generate_score_metrics + generate_scores + summarize_score
    (decode.py:1900-2070); M-step = assign_spot_groups_2_homologs
    (:1598-1662); loop = iterative_assign_spot_groups_2_homologs
    (:951-1023).  See module docstring for the fidelity map.
    """
    g = centroids.shape[0]
    h = init_centers.shape[0]
    s = member_zxys.shape[1]
    w = jnp.asarray(weights, jnp.float32)
    chr_nb = _chr_tree_nb_dists(centroids, valid, n_neighbors)   # (G,)
    basic = jnp.stack([mean_intensity, cv_intensity, internal_dists],
                      axis=1)                                    # (G, 3)

    def e_step(centers, trace, trace_valid):
        nb = _trace_nb_dists(centroids, trace, trace_valid, chr_nb,
                             n_neighbors)                        # (G, H)
        ct = jnp.linalg.norm(centroids[:, None] - centers[None], axis=-1)
        metrics = jnp.concatenate([
            jnp.broadcast_to(basic[:, None, :], (g, h, 3)),
            nb[..., None], ct[..., None]], axis=-1)              # (G, H, 5)
        finals = score_groups(metrics, valid, n_spots, w)
        return jnp.where(valid[:, None], finals, -jnp.inf)

    def m_step(finals, centers):
        pref = jnp.argmax(finals, axis=1)                        # (G,)
        pref_score = jnp.max(finals, axis=1)
        # per (region, homolog): best group among those preferring h
        cell_score = jnp.full((n_regions, h), -jnp.inf)
        cell_best = jnp.full((n_regions, h), -1, jnp.int32)

        def consider(k, state):
            cs, cb = state
            r = region_index[k]
            hh = pref[k]
            better = valid[k] & (pref_score[k] > cs[r, hh])
            cs = cs.at[r, hh].set(jnp.where(better, pref_score[k],
                                            cs[r, hh]))
            cb = cb.at[r, hh].set(jnp.where(better, k, cb[r, hh]))
            return cs, cb

        cell_score, cell_best = jax.lax.fori_loop(
            0, g, consider, (cell_score, cell_best))
        # population percentile threshold (decode.py:1602-1609)
        score_th = _percentile_linear(finals.ravel(),
                                      jnp.repeat(valid, h),
                                      score_th_percentile)
        won = jnp.isfinite(cell_score) & (cell_score >= score_th)  # (R, H)
        sel = jnp.where(won, cell_best, -1)                       # (R, H)
        # flags (collect_homolog_flags :1352-1359): a group is flagged iff
        # it is its (region, pref) cell's winner above threshold
        winner_of = cell_best[region_index, pref]                 # (G,)
        flags = jnp.where(valid & (winner_of == jnp.arange(g))
                          & won[region_index, pref], pref, -1)
        # trace: winner centroids (tuple_list_to_zxys :1361-1370)
        trace = jnp.where(won[..., None],
                          centroids[jnp.clip(sel, 0, g - 1)], jnp.nan)
        trace = jnp.swapaxes(trace, 0, 1)                         # (H, R, 3)
        trace_valid = jnp.swapaxes(won, 0, 1)
        # centers: median of flagged centroids
        # (calculate_homolog_centroids :1375-1382)
        def center_of(hh):
            m = flags == hh
            med = jnp.nanmedian(
                jnp.where(m[:, None], centroids, jnp.nan), axis=0)
            return jnp.where(jnp.any(m), med, centers[hh])
        new_centers = jax.vmap(center_of)(jnp.arange(h))
        return flags, new_centers, trace, trace_valid, \
            jnp.swapaxes(sel, 0, 1), finals, score_th

    def cond(state):
        it, diff = state[0], state[1]
        return (it < max_iters) & (diff >= flag_diff_th)

    def body(state):
        it, _diff, flags, centers, trace, trace_valid, _sel, _fin, _th \
            = state
        finals = e_step(centers, trace, trace_valid)
        new_flags, new_centers, new_trace, new_tv, sel, fin, th = \
            m_step(finals, centers)
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        diff = jnp.sum((new_flags != flags) & valid) / n_valid
        return (it + 1, diff, new_flags, new_centers, new_trace, new_tv,
                sel, fin, th)

    state0 = (jnp.int32(0), jnp.float32(1.0),
              jnp.full(g, -1, jnp.int32),
              init_centers.astype(jnp.float32),
              jnp.full((h, n_regions, 3), jnp.nan, jnp.float32),
              jnp.zeros((h, n_regions), bool),
              jnp.full((h, n_regions), -1, jnp.int32),
              jnp.zeros((g, h), jnp.float32), jnp.float32(-jnp.inf))
    it, _, flags, centers, trace, trace_valid, sel, finals, score_th = \
        jax.lax.while_loop(cond, body, state0)
    # member-spot coordinates of the selected groups (H, R, S, 3)
    mem = member_zxys[jnp.clip(sel, 0, g - 1)]
    mem_ok = member_ok[jnp.clip(sel, 0, g - 1)] & trace_valid[..., None]
    mem = jnp.where(mem_ok[..., None], mem, jnp.nan)
    return HomologResult(zxys=trace, zxys_valid=trace_valid,
                         sel_group=sel, member_zxys=mem, member_ok=mem_ok,
                         flags=flags, final_scores=finals,
                         score_th=score_th, centers=centers, n_iters=it)


# ---------------------------------------------------------------------------
# Host front door
# ---------------------------------------------------------------------------


def group_statistics(groups, spots: np.ndarray,
                     pixel_size_nm=(200.0, 108.0, 108.0)):
    """Vectorized per-group stats from MERFISH SpotGroups + spot rows:
    (centroids (G,3) nm, mean_int, cv_int, median internal dist, n_spots,
    member_coords (G,S,3) nm, member_ok (G,S)) — the basic metrics of
    generate_score_metrics (decode.py:1919-1925)."""
    px = np.asarray(pixel_size_nm, np.float32)
    idx = np.asarray(groups.spot_idx)
    member_ok = idx >= 0
    safe = np.clip(idx, 0, None)
    coords = np.where(member_ok[..., None], spots[safe, 1:4] * px, np.nan)
    ints = np.where(member_ok, spots[safe, 0], np.nan)
    with np.errstate(invalid="ignore"):
        centroids = np.nanmean(coords, axis=1)
        mean_int = np.nanmean(ints, axis=1)
        std_int = np.nanstd(ints, axis=1)
    cv_int = np.where(mean_int > 0, std_int / np.maximum(mean_int, 1e-9),
                      0.0)
    # median pairwise internal distance, vectorized over (G, S, S)
    d = np.linalg.norm(coords[:, :, None] - coords[:, None, :], axis=-1)
    s = idx.shape[1]
    iu, ju = np.triu_indices(s, 1)
    pair_ok = member_ok[:, iu] & member_ok[:, ju]
    vals = np.where(pair_ok, d[:, iu, ju], np.nan)
    has_pair = pair_ok.any(axis=1)       # ok=False padding rows have none
    d_int = np.zeros(len(vals))
    if has_pair.any():
        with np.errstate(invalid="ignore"):
            d_int[has_pair] = np.nanmedian(vals[has_pair], axis=1)
    d_int = np.nan_to_num(d_int, nan=0.0)
    n_spots = member_ok.sum(1).astype(np.int32)
    return (centroids, np.nan_to_num(mean_int).astype(np.float32),
            cv_int.astype(np.float32), d_int.astype(np.float32), n_spots,
            np.nan_to_num(coords, nan=0.0).astype(np.float32), member_ok)


def decode_chromosome_homologs(groups, spots: np.ndarray,
                               region_ids_of_groups: np.ndarray,
                               pixel_size_nm=(200.0, 108.0, 108.0),
                               n_homologs: int = 2,
                               **assign_kwargs) -> HomologResult:
    """Host front door: MERFISH SpotGroups (one chromosome) -> homolog
    traces (reference batch_decode_BB_like, decode.py:2139-2199).

    `groups`: decode.merfish.SpotGroups; `spots`: (N, 11) candidate rows;
    `region_ids_of_groups`: region id per group row.  n_homologs == 2
    initializes with the BB pair program; other counts use k-means
    (reference initial_assign_homologs_by_chr).
    """
    (centroids, mean_int, cv_int, d_int, n_spots, member_coords,
     member_ok) = group_statistics(groups, spots, pixel_size_nm)
    ok = np.asarray(groups.ok)
    rid = np.asarray(region_ids_of_groups)
    uniq = np.unique(rid[ok]) if ok.any() else np.zeros(1, int)
    rindex = np.searchsorted(uniq, rid)
    rindex = np.clip(rindex, 0, max(len(uniq) - 1, 0))

    valid = ok & np.isfinite(centroids).all(1)
    cent = jnp.asarray(np.nan_to_num(centroids), jnp.float32)
    if n_homologs == 2:
        c1, c2 = init_homolog_centers(cent, jnp.asarray(rindex),
                                      jnp.asarray(valid))
        init_centers = jnp.stack([c1, c2])
    else:
        init_centers = jnp.asarray(
            init_centers_kmeans(centroids, valid, n_homologs))
    return assign_groups_to_homologs(
        cent, jnp.asarray(mean_int), jnp.asarray(cv_int),
        jnp.asarray(d_int), jnp.asarray(rindex), jnp.asarray(n_spots),
        jnp.asarray(valid), jnp.asarray(member_coords),
        jnp.asarray(member_ok), init_centers,
        n_regions=len(uniq), **assign_kwargs)
