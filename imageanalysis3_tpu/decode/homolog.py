"""Homolog assignment: decoded spot groups -> per-homolog chromosome traces.

Behavior targets (reference classes/decode.py, DNA_Merfish_Decoder):
  * homolog-center init ("BB")       :2079-2138 (init_homolog_centers_BB:
    over all candidate center pairs, split groups by nearest center,
    maximize rank(region coverage) x rank(-radius of gyration))
  * score metrics                     :1900-2016 (generate_score_metrics:
    mean intensity, intensity CoV, internal distance, neighbor distance,
    distance to homolog center)
  * CDF scores + weighted summary     :2018-2070
  * iterative E/M homolog assignment  :951-1023 + :1384-1534
    (iterative_assign_spot_groups_2_homologs / assign_homologs_by_chr:
    score groups against homologs, per (region, homolog) keep the best,
    update centers, iterate until assignments stabilize)
  * per-region trace summary          :1214-1285
    (summarize_zxys_all_chromosomes -> (H, R, 3) zxys)

TPU-first design: groups are fixed-capacity masked arrays.  The BB init
evaluates *all* center pairs as one (G, G, G) masked tensor program; the
E/M loop is a `lax.while_loop` whose E-step scores every (group, homolog)
cell at once (population-CDF via sort + searchsorted) and whose M-step is
two masked argmax passes (group -> best homolog, then (region, homolog)
-> best group).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rank_cdf(values: jnp.ndarray, ok: jnp.ndarray,
              bigger_is_better: bool) -> jnp.ndarray:
    """Population rank in (0, 1]: the reference's get_cumprobs
    (decode.py:2107-2111) as sort + searchsorted."""
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


class HomologResult(NamedTuple):
    zxys: jnp.ndarray       # (H, R, 3) per-homolog traces (nm, NaN missing)
    zxys_valid: jnp.ndarray  # (H, R)
    flags: jnp.ndarray      # (G,) homolog index per group, -1 unassigned
    centers: jnp.ndarray    # (H, 3) final homolog centers
    n_iters: jnp.ndarray    # ()


@partial(jax.jit, static_argnames=("n_regions", "max_iters"))
def assign_groups_to_homologs(centroids: jnp.ndarray,
                              intensities: jnp.ndarray,
                              internal_dists: jnp.ndarray,
                              region_index: jnp.ndarray,
                              valid: jnp.ndarray,
                              init_centers: jnp.ndarray,
                              n_regions: int,
                              w_int: float = 1.0, w_ct: float = 1.0,
                              w_inner: float = 1.0,
                              max_iters: int = 10,
                              flag_diff_th: float = 0.005) -> HomologResult:
    """E/M assignment of decoded groups to homologs.

    centroids (G, 3) nm; intensities (G,) mean group intensity;
    internal_dists (G,) median within-group distance; region_index (G,)
    in [0, n_regions); init_centers (H, 3).

    E-step (reference generate_score_metrics + calculate_scores,
    decode.py:1900-2070, linear weights over CDF ranks): score(g, h) =
    w_int * log cdf(intensity) + w_inner * log(1 - cdf(internal)) +
    w_ct * log(1 - cdf(dist to center h)).  M-step (assign_homologs_by_chr
    :1384-1534): each group flags its best homolog, each (region, homolog)
    keeps its best group; centers update to assigned means.  Iterates
    until the flag change fraction < flag_diff_th.
    """
    g = centroids.shape[0]
    h = init_centers.shape[0]
    int_cdf = _rank_cdf(intensities, valid, True)
    inner_cdf = _rank_cdf(internal_dists, valid, False)
    base = w_int * jnp.log(int_cdf) + w_inner * jnp.log(inner_cdf)

    def one_round(centers):
        dist = jnp.linalg.norm(centroids[:, None] - centers[None], axis=-1)
        ct_cdf = jax.vmap(lambda col: _rank_cdf(col, valid, False),
                          in_axes=1, out_axes=1)(dist)
        score = base[:, None] + w_ct * jnp.log(ct_cdf)        # (G, H)
        score = jnp.where(valid[:, None], score, -jnp.inf)
        pref = jnp.argmax(score, axis=1)                       # (G,)
        pref_score = jnp.max(score, axis=1)
        # per (region, homolog) keep the best preferring group
        cell_score = jnp.full((n_regions, h), -jnp.inf)
        cell_best = jnp.zeros((n_regions, h), jnp.int32)

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
        won = jnp.isfinite(cell_score)                        # (R, H)
        # flags: group k assigned iff it is its cell's winner
        winner_of = cell_best[region_index, pref]             # (G,)
        flags = jnp.where(valid & (winner_of == jnp.arange(g))
                          & won[region_index, pref], pref, -1)
        # update centers
        new_centers = []
        for hh in range(h):
            m = flags == hh
            n = jnp.maximum(jnp.sum(m), 1)
            c = jnp.sum(jnp.where(m[:, None], centroids, 0.0), axis=0) / n
            new_centers.append(jnp.where(jnp.sum(m) > 0, c,
                                         centers[hh]))
        return flags, jnp.stack(new_centers), cell_best, won

    def cond(state):
        it, _flags, _centers, diff = state
        return (it < max_iters) & (diff >= flag_diff_th)

    def body(state):
        it, flags, centers, _diff = state
        new_flags, new_centers, _, _ = one_round(centers)
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        diff = jnp.sum((new_flags != flags) & valid) / n_valid
        return it + 1, new_flags, new_centers, diff

    state0 = (jnp.int32(0), jnp.full(g, -1, jnp.int32),
              init_centers.astype(jnp.float32), jnp.float32(1.0))
    it, flags, centers, _ = jax.lax.while_loop(cond, body, state0)
    # final per-cell winners for the trace summary
    _, _, cell_best, won = one_round(centers)
    zxys = jnp.where(won[..., None], centroids[cell_best], jnp.nan)
    zxys = jnp.swapaxes(zxys, 0, 1)                           # (H, R, 3)
    return HomologResult(zxys=zxys, zxys_valid=jnp.swapaxes(won, 0, 1),
                         flags=flags, centers=centers, n_iters=it)


def decode_chromosome_homologs(groups, spots: np.ndarray,
                               region_ids_of_groups: np.ndarray,
                               pixel_size_nm=(200.0, 108.0, 108.0),
                               n_homologs: int = 2,
                               **assign_kwargs) -> HomologResult:
    """Host front door: MERFISH SpotGroups (one chromosome) -> homolog
    traces (reference batch_decode_BB_like, decode.py:2139-2199).

    `groups`: decode.merfish.SpotGroups; `spots`: (N, 11) candidate rows;
    `region_ids_of_groups`: dense region index per group row.
    """
    px = np.asarray(pixel_size_nm, np.float32)
    ok = np.asarray(groups.ok)
    idx = np.asarray(groups.spot_idx)
    member_ok = idx >= 0
    coords = np.where(member_ok[..., None],
                      spots[np.clip(idx, 0, None), 1:4] * px, np.nan)
    centroids = np.nanmean(np.where(member_ok[..., None], coords, np.nan),
                           axis=1)
    ints = np.nanmean(np.where(member_ok, spots[np.clip(idx, 0, None), 0],
                               np.nan), axis=1)
    # median internal distance per group
    d_int = np.zeros(len(idx), np.float32)
    for k in range(len(idx)):
        mem = coords[k][member_ok[k]]
        if len(mem) >= 2:
            dd = np.linalg.norm(mem[:, None] - mem[None], axis=-1)
            d_int[k] = np.median(dd[np.triu_indices(len(mem), 1)])
    rid = np.asarray(region_ids_of_groups)
    uniq = np.unique(rid[ok]) if ok.any() else np.zeros(1, int)
    rindex = np.searchsorted(uniq, rid)
    rindex = np.clip(rindex, 0, max(len(uniq) - 1, 0))

    valid = jnp.asarray(ok & np.isfinite(centroids).all(1))
    cent = jnp.asarray(np.nan_to_num(centroids), jnp.float32)
    c1, c2 = init_homolog_centers(cent, jnp.asarray(rindex), valid)
    init_centers = jnp.stack([c1, c2])
    if n_homologs != 2:
        raise NotImplementedError("BB init defines two homologs")
    return assign_groups_to_homologs(
        cent, jnp.asarray(np.nan_to_num(ints)),
        jnp.asarray(d_int), jnp.asarray(rindex), valid, init_centers,
        n_regions=len(uniq), **assign_kwargs)
