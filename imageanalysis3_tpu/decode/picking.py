"""Spot picking: per-region candidate spots -> per-chromosome traces.

Behavior targets (reference spot_tools/picking.py):
  * naive picker (:14, :797-901): per region pick the candidate maximizing
    intensity (optionally weighted against distance to the chromosome
    center).
  * dynamic-programming picker (:902-1203): forward pass accumulating
    spot score + neighbor-continuity score (distance_score / id-gap),
    backward pointer walk for the globally optimal chain.
  * EM picker (:1204-1530): E-step scores every candidate against the
    current trace (center-dist / local-dist / intensity references), M-step
    re-runs the DP; iterate until the picked set changes < terminate_th.

TPU-first design: candidates are a dense (R, M, 11) table indexed by sorted
region id with validity masks.  The reference's per-region Python loops with
cdist calls become a `lax.scan` whose carry is the (M,) DP frontier —
each step is an (M, M) distance block plus a max-reduce, and empty regions
pass the frontier through unchanged (the fixed-shape equivalent of the
reference dropping them from the chain).  The EM loop is a
`lax.while_loop`, so a whole cell (or a vmapped batch of chromosomes,
sharing candidates — reference chrom_share_spots=True) picks in one
compiled program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DEFAULT_PIXEL_SIZE_NM
from .scoring import (ChromRefStats, chromosome_ref_stats,
                      linear_distance_score, score_candidates)


def _naive_scores(cand_spots, cand_valid, chrom_center, pixel_size_nm,
                  w_int=1.0, w_ctdist=1.0, use_center_dist=True):
    """(R, M) naive scores: log intensity ratio - log center-dist ratio."""
    heights = cand_spots[..., 0]
    if chrom_center is not None and use_center_dist:
        px = jnp.asarray(pixel_size_nm, jnp.float32)
        zxy_nm = cand_spots[..., 1:4] * px
        d = jnp.linalg.norm(zxy_nm - chrom_center[None, None] * px, axis=-1)
        med_d = jnp.nanmedian(jnp.where(cand_valid, d, jnp.nan))
        med_h = jnp.nanmedian(jnp.where(cand_valid, heights, jnp.nan))
        score = (w_int * jnp.log(jnp.maximum(heights, 1e-6)
                                 / jnp.maximum(med_h, 1e-6))
                 - w_ctdist * jnp.log(jnp.maximum(d, 1e-6)
                                      / jnp.maximum(med_d, 1e-6)))
    else:
        score = heights
    return jnp.where(cand_valid, score, -jnp.inf)


@partial(jax.jit, static_argnames=("use_center_dist",))
def naive_pick_spots(cand_spots: jnp.ndarray, cand_valid: jnp.ndarray,
                     chrom_center: Optional[jnp.ndarray] = None,
                     pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                     w_int: float = 1.0, w_ctdist: float = 1.0,
                     use_center_dist: bool = True,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick one spot per region -> (trace (R, 11), picked mask (R,)).

    Score = w_int * log(h / median_h) - w_ctdist * log(dist_to_center /
    median_dist); highest-scoring valid candidate wins (the naive scoring of
    reference spot_tools/picking.py:797-901 simplified to its intensity +
    center-distance core).  Regions with no valid candidates return NaN rows.
    """
    score = _naive_scores(cand_spots, cand_valid, chrom_center,
                          pixel_size_nm, w_int, w_ctdist, use_center_dist)
    best = jnp.argmax(score, axis=1)                       # (R,)
    picked = jnp.take_along_axis(cand_spots, best[:, None, None],
                                 axis=1)[:, 0]
    has = jnp.any(cand_valid, axis=1)
    picked = jnp.where(has[:, None], picked, jnp.nan)
    return picked, has


def take_trace(cand_spots: jnp.ndarray, cand_valid: jnp.ndarray,
               sel_idx: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather the (R, 11) trace selected by per-region indices; regions
    without any valid candidate become NaN rows."""
    picked = jnp.take_along_axis(cand_spots, sel_idx[:, None, None],
                                 axis=1)[:, 0]
    ok = jnp.take_along_axis(cand_valid, sel_idx[:, None], axis=1)[:, 0]
    return jnp.where(ok[:, None], picked, jnp.nan), ok


@partial(jax.jit, static_argnames=())
def dynamic_pick_spots(cand_spots: jnp.ndarray, cand_valid: jnp.ndarray,
                       spot_scores: jnp.ndarray, region_ids: jnp.ndarray,
                       nb_dist_ref: jnp.ndarray,
                       pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                       w_nbdist: float = 2.0,
                       max_distance_limit: float = 3000.0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Globally optimal chain of one spot per region -> (sel_idx (R,),
    total score ()).

    Behavior target: dynamic_pick_spots_for_chromosomes
    (spot_tools/picking.py:902-1203), single-chromosome core: maximize
    sum_i [spot_score(i, m_i)] + sum_edges [distance_score(d(m_i, m_j),
    nb_dist_ref, w_nbdist) / (id_j - id_i)].  Regions whose candidates are
    all invalid are skipped (the DP frontier passes through, and the id gap
    spans them), exactly like the reference dropping empty regions.
    """
    r, m, _ = cand_spots.shape
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    zxys = cand_spots[..., 1:4] * px[None, None]            # (R, M, 3)
    has_any = jnp.any(cand_valid, axis=1)                   # (R,)
    scores = jnp.where(cand_valid, spot_scores, -jnp.inf)
    ids_f = region_ids.astype(jnp.float32)

    def step(carry, inp):
        dy, prev_zxy, prev_id, anchored = carry
        sc, zxy, ok_any, rid = inp

        gap = jnp.maximum(jnp.abs(rid - prev_id), 1.0)
        d = jnp.linalg.norm(prev_zxy[:, None] - zxy[None], axis=-1)
        nb = linear_distance_score(d, nb_dist_ref, w_nbdist,
                                   max_distance_limit) / gap
        measure = dy[:, None] + nb                          # (M, M)
        best_prev = jnp.argmax(measure, axis=0)             # (M,)
        dy_new = sc + jnp.max(measure, axis=0)
        # first non-empty region anchors the chain with its own scores
        dy_new = jnp.where(anchored, dy_new, sc)
        ptr = jnp.where(anchored, best_prev, -1)
        # empty region: frontier and anchor pass through unchanged
        dy_out = jnp.where(ok_any, dy_new, dy)
        zxy_out = jnp.where(ok_any, zxy, prev_zxy)
        id_out = jnp.where(ok_any, rid, prev_id)
        ptr_out = jnp.where(ok_any, ptr,
                            jnp.arange(m))                  # identity chain
        anchored_out = anchored | ok_any
        return (dy_out, zxy_out, id_out, anchored_out), ptr_out

    carry0 = (jnp.zeros(m), zxys[0] * 0.0, ids_f[0] - 1.0,
              jnp.zeros((), bool))
    (dy, _, _, _), ptrs = jax.lax.scan(
        step, carry0, (scores, zxys, has_any, ids_f))

    last = jnp.argmax(dy)
    total = jnp.max(dy)

    def back(idx, ptr_row):
        nxt = ptr_row[idx]
        # -1 marks the anchor region (no predecessor): keep idx
        prev = jnp.where(nxt < 0, idx, nxt)
        return prev, idx

    # walk pointers from the end; sel[i] is the index chosen at region i
    _, sel_rev = jax.lax.scan(back, last, ptrs, reverse=True)
    # sel_rev[i] = index at region i (scan emits post-step idx)
    sel = sel_rev
    sel = jnp.where(has_any, sel, 0)
    return sel, total


class EMPickResult(NamedTuple):
    trace: jnp.ndarray       # (R, 11) picked rows (NaN where unpicked)
    sel_idx: jnp.ndarray     # (R,) candidate index per region
    sel_valid: jnp.ndarray   # (R,) region has a real pick
    scores: jnp.ndarray      # (R,) picked spot scores
    n_iters: jnp.ndarray     # () int32 EM iterations run
    change_ratio: jnp.ndarray  # () f32 final change ratio
    # (C,) int32: picks hard-invalidated because a cross-chromosome
    # contest was still unresolved after n_resolve_rounds (exclusive
    # picker only; zeros elsewhere).  Nonzero values mean regions came
    # back empty that more resolve rounds might have filled.
    n_unresolved: Optional[jnp.ndarray] = None


@partial(jax.jit, static_argnames=("num_iters", "local_size"))
def em_pick_spots(cand_spots: jnp.ndarray, cand_valid: jnp.ndarray,
                  region_ids: jnp.ndarray,
                  chrom_center: Optional[jnp.ndarray] = None,
                  pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                  num_iters: int = 10, terminate_th: float = 0.0025,
                  local_size: int = 5,
                  w_ctdist: float = 2.0, w_lcdist: float = 1.0,
                  w_int: float = 1.0, w_nbdist: float = 2.0,
                  max_distance_limit: float = 3000.0) -> EMPickResult:
    """EM spot picking for one chromosome (reference
    EM_pick_spots_for_chromosomes, spot_tools/picking.py:1204-1530).

    E-step: score candidates against the current trace's reference stats;
    M-step: dynamic-programming chain maximizing score + continuity;
    iterate until the picked set changes less than `terminate_th` or
    `num_iters` is reached.  Initialization is the naive pick.
    """
    r, m, _ = cand_spots.shape
    sel_idx0 = jnp.argmax(_naive_scores(cand_spots, cand_valid,
                                        chrom_center, pixel_size_nm),
                          axis=1)
    has_any = jnp.any(cand_valid, axis=1)
    n_regions = jnp.maximum(jnp.sum(has_any), 1)

    def one_round(sel_idx):
        trace, ok = take_trace(cand_spots, cand_valid, sel_idx)
        sel_ok = ok & has_any
        refs = chromosome_ref_stats(
            jnp.where(sel_ok[:, None], trace, 0.0), sel_ok, chrom_center,
            pixel_size_nm, local_size)
        sc = score_candidates(cand_spots, cand_valid,
                              jnp.where(sel_ok[:, None], trace, 0.0),
                              sel_ok, chrom_center, refs, pixel_size_nm,
                              local_size, w_ctdist, w_lcdist, w_int,
                              max_distance_limit)
        nb_ref = jnp.where(jnp.isfinite(refs.nb_dist), refs.nb_dist, 500.0)
        new_idx, _total = dynamic_pick_spots(
            cand_spots, cand_valid, sc, region_ids, nb_ref, pixel_size_nm,
            w_nbdist, max_distance_limit)
        return new_idx, sc

    def cond(state):
        it, _idx, change, _sc = state
        return (it < num_iters) & (change >= terminate_th)

    def body(state):
        it, idx, _change, _sc = state
        new_idx, sc = one_round(idx)
        changed = jnp.sum((new_idx != idx) & has_any)
        ratio = changed.astype(jnp.float32) / n_regions.astype(jnp.float32)
        return it + 1, new_idx, ratio, sc

    state0 = (jnp.int32(0), sel_idx0, jnp.float32(1.0),
              jnp.zeros((r, m), jnp.float32))
    it, sel_idx, change, sc = jax.lax.while_loop(cond, body, state0)
    trace, sel_valid = take_trace(cand_spots, cand_valid, sel_idx)
    picked_sc = jnp.take_along_axis(sc, sel_idx[:, None], axis=1)[:, 0]
    picked_sc = jnp.where(sel_valid, picked_sc, jnp.nan)
    return EMPickResult(trace=trace, sel_idx=sel_idx, sel_valid=sel_valid,
                        scores=picked_sc, n_iters=it, change_ratio=change)


def em_pick_spots_for_chromosomes(cand_spots, cand_valid, region_ids,
                                  chrom_centers, share_spots: bool = True,
                                  **kw):
    """EM picking for several chromosomes sharing one candidate table.

    ``share_spots=True`` (reference chrom_share_spots=True): independent
    vmapped EMs — two chromosomes may pick the same candidate.
    ``share_spots=False`` (the reference default, chrom_share_spots=False,
    spot_tools/picking.py:1106-1125): spots are exclusive — see
    :func:`em_pick_spots_exclusive`.  `chrom_centers`: (C, 3) px; returns
    an EMPickResult batched over chromosomes."""
    if not share_spots:
        return em_pick_spots_exclusive(cand_spots, cand_valid, region_ids,
                                       jnp.asarray(chrom_centers,
                                                   jnp.float32), **kw)
    fn = lambda ctr: em_pick_spots(cand_spots, cand_valid, region_ids,
                                   chrom_center=ctr, **kw)
    return jax.vmap(fn)(jnp.asarray(chrom_centers, jnp.float32))


@partial(jax.jit, static_argnames=("num_iters", "local_size",
                                   "n_resolve_rounds"))
def em_pick_spots_exclusive(cand_spots: jnp.ndarray,
                            cand_valid: jnp.ndarray,
                            region_ids: jnp.ndarray,
                            chrom_centers: jnp.ndarray,
                            pixel_size_nm=DEFAULT_PIXEL_SIZE_NM,
                            num_iters: int = 10,
                            terminate_th: float = 0.0025,
                            local_size: int = 5,
                            w_ctdist: float = 2.0, w_lcdist: float = 1.0,
                            w_int: float = 1.0, w_nbdist: float = 2.0,
                            max_distance_limit: float = 3000.0,
                            n_resolve_rounds: int = 3) -> EMPickResult:
    """Joint EM picking with cross-chromosome spot exclusivity.

    Behavior target: the reference's chrom_share_spots=False multi-
    chromosome DP (spot_tools/picking.py:1106-1125), which enumerates only
    spot-disjoint index combinations across chromosomes (via
    `_all_score_combinations` / `_optimized_score_combinations` — itself a
    top-k heuristic at scale).  TPU-native form: each EM iteration runs
    every chromosome's E-step + DP concurrently (vmap), then resolves
    contested (region, candidate) cells over `n_resolve_rounds`: the
    chromosome with the higher E-step score keeps the spot, losers re-run
    their DP with that cell banned.  Any contest still unresolved after
    the rounds invalidates the losers' picks for that region (never
    double-assigns).  Returns an EMPickResult batched over chromosomes.
    """
    c = chrom_centers.shape[0]
    r, m, _ = cand_spots.shape
    centers = jnp.asarray(chrom_centers, jnp.float32)
    has_any = jnp.any(cand_valid, axis=1)
    n_regions = jnp.maximum(jnp.sum(has_any), 1)

    def e_step(sel_idx, ctr):
        """Scores (R, M) for one chromosome given its current picks."""
        trace, ok = take_trace(cand_spots, cand_valid, sel_idx)
        sel_ok = ok & has_any
        refs = chromosome_ref_stats(
            jnp.where(sel_ok[:, None], trace, 0.0), sel_ok, ctr,
            pixel_size_nm, local_size)
        sc = score_candidates(cand_spots, cand_valid,
                              jnp.where(sel_ok[:, None], trace, 0.0),
                              sel_ok, ctr, refs, pixel_size_nm,
                              local_size, w_ctdist, w_lcdist, w_int,
                              max_distance_limit)
        nb_ref = jnp.where(jnp.isfinite(refs.nb_dist), refs.nb_dist, 500.0)
        return sc, nb_ref

    def dp(sc, nb_ref, avail):
        ok = cand_valid & avail
        idx, _ = dynamic_pick_spots(cand_spots, ok,
                                    jnp.where(ok, sc, -jnp.inf),
                                    region_ids, nb_ref, pixel_size_nm,
                                    w_nbdist, max_distance_limit)
        return idx

    def m_step(sel_idx):
        sc, nb_ref = jax.vmap(e_step)(sel_idx, centers)      # (C, R, M)
        avail0 = jnp.ones((c, r, m), bool)                    # (C, R, M)
        idx = jax.vmap(dp)(sc, nb_ref, avail0)                # (C, R)

        def resolve(_, state):
            idx, avail = state
            # one-hot of each chromosome's picks on its available table
            picked_ok = jnp.take_along_axis(
                cand_valid & avail, idx[..., None], axis=2)[..., 0]  # (C,R)
            onehot = (jnp.arange(m)[None, None, :] == idx[..., None]) \
                & picked_ok[..., None]                         # (C, R, M)
            counts = jnp.sum(onehot, axis=0)                   # (R, M)
            contested = counts > 1
            pick_sc = jnp.where(onehot, sc, -jnp.inf)          # (C, R, M)
            winner = jnp.argmax(pick_sc, axis=0)               # (R, M)
            loser = onehot & contested[None] \
                & (jnp.arange(c)[:, None, None] != winner[None])
            new_avail = avail & ~loser
            new_idx = jax.vmap(dp)(sc, nb_ref, new_avail)
            return new_idx, new_avail

        idx, avail = jax.lax.fori_loop(0, n_resolve_rounds, resolve,
                                       (idx, avail0))
        # hard finish: any residual contest keeps only the winner
        picked_ok = jnp.take_along_axis(
            cand_valid & avail, idx[..., None], axis=2)[..., 0]
        onehot = (jnp.arange(m)[None, None, :] == idx[..., None]) \
            & picked_ok[..., None]
        counts = jnp.sum(onehot, axis=0)
        pick_sc = jnp.where(onehot, sc, -jnp.inf)
        winner = jnp.argmax(pick_sc, axis=0)
        residual_loser = (onehot & (counts[None] > 1)
                          & (jnp.arange(c)[:, None, None] != winner[None]))
        keep = ~residual_loser
        sel_valid = picked_ok & jnp.take_along_axis(
            keep, idx[..., None], axis=2)[..., 0]
        # per-chromosome count of hard-invalidated picks (residual
        # contests the bounded resolve rounds did not settle)
        n_unresolved = jnp.sum(residual_loser, axis=(1, 2)).astype(
            jnp.int32)
        return idx, sel_valid, sc, n_unresolved

    # init: per-chromosome naive pick (ties resolved by the first M-step)
    sel0 = jax.vmap(lambda ctr: jnp.argmax(
        _naive_scores(cand_spots, cand_valid, ctr, pixel_size_nm),
        axis=1))(centers)                                      # (C, R)

    def cond(state):
        it, _idx, _v, change, _nu = state
        return (it < num_iters) & (change >= terminate_th)

    def body(state):
        it, idx, _v, _change, _nu = state
        new_idx, sel_valid, _sc, n_unres = m_step(idx)
        changed = jnp.sum((new_idx != idx) & has_any[None])
        ratio = changed.astype(jnp.float32) / (
            c * n_regions).astype(jnp.float32)
        return it + 1, new_idx, sel_valid, ratio, n_unres

    state0 = (jnp.int32(0), sel0, jnp.zeros((c, r), bool),
              jnp.float32(1.0), jnp.zeros((c,), jnp.int32))
    it, sel_idx, sel_valid, change, n_unresolved = jax.lax.while_loop(
        cond, body, state0)

    def finalize(idx, ok_c):
        trace, ok = take_trace(cand_spots, cand_valid, idx)
        ok = ok & ok_c
        return jnp.where(ok[:, None], trace, jnp.nan), ok

    trace, sel_ok = jax.vmap(finalize)(sel_idx, sel_valid)
    sc_final, _ = jax.vmap(e_step)(sel_idx, centers)
    picked_sc = jnp.take_along_axis(sc_final, sel_idx[..., None],
                                    axis=2)[..., 0]
    picked_sc = jnp.where(sel_ok, picked_sc, jnp.nan)
    return EMPickResult(trace=trace, sel_idx=sel_idx, sel_valid=sel_ok,
                        scores=picked_sc,
                        n_iters=jnp.broadcast_to(it, (c,)),
                        change_ratio=jnp.broadcast_to(change, (c,)),
                        n_unresolved=n_unresolved)


def build_candidate_table(spots_by_region, capacity: Optional[int] = None):
    """Host-side: {region_id: (n_i, 11) array} -> dense fixed-capacity
    (cand (R, M, 11) f32, valid (R, M) bool, region_ids (R,) int32) sorted
    by region id — the device-side layout all pickers consume.
    """
    import numpy as np

    ids = sorted(int(k) for k in spots_by_region)
    counts = [len(np.atleast_2d(spots_by_region[i]))
              if np.size(spots_by_region[i]) else 0 for i in ids]
    m = capacity or max(max(counts, default=1), 1)
    r = len(ids)
    cand = np.zeros((r, m, 11), np.float32)
    valid = np.zeros((r, m), bool)
    for j, rid in enumerate(ids):
        sp = np.atleast_2d(np.asarray(spots_by_region[rid], np.float32))
        if sp.size == 0:
            continue
        n = min(len(sp), m)
        # keep the brightest if over capacity
        if len(sp) > m:
            sp = sp[np.argsort(-sp[:, 0])[:m]]
        good = np.all(np.isfinite(sp[:n, 1:4]), axis=1)
        cand[j, :n] = sp[:n]
        valid[j, :n] = good
    return cand, valid, np.asarray(ids, np.int32)


# ---------------------------------------------------------------------------
# Candidate merging and chromosome assignment (reference picking.py:662-795)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("hard_intensity_th", "n_lists"))
def merge_spot_lists(spots: jnp.ndarray, valid: jnp.ndarray,
                     dist_th: float = 0.1, dist_norm: float = 2.0,
                     intensity_th: float = 0.0,
                     hard_intensity_th: bool = True,
                     n_lists: int = 1) -> jnp.ndarray:
    """Deduplicate concatenated candidate lists -> kept mask.

    Behavior target: reference merge_spot_list (picking.py:662-765): walk
    candidates in order; a still-kept spot removes every later spot
    within `dist_th` (pixels, `dist_norm`-norm).  The intensity screen
    runs first: hard mode drops every spot below `intensity_th`, soft
    mode keeps the top max(n_lists, #above-threshold) by intensity
    (:714-723).  The sequential first-come walk is a `fori_loop` over the
    precomputed pairwise-within-threshold matrix — each step is a masked
    row broadcast, matching the reference's iteration order exactly.
    """
    n = spots.shape[0]
    ints = jnp.where(valid, spots[:, 0], -jnp.inf)
    if hard_intensity_th:
        kept0 = valid & (spots[:, 0] >= intensity_th)
    else:
        order = jnp.argsort(-ints)
        rank = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        n_above = jnp.sum((ints >= intensity_th).astype(jnp.int32))
        keep_n = jnp.maximum(jnp.int32(n_lists), n_above)
        kept0 = valid & (rank < keep_n)
    diff = jnp.abs(spots[:, None, 1:4] - spots[None, :, 1:4])
    if dist_norm == 2.0:
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    else:
        d = jnp.sum(diff ** dist_norm, axis=-1) ** (1.0 / dist_norm)
    close = (d < dist_th) & valid[:, None] & valid[None, :]
    close = close & ~jnp.eye(n, dtype=bool)

    def body(i, kept):
        drop = kept[i] & close[i] & (jnp.arange(n) != i)
        return kept & ~drop

    return jax.lax.fori_loop(0, n, body, kept0)


@jax.jit
def assign_spots_to_chromosomes(spots: jnp.ndarray, valid: jnp.ndarray,
                                chrom_coords: jnp.ndarray,
                                pixel_size_nm=DEFAULT_PIXEL_SIZE_NM
                                ) -> jnp.ndarray:
    """Nearest-chromosome index per spot (-1 for invalid spots).

    Behavior target: reference assign_spots_to_chromosomes
    (picking.py:767-794): both spots and chromosome centers scale from
    pixels to nm before the distance argmin.  The ragged per-chromosome
    output lists become this index vector; gather rows with
    ``spots[assignment == k]`` on the host.
    """
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    zxys = spots[:, 1:4] * px[None]
    chrom_zxys = chrom_coords * px[None]
    d = jnp.linalg.norm(zxys[:, None] - chrom_zxys[None], axis=-1)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    return jnp.where(valid, idx, -1)
