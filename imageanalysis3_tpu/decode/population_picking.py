"""Population-reference spot picking: score every candidate against CDFs
pooled over the whole cell population, pick per-region maxima, iterate.

Behavior targets (reference spot_tools/picking.py, the "newer" picking
workflow consumed by current notebooks — distinct from the per-chromosome
EM of :1204-1530 implemented in decode/picking.py):
  * pick_spots_by_intensities (:1723-1749): per region keep the brightest
    candidate, NaN row where a region has none.
  * chromosome_center_dists (:1578-1656) / local_center_dists
    (:1658-1720): candidate distances to the chromosome center and to the
    NaN-aware mean of the picked trace's +-neighbor_len genomic
    neighbors (the candidate's own region id excluded), optionally
    per-channel.
  * generate_reference_from_population (:1768-1876): pool the picked
    spots' three metrics (intensity, center dist, local dist) over ALL
    chromosomes into sorted reference distributions, optionally split by
    color channel (collapse_regions=True; the collapse_regions=False
    branch of the reference is inert — its `for _i, _id in picked_ids`
    unpacking raises on any integer id array, so no working caller uses
    it).
  * cum_val (:1879-1899): fraction of a sorted reference below a target.
    The reference approximates rank/len by a capped binary search; here
    the CDF is the exact rank via `searchsorted` (the quantity the
    reference's slow_cum_val :1901-1903 defines), with the reference's
    two boundary conventions kept: rank 0 counts as 0.5 ("exclude zero
    value", :1895-1897) and rank is capped at count-1 so the distance
    score log(1-p) stays finite.
  * _maximize_score_spot_picking_of_chr (:1906-2013) /
    pick_spots_by_scores (:2017-2134): per-candidate score
    log p_int + w_ct*log(1-p_ct) + w_lc*log(1-p_lc), per-region argmax.
    (EM_pick_scores_in_population's serial branch multiplies raw CDFs
    instead of summing logs — a monotone transform picking the same
    spots; the multiprocessing branch both entry points share uses the
    log form, which is what this module implements.)
  * EM_pick_scores_in_population (:2137-2279): E = regenerate the
    reference distributions from the current picks, M = re-pick by
    score; the reference exposes one E+M step and notebooks loop it —
    here `em_pick_spots_in_population` runs the loop on device with a
    picked-set change-ratio stop.

TPU-first design: the reference's ragged per-chromosome lists of
per-region candidate arrays become one dense (n_chroms, n_regions,
max_cands, 4) hzxy tensor with a validity mask.  Neighbor means are an
(R, R) genomic-window weight matrix applied on the MXU, CDF lookups are
sort + searchsorted over fixed-capacity populations (+inf padded), and
the whole EM loop is a single `lax.while_loop` program — the
mp.Pool-of-12 fan-out over chromosomes (:2090-2094) becomes a vmap.

Deviation (documented): when no explicit center is given the reference's
two entry points disagree about the chromosome center — the pooled
maximization path centers on the *candidate* cloud
(_maximize_score... :1918 via ref_center=None) while the serial EM path
centers on the current *picked* trace (:2209).  This module uses the
picked-trace center (the EM fixpoint definition); pass `ref_centers`
explicitly for the other convention.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DEFAULT_PIXEL_SIZE_NM

_HIGH = jax.lax.Precision.HIGHEST


def spots_to_hzxys(spots: jnp.ndarray,
                   pixel_size_nm=DEFAULT_PIXEL_SIZE_NM) -> jnp.ndarray:
    """11-column spot rows -> hzxy rows in nm (reference :1738-1743)."""
    px = jnp.asarray(pixel_size_nm, jnp.float32)
    h = spots[..., 0:1]
    zxy = spots[..., 1:4] * px
    return jnp.concatenate([h, zxy], axis=-1)


@jax.jit
def pick_spots_by_intensities(cand_hzxys: jnp.ndarray,
                              cand_valid: jnp.ndarray) -> jnp.ndarray:
    """Brightest valid candidate per region; NaN row where none.

    cand_hzxys: (..., C, 4); cand_valid: (..., C) -> (..., 4).
    Reference :1723-1749."""
    h = jnp.where(cand_valid, cand_hzxys[..., 0], -jnp.inf)
    best = jnp.argmax(h, axis=-1)
    sel = jnp.take_along_axis(cand_hzxys, best[..., None, None].repeat(
        4, axis=-1), axis=-2)[..., 0, :]
    any_valid = jnp.any(cand_valid, axis=-1)
    return jnp.where(any_valid[..., None], sel, jnp.nan)


def _nan_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Finite-row mask over trailing hzxy axis."""
    return jnp.all(jnp.isfinite(x), axis=-1)


def chromosome_center_dists(cand_hzxys: jnp.ndarray,
                            cand_valid: jnp.ndarray,
                            ref_center: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """(R, C) candidate distances to the chromosome center.

    ref_center: (3,) zxy in nm, or None -> NaN-aware mean over all valid
    candidates (reference :1578-1656 with ref_center=None).
    """
    zxy = cand_hzxys[..., 1:4]
    if ref_center is None:
        ok = (cand_valid & _nan_rows(cand_hzxys)).astype(jnp.float32)
        num = jnp.sum(zxy * ok[..., None], axis=(0, 1))
        den = jnp.maximum(jnp.sum(ok), 1.0)
        ref_center = num / den
    return jnp.linalg.norm(zxy - ref_center[None, None], axis=-1)


def local_center_dists(cand_hzxys: jnp.ndarray, cand_valid: jnp.ndarray,
                       cand_ids: jnp.ndarray, ref_hzxys: jnp.ndarray,
                       ref_ids: jnp.ndarray, neighbor_len: int = 5,
                       channels: Optional[jnp.ndarray] = None,
                       ref_channels: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """(R, C) candidate distances to the local picked-trace center.

    The local center of region id is the NaN-aware mean of ref rows whose
    genomic id lies within +-neighbor_len, the candidate's own id
    excluded; with `channels`, only same-channel refs count (reference
    local_center_dists :1658-1720, split_channels path).  Regions whose
    window holds no finite ref get NaN dists (no penalty downstream).
    """
    did = jnp.abs(cand_ids[:, None] - ref_ids[None, :])
    w = ((did > 0) & (did <= neighbor_len))
    if channels is not None:
        if ref_channels is None:
            ref_channels = channels
        w = w & (channels[:, None] == ref_channels[None, :])
    w = w.astype(jnp.float32)                                  # (R, Rr)
    fin = _nan_rows(ref_hzxys).astype(jnp.float32)             # (Rr,)
    ref0 = jnp.where(jnp.isfinite(ref_hzxys), ref_hzxys, 0.0)
    num = jnp.einsum("rk,kj->rj", w, ref0 * fin[:, None],
                     precision=_HIGH)                          # (R, 4)
    den = jnp.einsum("rk,k->r", w, fin, precision=_HIGH)       # (R,)
    center = num / jnp.maximum(den, 1.0)[:, None]
    center = jnp.where((den > 0)[:, None], center, jnp.nan)
    d = jnp.linalg.norm(cand_hzxys[..., 1:4] - center[:, None, 1:4],
                        axis=-1)
    return d


class PopulationReference(NamedTuple):
    """Sorted (+inf padded) pooled metric populations, one row per group.

    Row 0 pools every chromosome and region ('all'); with `channels`
    given at generation, row 1+c pools only channel-c regions
    (reference generate_reference_from_population :1838-1875)."""
    ints: jnp.ndarray          # (G, K) ascending
    int_counts: jnp.ndarray    # (G,) int32
    ct_dists: jnp.ndarray      # (G, K)
    ct_counts: jnp.ndarray     # (G,)
    local_dists: jnp.ndarray   # (G, K)
    local_counts: jnp.ndarray  # (G,)


def _pooled_rows(values: jnp.ndarray, region_channels, n_channels: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, R) metric -> (G, N*R) sorted rows + (G,) finite counts."""
    flat = values.reshape(-1)
    fin = jnp.isfinite(flat)
    rows = [jnp.where(fin, flat, jnp.inf)]
    if n_channels:
        ch_flat = jnp.broadcast_to(region_channels[None, :],
                                   values.shape).reshape(-1)
        for c in range(n_channels):
            keep = fin & (ch_flat == c)
            rows.append(jnp.where(keep, flat, jnp.inf))
    stacked = jnp.stack(rows)
    counts = jnp.sum(jnp.isfinite(stacked), axis=1).astype(jnp.int32)
    return jnp.sort(stacked, axis=1), counts


@partial(jax.jit, static_argnames=("neighbor_len", "n_channels"))
def generate_reference_from_population(
        picked_hzxys: jnp.ndarray, picked_ids: jnp.ndarray,
        ref_hzxys: Optional[jnp.ndarray] = None,
        ref_ids: Optional[jnp.ndarray] = None,
        ref_centers: Optional[jnp.ndarray] = None,
        neighbor_len: int = 7,
        channels: Optional[jnp.ndarray] = None,
        n_channels: int = 0) -> PopulationReference:
    """Pool picked-spot metrics over all chromosomes into sorted rows.

    picked_hzxys: (N, R, 4) current picks (NaN rows for empty regions);
    ref_hzxys: (N, R, 4) trace the local centers are measured against
    (defaults to the picks, reference :1785-1788); ref_centers: (N, 3)
    explicit chromosome centers (defaults to each trace's NaN-aware
    mean).  Reference generate_reference_from_population :1768-1876.
    """
    if ref_hzxys is None:
        ref_hzxys = picked_hzxys
    if ref_ids is None:
        ref_ids = picked_ids
    fin = _nan_rows(picked_hzxys)                              # (N, R)

    # chromosome centers: NaN-aware mean of each picked trace
    if ref_centers is None:
        okf = fin.astype(jnp.float32)
        num = jnp.sum(jnp.where(fin[..., None], picked_hzxys[..., 1:4],
                                0.0), axis=1)
        ref_centers = num / jnp.maximum(jnp.sum(okf, axis=1), 1.0)[:, None]

    ct_dists = jnp.linalg.norm(picked_hzxys[..., 1:4]
                               - ref_centers[:, None], axis=-1)  # (N, R)

    def local_of_chr(pk, rf):
        return local_center_dists(pk[:, None, :],
                                  jnp.ones(pk.shape[0], bool)[:, None],
                                  picked_ids, rf, ref_ids,
                                  neighbor_len=neighbor_len,
                                  channels=channels)[:, 0]

    local_dists = jax.vmap(local_of_chr)(picked_hzxys, ref_hzxys)  # (N, R)
    ints = picked_hzxys[..., 0]

    # NaN picks contribute nothing (matches the reference's isnan drop)
    ct_dists = jnp.where(fin, ct_dists, jnp.nan)
    local_dists = jnp.where(fin, local_dists, jnp.nan)
    ints = jnp.where(fin, ints, jnp.nan)

    i_rows, i_cts = _pooled_rows(ints, channels, n_channels)
    c_rows, c_cts = _pooled_rows(ct_dists, channels, n_channels)
    l_rows, l_cts = _pooled_rows(local_dists, channels, n_channels)
    return PopulationReference(i_rows, i_cts, c_rows, c_cts, l_rows, l_cts)


def cum_val(sorted_vals: jnp.ndarray, count: jnp.ndarray,
            targets: jnp.ndarray) -> jnp.ndarray:
    """P(ref < target) over the first `count` entries of a sorted row.

    Exact-rank form of reference cum_val :1879-1899 (see module
    docstring): rank clipped to [0.5, count-1], NaN targets rank 0.5
    (the reference's binary search degenerates to index ~0 on NaN, so a
    NaN distance carries no penalty); empty populations score neutral.
    """
    rank = jnp.searchsorted(sorted_vals, targets, side="left")
    rank = jnp.where(jnp.isnan(targets), 0, rank).astype(jnp.float32)
    cnt = jnp.maximum(count.astype(jnp.float32), 1.0)
    p = jnp.clip(rank, 0.5, jnp.maximum(cnt - 1.0, 0.5)) / cnt
    return jnp.where(count > 0, p, 0.5)


class PopulationPickResult(NamedTuple):
    sel_hzxys: jnp.ndarray    # (N, R, 4) picked rows (NaN where none)
    sel_scores: jnp.ndarray   # (N, R) picked log scores (NaN where none)
    sel_idx: jnp.ndarray      # (N, R) candidate slot picked
    all_scores: jnp.ndarray   # (N, R, C) per-candidate log scores (-inf
    #                           on invalid slots)


@partial(jax.jit, static_argnames=(
    "neighbor_len", "n_channels", "split_intensity_channels",
    "split_distance_channels", "center_weight", "local_weight"))
def pick_spots_by_scores(cand_hzxys: jnp.ndarray, cand_valid: jnp.ndarray,
                         cand_ids: jnp.ndarray,
                         ref_hzxys: jnp.ndarray,
                         reference: PopulationReference,
                         ref_ids: Optional[jnp.ndarray] = None,
                         ref_centers: Optional[jnp.ndarray] = None,
                         neighbor_len: int = 7,
                         center_weight: float = 1.0,
                         local_weight: float = 1.0,
                         channels: Optional[jnp.ndarray] = None,
                         n_channels: int = 0,
                         split_intensity_channels: bool = False,
                         split_distance_channels: bool = False
                         ) -> PopulationPickResult:
    """Score all candidates against the population CDFs, pick per-region
    maxima (reference pick_spots_by_scores :2017-2134 /
    _maximize_score_spot_picking_of_chr :1906-2013).

    cand_hzxys: (N, R, C, 4) in nm; ref_hzxys: (N, R, 4) current picks.
    Score = log p_int + center_weight*log(1-p_ct)
          + local_weight*log(1-p_lc); set a weight to 0 to drop a term
    (the reference's use_center/use_local switches).
    """
    if ref_ids is None:
        ref_ids = cand_ids
    n, r, c = cand_hzxys.shape[:3]
    fin = _nan_rows(ref_hzxys)
    if ref_centers is None:
        num = jnp.sum(jnp.where(fin[..., None], ref_hzxys[..., 1:4], 0.0),
                      axis=1)
        ref_centers = num / jnp.maximum(
            jnp.sum(fin.astype(jnp.float32), axis=1), 1.0)[:, None]

    ct_dists = jnp.linalg.norm(
        cand_hzxys[..., 1:4] - ref_centers[:, None, None], axis=-1)

    local_d = jax.vmap(
        lambda ch, cv, rh: local_center_dists(
            ch, cv, cand_ids, rh, ref_ids, neighbor_len=neighbor_len,
            channels=channels if split_distance_channels else None)
    )(cand_hzxys, cand_valid, ref_hzxys)                        # (N, R, C)

    # group row per region: 0 = 'all', 1+c = channel c
    if n_channels and channels is not None:
        ch_row = channels.astype(jnp.int32) + 1                # (R,)
    else:
        ch_row = jnp.zeros(r, jnp.int32)
    int_row = ch_row if split_intensity_channels else jnp.zeros(
        r, jnp.int32)
    dist_row = ch_row if split_distance_channels else jnp.zeros(
        r, jnp.int32)

    def lookup(rows, counts, row_idx, targets):
        # targets (N, R, C); row_idx (R,) -> per-region CDF lookups
        def per_region(row_i, t_col):
            return cum_val(rows[row_i], counts[row_i], t_col)
        return jax.vmap(per_region, in_axes=(0, 1), out_axes=1)(
            row_idx, targets)

    p_int = lookup(reference.ints, reference.int_counts, int_row,
                   cand_hzxys[..., 0])
    score = jnp.log(p_int)
    if center_weight != 0.0:
        p_ct = lookup(reference.ct_dists, reference.ct_counts, dist_row,
                      ct_dists)
        score = score + center_weight * jnp.log1p(-p_ct)
    if local_weight != 0.0:
        p_lc = lookup(reference.local_dists, reference.local_counts,
                      dist_row, local_d)
        score = score + local_weight * jnp.log1p(-p_lc)

    score = jnp.where(cand_valid, score, -jnp.inf)
    best = jnp.argmax(score, axis=-1)                          # (N, R)
    sel = jnp.take_along_axis(
        cand_hzxys, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    sel_sc = jnp.take_along_axis(score, best[..., None], axis=-1)[..., 0]
    any_valid = jnp.any(cand_valid, axis=-1)
    sel = jnp.where(any_valid[..., None], sel, jnp.nan)
    sel_sc = jnp.where(any_valid, sel_sc, jnp.nan)
    return PopulationPickResult(sel, sel_sc, best, score)


class PopulationEMResult(NamedTuple):
    sel_hzxys: jnp.ndarray   # (N, R, 4)
    sel_scores: jnp.ndarray  # (N, R)
    sel_idx: jnp.ndarray     # (N, R)
    n_iters: jnp.ndarray     # () int32 E+M rounds run
    change_ratio: jnp.ndarray  # () fraction of picks changed in the last M


@partial(jax.jit, static_argnames=(
    "neighbor_len", "n_channels", "split_intensity_channels",
    "split_distance_channels", "max_niter", "center_weight",
    "local_weight", "change_th"))
def em_pick_spots_in_population(cand_hzxys: jnp.ndarray,
                                cand_valid: jnp.ndarray,
                                cand_ids: jnp.ndarray,
                                init_hzxys: Optional[jnp.ndarray] = None,
                                neighbor_len: int = 5,
                                center_weight: float = 1.0,
                                local_weight: float = 1.0,
                                channels: Optional[jnp.ndarray] = None,
                                n_channels: int = 0,
                                split_intensity_channels: bool = False,
                                split_distance_channels: bool = False,
                                max_niter: int = 10,
                                change_th: float = 0.005
                                ) -> PopulationEMResult:
    """EM loop over population-reference picking (reference
    EM_pick_scores_in_population :2137-2279, which exposes one E+M step
    that notebooks iterate; the loop and its picked-set change-ratio
    stop run on device here).

    E: regenerate the pooled CDF references from the current picks;
    M: re-pick every region by score.  Stops when the fraction of
    regions whose picked candidate changed drops below `change_th`.
    """
    if init_hzxys is None:
        init_hzxys = pick_spots_by_intensities(cand_hzxys, cand_valid)
    n_filled = jnp.maximum(
        jnp.sum(jnp.any(cand_valid, axis=-1).astype(jnp.float32)), 1.0)
    init_idx = jnp.argmax(
        jnp.where(cand_valid, cand_hzxys[..., 0], -jnp.inf), axis=-1)

    def step(state):
        i, picked, idx, _change = state
        ref = generate_reference_from_population(
            picked, cand_ids, neighbor_len=neighbor_len,
            channels=channels, n_channels=n_channels)
        res = pick_spots_by_scores(
            cand_hzxys, cand_valid, cand_ids, picked, ref,
            neighbor_len=neighbor_len, center_weight=center_weight,
            local_weight=local_weight, channels=channels,
            n_channels=n_channels,
            split_intensity_channels=split_intensity_channels,
            split_distance_channels=split_distance_channels)
        changed = jnp.sum(((res.sel_idx != idx)
                           & jnp.any(cand_valid, -1)).astype(jnp.float32))
        return i + 1, res.sel_hzxys, res.sel_idx, changed / n_filled

    def cond(state):
        i, _, _, change = state
        return (i < max_niter) & (change > change_th)

    i0 = jnp.int32(0)
    state = jax.lax.while_loop(
        cond, step,
        (i0, init_hzxys.astype(jnp.float32), init_idx,
         jnp.asarray(jnp.inf, jnp.float32)))
    n_it, picked, idx, change = state
    # final scores for the converged picks
    ref = generate_reference_from_population(
        picked, cand_ids, neighbor_len=neighbor_len, channels=channels,
        n_channels=n_channels)
    res = pick_spots_by_scores(
        cand_hzxys, cand_valid, cand_ids, picked, ref,
        neighbor_len=neighbor_len, center_weight=center_weight,
        local_weight=local_weight, channels=channels,
        n_channels=n_channels,
        split_intensity_channels=split_intensity_channels,
        split_distance_channels=split_distance_channels)
    score = jnp.take_along_axis(res.all_scores, idx[..., None],
                                axis=-1)[..., 0]
    score = jnp.where(jnp.any(cand_valid, -1), score, jnp.nan)
    return PopulationEMResult(picked, score, idx, n_it, change)


@jax.jit
def evaluate_differences(old_hzxys: jnp.ndarray,
                         new_hzxys: jnp.ndarray) -> jnp.ndarray:
    """Fraction of picked positions that moved < 0.01 nm between two pick
    sets, over positions finite in both (reference evaluate_differences,
    picking.py:2280-2284)."""
    d = jnp.linalg.norm(old_hzxys[..., 1:4] - new_hzxys[..., 1:4], axis=-1)
    fin = jnp.isfinite(d)
    n = jnp.maximum(jnp.sum(fin.astype(jnp.float32)), 1.0)
    return jnp.sum(((d < 0.01) & fin).astype(jnp.float32)) / n


@partial(jax.jit, static_argnames=("keep_no_ref",))
def screen_rna_based_on_refs(cand_hzxys: jnp.ndarray,
                             cand_valid: jnp.ndarray,
                             cand_to_ref: jnp.ndarray,
                             ref_hzxys: jnp.ndarray,
                             dist_th: float = 500.0,
                             keep_no_ref: bool = False) -> jnp.ndarray:
    """Keep RNA candidates within `dist_th` nm of their DNA reference.

    cand_hzxys: (R', C, 4); cand_to_ref: (R',) index of each RNA region's
    reference row in ref_hzxys (R, 4).  Regions whose reference is NaN
    keep everything (keep_no_ref=True) or nothing (False).  Returns the
    screened validity mask (reference screen_RNA_based_on_refs,
    picking.py:2287-2316 — the ragged empty-list outputs become mask
    clears).
    """
    ref = ref_hzxys[cand_to_ref]                           # (R', 4)
    ref_ok = jnp.all(jnp.isfinite(ref[:, 1:4]), axis=-1)
    d = jnp.linalg.norm(cand_hzxys[..., 1:4] - ref[:, None, 1:4], axis=-1)
    near = cand_valid & (d <= dist_th)
    if keep_no_ref:
        return jnp.where(ref_ok[:, None], near, cand_valid)
    return jnp.where(ref_ok[:, None], near, False)
