"""Center matching across rounds/channels: pairing, outlier checks, bead
alignment.

Behavior targets (reference ImageAnalysis3):
  * unique center pairing          spot_tools/matching.py:148-223
    (find_paired_centers: shift ref by rough drift, keep mutually unique
    pairs within a cutoff, return the mean tar-ref shift)
  * neighbor-consistency check     spot_tools/matching.py:224-287
    (check_paired_centers: Delaunay-neighborhood expected shift, drop
    pairs deviating > mean + outlier_sigma * std)
  * bead-match aligner             correction_tools/alignment.py:139-216
    (align_beads: FFT rough drift -> pair -> check -> mean residual)

TPU-first design: fixed-capacity masked center tables; pairing is one
(N, M) distance matrix with row/column-uniqueness votes; the Delaunay
neighborhood is replaced by k-nearest-neighbor weighting (equivalent
statistic, regular compute).  Drift convention: returned drift `d`
satisfies ``tar + d ~= ref`` — the same convention as
``subpixel_phase_correlation`` and the coordinate warp
(coords + drift maps a round onto the reference frame).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .drift import fft3d_from2d


class PairedCenters(NamedTuple):
    drift: jnp.ndarray       # (3,) mean(ref - tar) over kept pairs
    tar: jnp.ndarray         # (N, 3) tar centers (row i valid iff mask[i])
    ref: jnp.ndarray         # (N, 3) matched ref centers
    mask: jnp.ndarray        # (N,) pair validity
    n_pairs: jnp.ndarray     # () int32


@partial(jax.jit, static_argnames=())
def find_paired_centers(tar_cts: jnp.ndarray, tar_valid: jnp.ndarray,
                        ref_cts: jnp.ndarray, ref_valid: jnp.ndarray,
                        drift: Optional[jnp.ndarray] = None,
                        cutoff: float = 2.0) -> PairedCenters:
    """Uniquely pair target centers to (drift-shifted) reference centers.

    Reference semantics (spot_tools/matching.py:148-223) with our drift
    convention: candidate match iff |tar + drift - ref| <= cutoff, kept iff
    the match is unique in both row and column.
    """
    if drift is None:
        drift = jnp.zeros(3, jnp.float32)
    adj_tar = tar_cts + drift[None]
    d = jnp.linalg.norm(adj_tar[:, None] - ref_cts[None], axis=-1)
    ok = tar_valid[:, None] & ref_valid[None, :]
    within = (d <= cutoff) & ok
    row_ct = jnp.sum(within, axis=1)
    col_ct = jnp.sum(within, axis=0)
    j = jnp.argmax(within, axis=1)                  # the (unique) match
    pair_ok = (row_ct == 1) & (col_ct[j] == 1)
    ref_matched = ref_cts[j]
    n = jnp.sum(pair_ok)
    shift = jnp.sum(jnp.where(pair_ok[:, None], ref_matched - tar_cts, 0.0),
                    axis=0) / jnp.maximum(n, 1)
    return PairedCenters(drift=shift, tar=tar_cts, ref=ref_matched,
                         mask=pair_ok, n_pairs=n.astype(jnp.int32))


@partial(jax.jit, static_argnames=("k",))
def check_paired_centers(pairs: PairedCenters, outlier_sigma: float = 1.5,
                         k: int = 6) -> PairedCenters:
    """Drop pairs whose shift deviates from their neighborhood's expected
    shift by more than mean + outlier_sigma * std.

    Reference semantics (spot_tools/matching.py:224-287) with the Delaunay
    simplex neighborhood replaced by the k nearest valid pairs weighted by
    1/distance — the same local-consistency statistic in regular compute.
    """
    shifts = pairs.ref - pairs.tar                       # per-pair drift
    d = jnp.linalg.norm(pairs.ref[:, None] - pairs.ref[None], axis=-1)
    both = pairs.mask[:, None] & pairs.mask[None]
    n = d.shape[0]
    d = jnp.where(both, d, jnp.inf)
    d = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d)
    kk = min(k, n)
    neg, idx = jax.lax.top_k(-d, kk)                     # (N, k) nearest
    nb_ok = jnp.isfinite(neg)
    w = jnp.where(nb_ok, 1.0 / jnp.maximum(-neg, 1e-6), 0.0)
    w_sum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    expected = jnp.einsum("nk,nkd->nd", w / w_sum, shifts[idx])
    diff = jnp.linalg.norm(expected - shifts, axis=1)
    diff_m = jnp.where(pairs.mask, diff, jnp.nan)
    mean = jnp.nanmean(diff_m)
    std = jnp.nanstd(diff_m)
    keep = pairs.mask & (diff < mean + outlier_sigma * std)
    n_kept = jnp.sum(keep)
    drift = jnp.sum(jnp.where(keep[:, None], shifts, 0.0), axis=0) \
        / jnp.maximum(n_kept, 1)
    return PairedCenters(drift=drift, tar=pairs.tar, ref=pairs.ref,
                         mask=keep, n_pairs=n_kept.astype(jnp.int32))


@partial(jax.jit, static_argnames=("check", "k"))
def align_beads(tar_cts: jnp.ndarray, tar_valid: jnp.ndarray,
                ref_cts: jnp.ndarray, ref_valid: jnp.ndarray,
                tar_im: jnp.ndarray, ref_im: jnp.ndarray,
                match_distance_th: float = 2.0,
                outlier_sigma: float = 1.5,
                check: bool = True, k: int = 6) -> PairedCenters:
    """Bead-match drift: FFT rough alignment, unique pairing, neighbor
    check, mean residual drift (reference align_beads,
    correction_tools/alignment.py:139-216, use_fft=True path).

    The robust alternative to phase correlation when the drift channel is
    sparse beads.  Returns drift with ``tar + drift ~= ref``.
    """
    rough = fft3d_from2d(tar_im, ref_im)
    pairs = find_paired_centers(tar_cts, tar_valid, ref_cts, ref_valid,
                                rough, cutoff=match_distance_th)
    if check:
        checked = check_paired_centers(pairs, outlier_sigma, k=k)
        # fall back to the unchecked pairing when too few pairs survive
        use = checked.n_pairs > 3
        return PairedCenters(
            drift=jnp.where(use, checked.drift, pairs.drift),
            tar=pairs.tar, ref=pairs.ref,
            mask=jnp.where(use, checked.mask, pairs.mask),
            n_pairs=jnp.where(use, checked.n_pairs, pairs.n_pairs))
    return pairs


# ---------------------------------------------------------------------------
# Re-mount / cross-experiment rigid alignment
# ---------------------------------------------------------------------------


def rigid_transform_from_points(before, after):
    """Best-fit rigid transform (R, t) with after ~= before @ R + t.

    Behavior target: align_manual_points
    (correction_tools/alignment.py:7-77): SVD of the centered cross
    covariance, det-corrected rotation, translation from the centroids.
    Host-side numpy (a handful of manually picked points).
    """
    import numpy as np

    before = np.asarray(before, np.float64)
    after = np.asarray(after, np.float64)
    c_before = before.mean(axis=0)
    c_after = after.mean(axis=0)
    h = (before - c_before).T @ (after - c_after)
    # Kabsch / orthogonal Procrustes: argmin ||X R - Y|| = U Vt for
    # X.T Y = U S Vt, reflections removed by flipping the last column of
    # U before the product (valid in any dimension, unlike the
    # reference's 2D-only (Vt U.T).T form)
    u, _, vt = np.linalg.svd(h)
    if np.linalg.det(u @ vt) < 0:
        u[:, -1] = -u[:, -1]
    r = u @ vt
    t = -c_before @ r + c_after
    return r, t


def align_manual_points(pos_file_before: str, pos_file_after: str):
    """File front door matching the reference signature: two comma-
    delimited stage-position files -> (R, t)."""
    import numpy as np

    return rigid_transform_from_points(
        np.loadtxt(pos_file_before, delimiter=","),
        np.loadtxt(pos_file_after, delimiter=","))


@jax.jit
def translate_spot_coordinates(spots: jnp.ndarray, rotation_xy: jnp.ndarray,
                               center_xy: jnp.ndarray,
                               drift: Optional[jnp.ndarray] = None
                               ) -> jnp.ndarray:
    """Rotate spot xy about the image center and shift — spots into
    another experiment's frame (reference MicroscopeTranslate_Spots /
    translate_spot_coordinates, spot_tools/translating.py:95-149).

    spots: (N, 11) natural rows; z passes through.
    """
    if drift is None:
        drift = jnp.zeros(3, jnp.float32)
    xy = spots[:, 2:4] - center_xy[None]
    new_xy = xy @ rotation_xy.astype(spots.dtype) + center_xy[None]
    out = spots.at[:, 2:4].set(new_xy)
    return out.at[:, 1:4].add(drift[None])


def select_matched_spots(cand_spots, ref_zxy, dist_th_nm: float,
                         pixel_size_nm=(200.0, 108.0, 108.0)):
    """Brightest candidate within `dist_th_nm` of a reference position ->
    (row, found) — the per-region core of convert_pick_RNA_spots
    (spot_tools/matching.py:6-88)."""
    import numpy as np

    cand = np.atleast_2d(np.asarray(cand_spots))
    if cand.size == 0:
        return np.full(11, np.nan), False
    px = np.asarray(pixel_size_nm)
    d = np.linalg.norm((cand[:, 1:4] - np.asarray(ref_zxy)[None]) * px,
                       axis=1)
    keep = d <= dist_th_nm
    if not keep.any():
        return np.full(11, np.nan), False
    sub = cand[keep]
    return sub[np.argmax(sub[:, 0])], True


def fit_matched_centers(im, ref_centers, match_distance_th: float = 3.0,
                        th_seed: float = 300.0, max_num_seeds: int = 256,
                        **fit_kwargs) -> PairedCenters:
    """Fit spot centers in `im` and uniquely pair them to `ref_centers`
    (reference fit_matched_centers, spot_tools/matching.py:89-147) —
    the cross-experiment anchor-matching step of RNA->DNA conversion."""
    import numpy as np

    from .gaussian_fit import get_centers

    centers, valid = get_centers(jnp.asarray(im), th_seed=th_seed,
                                 max_num_seeds=max_num_seeds, **fit_kwargs)
    ref = np.atleast_2d(np.asarray(ref_centers, np.float32))
    n = max(len(ref), centers.shape[0])
    ref_p = np.zeros((n, 3), np.float32)
    ref_p[:len(ref)] = ref
    ref_v = np.zeros(n, bool)
    ref_v[:len(ref)] = True
    cen_p = jnp.zeros((n, 3), jnp.float32).at[:centers.shape[0]].set(centers)
    cen_v = jnp.zeros(n, bool).at[:valid.shape[0]].set(valid)
    return find_paired_centers(cen_p, cen_v, jnp.asarray(ref_p),
                               jnp.asarray(ref_v),
                               cutoff=match_distance_th)


def generate_recombined_spots(repeat_cand_spots, repeat_ids,
                              original_cand_spots, original_ids):
    """Replace relabeled regions' candidates with the repeat-hyb fits
    (reference spot_tools/relabelling.py:6-31)."""
    import numpy as np

    if len(repeat_cand_spots) != len(repeat_ids):
        raise IndexError("repeat spots/ids length mismatch")
    if len(original_cand_spots) != len(original_ids):
        raise IndexError("original spots/ids length mismatch")
    out = list(original_cand_spots)
    original_ids = np.asarray(original_ids)
    for rid, spots in zip(repeat_ids, repeat_cand_spots):
        idx = np.where(original_ids == rid)[0]
        if len(idx) != 1:
            raise ValueError(f"region {rid} has {len(idx)} matches")
        out[int(idx[0])] = spots
    return out


@jax.jit
def accumulate_sequential_drifts(step_drifts: jnp.ndarray) -> jnp.ndarray:
    """Cumulative drift vs round 0 from consecutive-round step drifts.

    `step_drifts`: (R-1, 3), row r = drift of round r+1 vs round r.
    Returns (R, 3): row 0 zeros, row i = sum of steps 1..i (reference
    Calculate_Bead_Drift sequential mode, corrections.py:21-278)."""
    cum = jnp.cumsum(step_drifts.astype(jnp.float32), axis=0)
    return jnp.concatenate([jnp.zeros((1, 3), cum.dtype), cum])
