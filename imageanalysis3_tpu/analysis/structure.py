"""Structure analysis: contacts, inter-domain interactions, loop-outs,
genome-wide summaries.

Behavior targets (reference ImageAnalysis3):
  * contact maps / domain contact frequency
    domain_tools/calling.py:826-855 (_domain_contact_freq usage),
    structure_tools/contact.py
  * inter-domain interaction calling
    domain_tools/interaction.py:267-600 (iterative_interdomain_calling:
    mark domain pairs whose cross-block separation is low, refine)
  * loop-out detection
    domain_tools/interaction.py:602-638 (loop_out_markers: regions whose
    local window sits unusually close to a foreign domain)
  * genome-wide distance summaries keyed by chromosome
    structure_tools/distance.py

Single-cell matrices are small (R <= a few hundred), so these run as
vectorized NumPy over the device-produced distance maps; population
reductions reuse analysis.distmap.median_distance_map.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .domains import domain_segment_distance


def contact_map(distmap: np.ndarray, contact_th: float = 500.0
                ) -> np.ndarray:
    """Boolean contact map: distance below `contact_th` nm."""
    dm = np.asarray(distmap, float)
    with np.errstate(invalid="ignore"):
        return (dm < contact_th) & np.isfinite(dm)


def domain_contact_freq(distmap: np.ndarray, starts: Sequence[int],
                        contact_th: float = 500.0) -> np.ndarray:
    """(D, D) mean contact frequency between domain blocks (reference
    _domain_contact_freq, used by merge_domain_by_contact_correlation,
    domain_tools/calling.py:826-855)."""
    dm = np.asarray(distmap, float)
    starts = np.asarray(sorted(starts), int)
    ends = np.append(starts[1:], len(dm))
    cm = contact_map(dm, contact_th).astype(float)
    fin = np.isfinite(dm).astype(float)
    d = len(starts)
    out = np.zeros((d, d))
    for i in range(d):
        for j in range(d):
            blk = cm[starts[i]:ends[i], starts[j]:ends[j]]
            nrm = fin[starts[i]:ends[i], starts[j]:ends[j]]
            out[i, j] = blk.sum() / max(nrm.sum(), 1.0)
    return out


def inter_domain_interactions(distmap: np.ndarray, starts: Sequence[int],
                              separation_th: float = 0.55,
                              exclude_neighbors: bool = True
                              ) -> List[Tuple[int, int]]:
    """Interacting (merged-in-space) domain pairs: cross-block separation
    statistic below `separation_th` (reference inter_domain_markers /
    iterative_interdomain_calling initial pass,
    domain_tools/interaction.py:267-330)."""
    dm = np.asarray(distmap, float)
    starts = np.asarray(sorted(starts), int)
    ends = np.append(starts[1:], len(dm))
    pairs = []
    for i in range(len(starts)):
        for j in range(i + 1, len(starts)):
            if exclude_neighbors and j == i + 1:
                continue
            sep = domain_segment_distance(dm, (starts[i], ends[i]),
                                          (starts[j], ends[j]))
            if np.isfinite(sep) and sep < separation_th:
                pairs.append((i, j))
    return pairs


def loop_out_scores(distmap: np.ndarray, starts: Sequence[int],
                    window: int = 5) -> np.ndarray:
    """(R, D) separation of each region's local window from each domain;
    low values against a foreign domain flag a loop-out (reference
    loop_out_markers, domain_tools/interaction.py:602-638).
    """
    dm = np.asarray(distmap, float)
    r = len(dm)
    starts = np.asarray(sorted(starts), int)
    ends = np.append(starts[1:], r)
    d = len(starts)
    own = np.zeros(r, int)
    for k in range(d):
        own[starts[k]:ends[k]] = k
    out = np.full((r, d), np.nan)
    half = window // 2
    for pos in range(r):
        lo, hi = max(0, pos - half), min(r, pos + half + 1)
        for k in range(d):
            if k == own[pos]:
                continue
            inter = dm[lo:hi, starts[k]:ends[k]].ravel()
            intra = dm[lo:hi, lo:hi][np.triu_indices(hi - lo, 1)]
            inter = inter[np.isfinite(inter)]
            intra = intra[np.isfinite(intra)]
            if len(inter) == 0 or len(intra) == 0:
                continue
            m_i, m_o = np.median(intra), np.median(inter)
            v = np.median((inter - m_o) ** 2) + np.median((intra - m_i) ** 2)
            out[pos, k] = (m_o - m_i) / np.sqrt(max(v, 1e-12))
    return out


def call_loop_outs(distmap: np.ndarray, starts: Sequence[int],
                   loop_out_th: float = 0.0, window: int = 5
                   ) -> List[Tuple[int, int]]:
    """(region, domain) pairs where the region loops into a foreign domain
    (separation below `loop_out_th`)."""
    scores = loop_out_scores(distmap, starts, window)
    pos, dom = np.where(np.nan_to_num(scores, nan=np.inf) < loop_out_th)
    return list(zip(pos.tolist(), dom.tolist()))


def genome_distance_summary(chr_2_zxys: Dict[str, np.ndarray],
                            ) -> Tuple[Dict[str, np.ndarray],
                                       Dict[Tuple[str, str], float]]:
    """Per-chromosome median distance maps + median inter-chromosome
    distances across cells (reference structure_tools/distance.py).

    chr_2_zxys: chr -> (n_cells, R_chr, 3) nm traces (NaN = missing).
    """
    intra: Dict[str, np.ndarray] = {}
    for name, z in chr_2_zxys.items():
        z = np.asarray(z, float)
        d = np.linalg.norm(z[:, :, None] - z[:, None, :], axis=-1)
        intra[name] = np.nanmedian(d, axis=0)
    inter: Dict[Tuple[str, str], float] = {}
    names = sorted(chr_2_zxys)
    for i, a in enumerate(names):
        za = np.asarray(chr_2_zxys[a], float)
        ca = np.nanmean(za, axis=1)                      # (cells, 3)
        for b in names[i + 1:]:
            zb = np.asarray(chr_2_zxys[b], float)
            cb = np.nanmean(zb, axis=1)
            inter[(a, b)] = float(np.nanmedian(
                np.linalg.norm(ca - cb, axis=1)))
    return intra, inter


# ---------------------------------------------------------------------------
# Iterative inter-domain refinement (reference interaction.py:73-360)
# ---------------------------------------------------------------------------


def _norm_logpdf_sum(x: np.ndarray, mu: float, sigma: float) -> float:
    sigma = max(float(sigma), 1e-9)
    return float(np.sum(-0.5 * ((x - mu) / sigma) ** 2
                        - np.log(sigma * np.sqrt(2 * np.pi))))


def interdomain_likelihood(distmap: np.ndarray, starts: Sequence[int],
                           pairs: Sequence[Tuple[int, int]],
                           w_sel: float = 1.0, w_intra: float = 0.05,
                           valid_count: int = 5, normalize: bool = True,
                           exclude_neighbors: bool = True) -> np.ndarray:
    """(D, D) log-likelihood-ratio matrix for domain interactions.

    Behavior target: _interdomain_likelihood
    (domain_tools/interaction.py:73-158): per domain, fit Gaussians to its
    called-partner cross-blocks (positive), its uncalled cross-blocks
    (negative) and its intra block; each candidate partner's cross-block
    scores log P(pos)-log P(neg) (weight w_sel) plus
    log P(intra)-log P(neg) (weight w_intra), normalized per entry; self
    and (optionally) chain neighbors are -inf.
    """
    dm = np.asarray(distmap, float)
    starts = np.asarray(sorted(starts), int)
    ends = np.append(starts[1:], len(dm))
    d = len(starts)
    called = [set() for _ in range(d)]
    for a, b in pairs:
        called[a].add(b)
        called[b].add(a)
    lks = np.zeros((d, d))
    for i in range(d):
        partners = sorted(called[i])
        intra = dm[starts[i]:ends[i], starts[i]:ends[i]]
        intra = intra[np.isfinite(intra)]
        blocks = [dm[starts[j]:ends[j], starts[i]:ends[i]] for j in range(d)]
        if (not partners or len(partners) >= d - 1
                or len(intra) <= valid_count):
            row_pn = np.full(d, -np.inf)
            row_in = np.full(d, -np.inf)
        else:
            pos = np.concatenate([blocks[j].ravel() for j in partners])
            neg_ids = [j for j in range(d)
                       if j not in called[i] and j != i]
            neg = np.concatenate([blocks[j].ravel() for j in neg_ids])
            pos = pos[np.isfinite(pos)]
            neg = neg[np.isfinite(neg)]
            p_mu, p_sd = np.mean(pos), np.std(pos)
            n_mu, n_sd = np.mean(neg), np.std(neg)
            i_mu, i_sd = np.mean(intra), np.std(intra)
            row_pn, row_in = np.zeros(d), np.zeros(d)
            for j in range(d):
                if j == i or (exclude_neighbors and abs(j - i) == 1):
                    row_pn[j] = row_in[j] = -np.inf
                    continue
                blk = blocks[j].ravel()
                blk = blk[np.isfinite(blk)]
                if len(blk) == 0:
                    row_pn[j] = row_in[j] = -np.inf
                    continue
                pn = (_norm_logpdf_sum(blk, p_mu, p_sd)
                      - _norm_logpdf_sum(blk, n_mu, n_sd))
                inr = (_norm_logpdf_sum(blk, i_mu, i_sd)
                       - _norm_logpdf_sum(blk, n_mu, n_sd))
                if normalize:
                    pn /= len(blk)
                    inr /= len(blk)
                row_pn[j] = pn
                row_in[j] = inr
        if w_sel:
            lks[i] += row_pn * w_sel
            lks[:, i] += row_pn * w_sel
        if w_intra:
            lks[i] += row_in * w_intra
            lks[:, i] += row_in * w_intra
    return lks


def _adjust_pairs_by_likelihood(pairs, lks, percent_th=1.0,
                                learning_rate=0.3):
    """Exchange pairs across the likelihood thresholds (reference
    _adjust_interdomain_by_likelihood, interaction.py:189-266)."""
    d = lks.shape[0]
    sel = np.zeros((d, d), bool)
    for a, b in pairs:
        sel[a, b] = sel[b, a] = True
    sel_lks = lks[sel & np.isfinite(lks)]
    exc_lks = lks[~sel & np.isfinite(lks)]
    if len(sel_lks) == 0 or len(exc_lks) == 0:
        return list(pairs), 0, 0
    low0 = np.percentile(sel_lks, percent_th)
    high0 = np.percentile(exc_lks, 100 - percent_th)
    low = low0 + learning_rate * (high0 - low0)
    high = high0 - learning_rate * (high0 - low0)
    if low0 >= high0:
        return list(pairs), 0, 0
    cur = {frozenset(p) for p in pairs}
    removed = added = 0
    for a in range(d):
        for b in range(a + 1, d):
            key = frozenset((a, b))
            if key in cur and sel[a, b] and lks[a, b] < low:
                cur.discard(key)
                removed += 1
            elif key not in cur and np.isfinite(lks[a, b]) \
                    and lks[a, b] > high:
                cur.add(key)
                added += 1
    out = sorted((min(p), max(p)) for p in cur)
    return out, removed, added


def iterative_interdomain_calling(distmap: np.ndarray,
                                  starts: Sequence[int],
                                  exclude_neighbors: bool = True,
                                  init_th: float = 0.55,
                                  w_sel: float = 1.0,
                                  w_intra: float = 0.05,
                                  max_num_iter: int = 10,
                                  learning_rate: float = 0.3,
                                  adjust_percent_th: float = 1.0,
                                  mean_contact_ratio: float = 0.1,
                                  contact_th: float = 700.0
                                  ) -> List[Tuple[int, int]]:
    """Iteratively refined inter-domain interaction pairs.

    Behavior target: iterative_interdomain_calling
    (domain_tools/interaction.py:267-360): initial pairs from the
    cross-block separation screen, then EM-style refinement — score every
    domain pair by the Gaussian likelihood ratio against the current
    called/uncalled populations, exchange pairs across the
    percentile-derived thresholds, drop pairs whose mean contact fraction
    falls below `mean_contact_ratio`, until no exchange happens.
    """
    dm = np.asarray(distmap, float)
    starts = np.asarray(sorted(starts), int)
    pairs = inter_domain_interactions(dm, starts, separation_th=init_th,
                                      exclude_neighbors=exclude_neighbors)
    for _ in range(int(max_num_iter)):
        if not pairs:
            break
        lks = interdomain_likelihood(dm, starts, pairs, w_sel=w_sel,
                                     w_intra=w_intra,
                                     exclude_neighbors=exclude_neighbors)
        pairs, removed, added = _adjust_pairs_by_likelihood(
            pairs, lks, percent_th=adjust_percent_th,
            learning_rate=learning_rate)
        # contact-fraction screen (reference
        # _exclude_interdomain_by_contact, interaction.py:159-187)
        cfreq = domain_contact_freq(dm, starts, contact_th)
        pairs = [p for p in pairs
                 if cfreq[p[0], p[1]] > mean_contact_ratio]
        if removed == 0 and added == 0:
            break
    return [tuple(p) for p in pairs]
