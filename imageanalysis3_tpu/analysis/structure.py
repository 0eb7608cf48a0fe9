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
