"""Population-level analysis: genomic-annotation overlap, compartment
assignment from domain clusters, cell typing.

Behavior targets (reference ImageAnalysis3):
  * BED/ChIP overlap with imaged regions   postanalysis.py:21-157
  * domain clusters -> compartment labels  postanalysis.py:393-664
    (cluster domain distance vectors, assign A/B by marker overlap)
  * cell-type classifier                   celltype_tools/classifier.py:8-164
    (sklearn neural net on per-cell gene counts)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_bed(path: str) -> np.ndarray:
    """BED intervals -> structured list [(chr, start, end), ...]."""
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith(("#", "track", "browser")):
                continue
            parts = line.split("\t") if "\t" in line else line.split()
            out.append((parts[0], float(parts[1]), float(parts[2])))
    return np.array(out, dtype=object)


def region_overlap_fraction(region_positions: Dict[int, dict],
                            bed: np.ndarray) -> Dict[int, float]:
    """Fraction of each imaged region covered by BED intervals (reference
    postanalysis.py:21-157 region/peak overlap)."""
    by_chr: Dict[str, List[Tuple[float, float]]] = {}
    for c, s, e in bed:
        by_chr.setdefault(str(c), []).append((float(s), float(e)))
    out: Dict[int, float] = {}
    for rid, info in region_positions.items():
        chrom = str(info.get("chr", ""))
        start = float(info.get("start", np.nan))
        end = float(info.get("end", np.nan))
        if not np.isfinite(start) or not np.isfinite(end) or end <= start:
            out[rid] = np.nan
            continue
        covered = 0.0
        for s, e in by_chr.get(chrom, []):
            covered += max(0.0, min(end, e) - max(start, s))
        out[rid] = min(covered / (end - start), 1.0)
    return out


def assign_compartments_from_domains(zxys: np.ndarray,
                                     starts: Sequence[int],
                                     a_marker_fraction: Optional[
                                         Dict[int, float]] = None,
                                     n_iters: int = 32
                                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster domains into two compartments by their distance vectors,
    orient by marker overlap -> (domain labels (D,), region labels (R,)).

    Reference postanalysis.py:393-664: hierarchical clustering of domain
    pdists into 2 groups, A = the cluster with higher active-marker
    (e.g. H3K4me1) overlap; here 2-means on rows of the domain separation
    matrix (equivalent grouping for 2 clusters).
    """
    from .domains import domain_pdists

    zxys = np.asarray(zxys, float)
    starts = np.asarray(sorted(starts), int)
    ends = np.append(starts[1:], len(zxys))
    d = len(starts)
    if d < 2:
        return np.zeros(d, int), np.zeros(len(zxys), int)
    pd_vec = domain_pdists(zxys, starts)
    mat = np.zeros((d, d))
    k = 0
    for i in range(d):
        for j in range(i + 1, d):
            mat[i, j] = mat[j, i] = pd_vec[k]
            k += 1
    # 2-means on separation profiles
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, d)
    labels[0] = 0
    for _ in range(n_iters):
        c0 = mat[labels == 0].mean(axis=0) if (labels == 0).any() else 0
        c1 = mat[labels == 1].mean(axis=0) if (labels == 1).any() else 0
        new = (np.linalg.norm(mat - c1, axis=1)
               < np.linalg.norm(mat - c0, axis=1)).astype(int)
        if (new == labels).all():
            break
        labels = new
    # orient by marker overlap when provided: A (label 0) = higher overlap
    if a_marker_fraction:
        fr = np.zeros(d)
        for k_dom in range(d):
            rids = range(starts[k_dom], ends[k_dom])
            vals = [a_marker_fraction.get(r, np.nan) for r in rids]
            fr[k_dom] = np.nanmean(vals) if len(vals) else np.nan
        if np.nanmean(fr[labels == 1]) > np.nanmean(fr[labels == 0]):
            labels = 1 - labels
    region_labels = np.zeros(len(zxys), int)
    for k_dom in range(d):
        region_labels[starts[k_dom]:ends[k_dom]] = labels[k_dom]
    return labels, region_labels


class CellTypeClassifier:
    """Gene-count cell typing (reference celltype_tools/classifier.py:
    8-164: sklearn MLP on normalized per-cell counts)."""

    def __init__(self, hidden: Tuple[int, ...] = (64,),
                 max_iter: int = 500, seed: int = 0):
        from sklearn.neural_network import MLPClassifier

        self.model = MLPClassifier(hidden_layer_sizes=hidden,
                                   max_iter=max_iter, random_state=seed)
        self._norm: Optional[Tuple[np.ndarray, np.ndarray]] = None

    @staticmethod
    def _lognorm(counts: np.ndarray) -> np.ndarray:
        c = np.asarray(counts, float)
        tot = np.maximum(c.sum(axis=1, keepdims=True), 1.0)
        return np.log1p(c / tot * 1e4)

    def fit(self, counts: np.ndarray, labels: Sequence) -> None:
        x = self._lognorm(counts)
        mu, sd = x.mean(0), x.std(0) + 1e-6
        self._norm = (mu, sd)
        self.model.fit((x - mu) / sd, np.asarray(labels))

    def predict(self, counts: np.ndarray) -> np.ndarray:
        mu, sd = self._norm
        return self.model.predict((self._lognorm(counts) - mu) / sd)

    def score(self, counts: np.ndarray, labels: Sequence) -> float:
        mu, sd = self._norm
        return float(self.model.score((self._lognorm(counts) - mu) / sd,
                                      np.asarray(labels)))
