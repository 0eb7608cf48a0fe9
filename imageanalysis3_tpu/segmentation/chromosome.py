"""Chromosome candidate detection inside segmented nuclei.

Behavior targets (reference ImageAnalysis3):
  * candidate finding          segmentation_tools/chromosome.py:51-486
    (find_candidate_chromosomes[_in_nucleus] / select_candidate_
    chromosomes: seed/label the chromosome-paint image inside nucleus
    masks, lower the threshold adaptively until each cell reaches its
    expected chromosome count)
  * FOV orchestration          classes/field_of_view.py:1936-2341

TPU-first design: candidates come from the existing local-max seeding
(dynamic threshold decay is the adaptive loop, computed in one pass);
nucleus gating and per-cell counting are masked gathers.  The reference's
connected-component relabeling is subsumed by seed-based candidates —
each candidate is a chromosome center directly.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.seeding import get_seeds


def assign_seeds_to_nuclei(labels: jnp.ndarray, coords: jnp.ndarray,
                           valid: jnp.ndarray) -> jnp.ndarray:
    """Nucleus label at each seed position (0 outside; -1 invalid)."""
    z = jnp.clip(coords[:, 0], 0, labels.shape[0] - 1)
    x = jnp.clip(coords[:, 1], 0, labels.shape[1] - 1)
    y = jnp.clip(coords[:, 2], 0, labels.shape[2] - 1)
    lab = labels[z, x, y].astype(jnp.int32)
    return jnp.where(valid, lab, -1)


def find_candidate_chromosomes(chrom_im: jnp.ndarray,
                               nucleus_labels: jnp.ndarray,
                               expected_per_nucleus: int = 2,
                               th_seed: float = 300.0,
                               max_candidates: int = 1024,
                               dynamic_niters: int = 12,
                               gfilt_size: float = 0.75,
                               background_gfilt_size: float = 10.0,
                               min_separation: float = 3.0
                               ) -> Tuple[np.ndarray, np.ndarray,
                                          Dict[int, int]]:
    """Chromosome centers inside nuclei -> (coords (N, 3), nucleus label
    per candidate, per-nucleus counts).

    Per-cell adaptive thresholding, as in the reference's per-cell loop
    (segmentation_tools/chromosome.py:51-486) that lowers each cell's
    threshold until that cell reaches its expected chromosome count —
    but computed from ONE device seeding pass instead of per-cell reruns:
    the dynamic threshold decays to its deepest level (all candidates
    down to th_seed * 1/n_lvl are extracted brightest-first with their
    heights), and the per-nucleus selection keeps each nucleus's
    brightest `expected_per_nucleus` candidates.  Each nucleus's implicit
    threshold is therefore the height of its own k-th brightest candidate
    — a dim nucleus keeps its dim-but-real foci instead of being starved
    by a global (median-nucleus) level, and a nucleus with fewer than
    `expected_per_nucleus` candidates above the floor keeps what it has.

    `min_separation`: candidates closer than this (in voxels, z-weighted
    equally) to an already-kept brighter candidate of the same nucleus
    are treated as the same focus and skipped (the reference merges such
    seeds by connected-component relabeling + erosion; a radius test on
    brightest-first candidates is the seed-based equivalent).
    """
    nucleus_labels = jnp.asarray(nucleus_labels)
    seeds = get_seeds(jnp.asarray(chrom_im, jnp.float32),
                      max_num_seeds=max_candidates, th_seed=th_seed,
                      gfilt_size=gfilt_size,
                      background_gfilt_size=background_gfilt_size,
                      use_dynamic_th=True, dynamic_niters=dynamic_niters,
                      # unreachable target -> decay to the deepest level,
                      # so every per-cell threshold choice stays available
                      min_dynamic_seeds=max_candidates,
                      remove_hot_pixel=False)
    nuc = assign_seeds_to_nuclei(nucleus_labels, seeds.coords, seeds.valid)
    inside = np.asarray(nuc) > 0
    coords = np.asarray(seeds.coords)[inside]
    labels = np.asarray(nuc)[inside]
    heights = np.asarray(seeds.heights)[inside]

    keep = np.zeros(len(coords), bool)
    counts: Dict[int, int] = {}
    for l in np.unique(labels):
        idx = np.where(labels == l)[0]
        order = idx[np.argsort(-heights[idx])]     # brightest first
        kept: list = []
        for i in order:
            if len(kept) >= expected_per_nucleus:
                break
            if kept and min_separation > 0:
                d = np.linalg.norm(
                    coords[kept].astype(np.float64) - coords[i], axis=1)
                if np.min(d) < min_separation:
                    continue                        # same focus as a kept
            kept.append(i)
        keep[kept] = True
        counts[int(l)] = len(kept)
    return coords[keep], labels[keep], counts
