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
                               max_candidates: int = 256,
                               dynamic_niters: int = 12,
                               gfilt_size: float = 0.75,
                               background_gfilt_size: float = 10.0
                               ) -> Tuple[np.ndarray, np.ndarray,
                                          Dict[int, int]]:
    """Chromosome centers inside nuclei -> (coords (N, 3), nucleus label
    per candidate, per-nucleus counts).

    The threshold decays (dynamic seeding) until the *median* nucleus
    reaches `expected_per_nucleus` candidates, mirroring the reference's
    adaptive per-cell threshold loop
    (segmentation_tools/chromosome.py:51-486) without per-cell reruns.
    """
    nucleus_labels = jnp.asarray(nucleus_labels)
    n_nuclei = int(jnp.max(nucleus_labels))
    min_needed = max(1, expected_per_nucleus * max(n_nuclei, 1))
    seeds = get_seeds(jnp.asarray(chrom_im, jnp.float32),
                      max_num_seeds=max_candidates, th_seed=th_seed,
                      gfilt_size=gfilt_size,
                      background_gfilt_size=background_gfilt_size,
                      use_dynamic_th=True, dynamic_niters=dynamic_niters,
                      min_dynamic_seeds=min_needed,
                      remove_hot_pixel=False)
    nuc = assign_seeds_to_nuclei(nucleus_labels, seeds.coords, seeds.valid)
    inside = np.asarray(nuc) > 0
    coords = np.asarray(seeds.coords)[inside]
    labels = np.asarray(nuc)[inside]
    counts: Dict[int, int] = {}
    for l in labels:
        counts[int(l)] = counts.get(int(l), 0) + 1
    # keep the brightest expected_per_nucleus per nucleus when over budget
    heights = np.asarray(seeds.heights)[inside]
    keep = np.ones(len(coords), bool)
    for l in counts:
        if counts[l] > expected_per_nucleus:
            idx = np.where(labels == l)[0]
            order = idx[np.argsort(-heights[idx])]
            keep[order[expected_per_nucleus:]] = False
            counts[l] = expected_per_nucleus
    return coords[keep], labels[keep], counts
