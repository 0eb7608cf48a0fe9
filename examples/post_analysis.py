"""Post-analysis demo: traces -> domains -> compartments -> figures.

The TPU-native counterpart of the reference's PostAnalysis_20200609
notebooks (Part1 domain analysis, Part2/3 compartment analysis, Part4
domain interactions): build a population of synthetic two-compartment
chromosome traces with planted domain boundaries, then run

  * domain calling (basic + insulation + sliding-window reproducibility)
    and KS domain statistics,
  * median distance map + boundary-probability curves,
  * AB compartment assignment from the population eigenscore, per-cell
    density scores with winsorized values and a shuffled null control,
  * multi-way interaction hubs and hull-enclosure bootstrap,
  * figures: distance map with boundaries, 3D trace rendering with
    domain coloring, compartment cloud projection, spot-crop QC panels.

Run:  python examples/post_analysis.py [output_dir]
"""

import os
import sys
import tempfile

import numpy as np


def make_population(rng, n_cells=40, sizes=(16, 14, 18, 12),
                    step=80.0, jump=900.0):
    """Synthetic population: block polymers with fixed boundaries; the
    even blocks form the A compartment (spatially clustered), odd B."""
    traces = []
    for _ in range(n_cells):
        pts, origin = [], np.zeros(3)
        for b, s in enumerate(sizes):
            blk = origin + np.cumsum(
                rng.normal(0, step / np.sqrt(3), (s, 3)), axis=0)
            # pull even blocks toward a shared A pole
            if b % 2 == 0:
                blk = blk * 0.7 + np.array([0.0, 0.0, -600.0]) * 0.3
            pts.append(blk)
            origin = blk[-1] + rng.normal(0, jump / np.sqrt(3), 3) \
                + np.array([jump, 0, 0])
        traces.append(np.concatenate(pts))
    return np.stack(traces), np.cumsum([0] + list(sizes))[:-1]


def main(out_dir: str) -> None:
    import jax.numpy as jnp

    from imageanalysis3_tpu.analysis import (
        basic_domain_calling, insulation_domain_calling,
        median_distance_map, distance_map, domain_stat,
        ab_compartment_eigenscore, compartment_scores,
        winsorize, randomize_index_dict, density_overlaps,
        spots_to_density)
    from imageanalysis3_tpu.analysis.genome import find_interaction_groups
    from imageanalysis3_tpu.analysis.postanalysis import (
        bootstrap_regions_in_domain, region_genomic_scaling)
    from imageanalysis3_tpu import figures as fg

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(7)

    print("1) synthetic population: 40 cells x 60 regions, 4 domains...")
    traces, true_starts = make_population(rng)
    n_cells, n_reg, _ = traces.shape

    print("2) distance maps + domain calling...")
    dmaps = np.stack([np.asarray(distance_map(jnp.asarray(t)))
                      for t in traces])
    med_dm = np.asarray(median_distance_map(jnp.asarray(traces)))
    starts = basic_domain_calling(traces[0], min_domain_size=5)
    ins_starts = insulation_domain_calling(dmaps[0], min_domain_size=5)
    print(f"   planted starts {true_starts.tolist()}, "
          f"basic {list(map(int, starts))}, "
          f"insulation {list(map(int, ins_starts))}")
    ks, _pval = domain_stat(
        traces[0], (int(true_starts[1]), int(true_starts[2])),
        (int(true_starts[2]), int(true_starts[3])), method="ks")
    print(f"   KS separation stat at boundary 2: {float(ks):.3f}")

    print("3) compartments: population eigenscore -> AB, density scores...")
    ev = ab_compartment_eigenscore(med_dm)
    a_mask = ev > 0
    comp = {"A": np.where(a_mask)[0], "B": np.where(~a_mask)[0]}
    scores = np.asarray(compartment_scores(
        jnp.asarray(traces[0]), jnp.ones(n_reg, bool),
        jnp.asarray(a_mask), jnp.asarray(~a_mask), grid_radius=24,
        sigma=160.0, voxel=80.0))
    w = winsorize(scores, 5, 5, normalize=True)
    # shuffled null control
    null = randomize_index_dict(comp, rng=rng)
    null_mask = np.zeros(n_reg, bool)
    null_mask[null["A"]] = True
    null_scores = np.asarray(compartment_scores(
        jnp.asarray(traces[0]), jnp.ones(n_reg, bool),
        jnp.asarray(null_mask), jnp.asarray(~null_mask), grid_radius=24,
        sigma=160.0, voxel=80.0))
    da = np.asarray(spots_to_density(jnp.asarray(traces[0]),
                                     jnp.asarray(a_mask), 24, 160.0, 80.0))
    db = np.asarray(spots_to_density(jnp.asarray(traces[0]),
                                     jnp.asarray(~a_mask), 24, 160.0, 80.0))
    print(f"   A/B cloud overlap {density_overlaps(da, db):.3f}; "
          f"real |score| median {np.nanmedian(np.abs(scores)):.2f} vs "
          f"null {np.nanmedian(np.abs(null_scores)):.2f}; "
          f"winsorized range [{np.nanmin(w):.2f}, {np.nanmax(w):.2f}]")

    print("4) interactions + enclosure bootstrap + genomic scaling...")
    import pandas as pd
    half = n_reg // 2
    codebook = pd.DataFrame({"chr": ["1"] * half + ["2"] * (n_reg - half),
                             "chr_order": list(range(half))
                             + list(range(n_reg - half)),
                             "id": np.arange(n_reg)})
    coords_g, rids_g, chrs_g = find_interaction_groups(
        {"1": traces[0][:half][None], "2": traces[0][half:][None]},
        codebook,
        search_radius=900.0, min_chrs=2)
    dom = list(range(int(true_starts[1]), int(true_starts[2])))
    probs = bootstrap_regions_in_domain(
        [t for t in traces[:8]], region_index=dom[len(dom) // 2],
        domain_indices=dom, p_bootstrap=0.8, n_iter=64, seed=3)
    gen_pos = np.arange(n_reg, dtype=float) * 50_000.0
    gen_mat = np.abs(gen_pos[:, None] - gen_pos[None, :])
    scale, _icpt, _r = region_genomic_scaling(
        traces[0], np.arange(n_reg), gen_mat)
    print(f"   {len(coords_g)} trans-chromosome hubs; hull-enclosure "
          f"prob {float(np.mean(probs)):.2f} (small-N hulls are mostly "
          f"vertices); scaling exponent {scale:.3f}")

    print("5) figures...")
    fg.plot_distance_map(med_dm,
                         save_path=os.path.join(out_dir, "median_dm.png"))
    fg.plot_boundaries(dmaps[0], [int(s) for s in starts],
                       save_path=os.path.join(out_dir, "domains.png"))
    dom_colors = np.zeros((n_reg, 3))
    palette = np.array([[0.85, 0.2, 0.2], [0.2, 0.4, 0.85],
                        [0.2, 0.7, 0.3], [0.8, 0.6, 0.1]])
    bounds = list(true_starts) + [n_reg]
    for b in range(len(true_starts)):
        dom_colors[bounds[b]:bounds[b + 1]] = palette[b % 4]
    fg.chromosome_structure_3d_rendering(
        traces[0], colors=dom_colors,
        save_path=os.path.join(out_dir, "trace3d.png"))
    fg.visualize_chromosome_3d_cloud(
        traces[0], comp, voxel_nm=120.0,
        save_path=os.path.join(out_dir, "cloud.png"))
    print(f"   wrote {sorted(os.listdir(out_dir))}")
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else os.path.join(tempfile.gettempdir(), "ia3_postanalysis"))
