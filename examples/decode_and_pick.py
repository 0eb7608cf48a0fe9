"""Decode-and-pick demo: candidate spot table -> SpotPicker homolog
assignment -> distance maps, domains, 3D rendering, manual curation.

The TPU-native counterpart of the reference's current-generation
picking workflow (classes/picker.py + figure_tools usage in the
PostAnalysis notebooks): build a decoded candidate table with two
planted homologs per chromosome plus distractors, run the iterative
score-based SpotPicker, then produce the standard QC artifacts —
per-homolog distance maps, domain calls, a 3D trace rendering — and
show the headless path through the BoundaryMarker curation tool.

Run:  python examples/decode_and_pick.py [output_dir]
"""

import os
import sys

import numpy as np
import pandas as pd


N_REGIONS = 24
CHROMS = ("1", "2")


def planted_experiment(rng):
    """Two homolog territories per chromosome: smooth random-walk
    traces ~25 px apart, candidates = true spots + jitter, plus dim
    far-away distractors (the reference QC scenario)."""
    rows, truth = [], {}
    for ci, chrom in enumerate(CHROMS):
        anchors = np.array([[10.0, 30.0 + 60.0 * ci, 30.0],
                            [10.0, 55.0 + 60.0 * ci, 60.0]])
        traces = []
        for h in range(2):
            steps = rng.normal(0, 1.2, (N_REGIONS, 3))
            trace = anchors[h] + np.cumsum(steps, axis=0)
            traces.append(trace)
            for r in range(N_REGIONS):
                start = 1_000_000 * (r + 1)
                rows.append({
                    "region_name": f"{chrom}:{start}-{start + 500_000}",
                    "chr": chrom, "start": start, "end": start + 500_000,
                    "center_z": trace[r, 0] + rng.normal(0, 0.15),
                    "center_x": trace[r, 1] + rng.normal(0, 0.15),
                    "center_y": trace[r, 2] + rng.normal(0, 0.15),
                    "center_intensity": rng.uniform(800, 1600),
                    "center_internal_dist": rng.uniform(0, 1),
                })
                if r % 4 == 0:          # dim distractor
                    rows.append({
                        "region_name": f"{chrom}:{start}-{start + 500_000}",
                        "chr": chrom, "start": start,
                        "end": start + 500_000,
                        "center_z": 40.0, "center_x": 200.0,
                        "center_y": 200.0,
                        "center_intensity": rng.uniform(40, 90),
                        "center_internal_dist": rng.uniform(0, 1),
                    })
        truth[chrom] = np.stack(traces)
    coords = pd.DataFrame(rows)
    cb_rows = []
    for chrom in CHROMS:
        names = sorted(
            coords.loc[coords["chr"] == chrom, "region_name"].unique(),
            key=lambda s: int(s.split(":")[1].split("-")[0]))
        for i, n in enumerate(names):
            cb_rows.append({"name": n, "chr": chrom, "id": i})
    return coords, pd.DataFrame(cb_rows), truth


def main(out_dir: str) -> None:
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    from imageanalysis3_tpu.decode import SpotPicker
    from imageanalysis3_tpu.analysis import (distance_map,
                                             basic_domain_calling)
    from imageanalysis3_tpu import figures as fg

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(11)
    coords, codebook, truth = planted_experiment(rng)
    print(f"candidate table: {len(coords)} rows, "
          f"{coords['region_name'].nunique()} regions, "
          f"{len(CHROMS)} chromosomes")

    # ---- iterative score-based homolog assignment
    picker = SpotPicker(coords=coords, codebook=codebook,
                        chr_2_copy_num={c: 2 for c in CHROMS})
    picker.iterative_assignment(max_niter=10)
    picked = picker.picked_dataframe()
    print(f"picked {len(picked)} spot rows; "
          f"converged: {not any(picker.chr_2_change.values())}")

    # ---- per-homolog QC: distance map + domains + 3D rendering
    pixel_nm = np.array([200.0, 108.0, 108.0])
    for chrom in CHROMS:
        hzxys = picker.chr_2_homolog_hzxys[chrom]      # (2, R, 4)
        # match each picked homolog to its planted trace by mean position
        means_p = np.nanmean(hzxys[:, :, 1:], axis=1)
        means_t = truth[chrom].mean(axis=1)
        match = [int(np.argmin(np.linalg.norm(means_t - m, axis=1)))
                 for m in means_p]
        for h in range(hzxys.shape[0]):
            zxy_nm = hzxys[h, :, 1:] * pixel_nm[None]
            dm = np.asarray(distance_map(zxy_nm))
            starts = basic_domain_calling(zxy_nm)
            fig, ax = plt.subplots(figsize=(4, 4), dpi=120)
            fg.plot_distance_map(dm, ax=ax, color_limits=(0, 1200),
                                 title=f"chr{chrom} homolog {h}")
            fg.plot_boundaries(dm, starts, ax=ax)
            fig.savefig(os.path.join(out_dir,
                                     f"distmap_chr{chrom}_h{h}.png"))
            plt.close(fig)
            err = np.linalg.norm(hzxys[h, :, 1:]
                                 - truth[chrom][match[h]], axis=-1)
            print(f"chr{chrom} h{h}: {len(starts)} domains, "
                  f"median pick error {np.nanmedian(err):.2f} px")
        ax3d, _cb = fg.chromosome_structure_3d_rendering(
            hzxys[0, :, 1:] * pixel_nm[None])
        ax3d.figure.savefig(os.path.join(out_dir,
                                         f"trace3d_chr{chrom}.png"))
        plt.close(ax3d.figure)

    # ---- headless curation: review the chr1 map, adjust one boundary
    hzxys = picker.chr_2_homolog_hzxys[CHROMS[0]]
    dm = np.asarray(distance_map(hzxys[0, :, 1:] * pixel_nm[None]))
    marker = fg.BoundaryMarker(
        [dm], names=["chr1 h0"],
        save_file=os.path.join(out_dir, "manual_boundaries.npz"))
    for s in basic_domain_calling(hzxys[0, :, 1:] * pixel_nm[None])[1:]:
        marker.add_boundary(float(s), float(s))    # seed from auto calls
    marker.add_boundary(N_REGIONS * 0.75, N_REGIONS * 0.75)
    marker.autoscale()
    marker.fig.savefig(os.path.join(out_dir, "curated_boundaries.png"))
    print(f"curated domain starts: {marker.domain_starts().tolist()}")
    print(f"artifacts in {out_dir}: "
          f"{sorted(os.listdir(out_dir))}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "decode_pick_output")
