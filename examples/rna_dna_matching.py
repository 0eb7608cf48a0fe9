"""RNA workflow demo: RNA spots -> DNA regions -> merged cell data.

The TPU-native counterpart of the reference's RNA example notebook
(examples/20190808-Cell_Data_RNA_Example.ipynb + spot_tools/matching.py
convert_pick_RNA_spots): annotate RNA species with the DNA region whose
genomic interval contains their TSS, translate RNA-experiment spot
coordinates into the DNA experiment's frame (rotation about the image
center + drift), pick the brightest RNA candidate within a distance
threshold of each picked DNA spot, and merge the result onto the DNA
cell record the way `Cell_Data._merge_RNA_to_DNA` does.

Run:  python examples/rna_dna_matching.py [output_dir]
"""

import os
import sys
import tempfile

import numpy as np


def main(out_dir: str) -> None:
    import jax.numpy as jnp

    from imageanalysis3_tpu.io.color_usage import match_rna_to_dna
    from imageanalysis3_tpu.ops.matching import (translate_spot_coordinates,
                                                 select_matched_spots)
    from imageanalysis3_tpu.legacy import CellData

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(3)

    print("1) genomic matching: RNA TSS -> containing DNA region...")
    rna_dic = {
        "r1": {"gene_name": "GeneA", "chr": "chr1", "strand": "+",
               "start": 1200, "end": 4000},
        "r2": {"gene_name": "GeneB", "chr": "chr1", "strand": "-",
               "start": 9500, "end": 12000},
        "r3": {"gene_name": "GeneC", "chr": "chr2", "strand": "+",
               "start": 500, "end": 900},
    }
    region_dic = {
        101: {"chr": "chr1", "start": 0, "end": 5000},
        102: {"chr": "chr1", "start": 5000, "end": 10000},
        201: {"chr": "chr2", "start": 0, "end": 2000},
    }
    matched = match_rna_to_dna(rna_dic, region_dic)
    for rid, rec in matched.items():
        print(f"   {rid} ({rec['gene_name']}) -> DNA region "
              f"{rec.get('DNA_id')}")
    assert matched["r1"]["DNA_id"] == 101
    assert matched["r2"]["DNA_id"] == 102

    print("2) frame translation: RNA-experiment spots -> DNA frame...")
    # picked DNA spots (reference frame), natural 11-column rows
    n = 3
    dna_spots = np.zeros((n, 11))
    dna_spots[:, 0] = 1000.0
    dna_spots[:, 1:4] = np.array([[6.0, 40.0, 60.0],
                                  [8.0, 90.0, 30.0],
                                  [5.0, 120.0, 110.0]])
    # the RNA experiment is re-mounted: rotated 5 degrees about the image
    # center with a known drift; its spots sit near the DNA positions
    theta = np.deg2rad(5.0)
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    center = np.array([128.0, 128.0])
    drift = np.array([0.4, -1.2, 2.0])
    rna_spots = dna_spots.copy()
    rna_spots[:, 0] = np.array([500.0, 800.0, 300.0])
    rna_spots[:, 1:4] += rng.normal(0, 0.3, (n, 3))      # biology jitter
    # move them INTO the RNA frame (inverse transform) so the demo
    # translation has to undo it
    xy = rna_spots[:, 2:4] - center[None]
    rna_spots[:, 2:4] = xy @ rot.T + center[None]
    rna_spots[:, 1:4] -= drift[None]
    back = np.asarray(translate_spot_coordinates(
        jnp.asarray(rna_spots), jnp.asarray(rot), jnp.asarray(center),
        drift=jnp.asarray(drift)))
    err = np.linalg.norm(back[:, 1:4] - dna_spots[:, 1:4], axis=1)
    print(f"   max frame-translation error: {err.max():.3f} px "
          f"(jitter-limited)")

    print("3) pick brightest RNA candidate near each DNA spot...")
    picked = []
    for k in range(n):
        row, found = select_matched_spots(back, dna_spots[k, 1:4],
                                          dist_th_nm=300.0)
        picked.append(row if found else np.full(11, np.nan))
    picked = np.asarray(picked)
    assert np.isfinite(picked).all()
    print(f"   picked intensities: {picked[:, 0].tolist()}")

    print("4) merge RNA attributes onto the DNA cell record...")
    dna_cell = CellData({})
    rna_cell = CellData({})
    rna_cell.picked_spots = picked
    rna_cell.gene_table = matched
    added = dna_cell._merge_RNA_to_DNA(rna_cell)
    print(f"   merged attributes: {added}")
    assert any("picked_spots" in a for a in added)

    np.savez(os.path.join(out_dir, "rna_dna.npz"),
             picked=picked, dna=dna_spots)
    print(f"   wrote {sorted(os.listdir(out_dir))}")
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else os.path.join(tempfile.gettempdir(), "ia3_rna_dna"))
