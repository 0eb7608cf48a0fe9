"""End-to-end demo: synthetic experiment -> traces -> domains -> figures.

The TPU-native counterpart of the reference's example notebooks
(examples/20190723-Cell_Data_DNA_Example.ipynb): build an on-disk
experiment with known ground truth, run the full pipeline (corrections,
registration, fitting, persistence with resume), pick chromosome traces
with the EM picker, call domains, and save QC figures.

Run:  python examples/end_to_end.py [output_dir]
"""

import os
import sys
import tempfile

import numpy as np


def main(out_dir: str) -> None:
    import jax.numpy as jnp

    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                           FitConfig, DriftConfig,
                                           CorrectionConfig)
    from imageanalysis3_tpu.pipeline import FieldOfView
    from imageanalysis3_tpu.analysis import (basic_domain_calling,
                                             insulation_domain_calling)
    from imageanalysis3_tpu import figures as fg

    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "experiment")
    shape = (12, 128, 128)

    print("1) writing a synthetic 4-round experiment (with drifts)...")
    truth = syn.write_synthetic_experiment(
        data_dir, shape=shape, n_rounds=4, n_spots=10, seed=11,
        buffer_frames=4, channels=("750", "647", "488"))

    cfg = ExperimentConfig(
        image_size=shape,
        correction=CorrectionConfig(illumination=False, hot_pixel=False),
        drift=DriftConfig(drift_size=64),
        seed=SeedConfig(th_seed=400.0, max_num_seeds=64, cand_capacity=512),
        fit=FitConfig(n_max_iter=4, lm_iters=20),
        num_buffer_frames=4)

    print("2) processing the FOV (correct -> register -> fit -> store)...")
    fov = FieldOfView(data_dir, os.path.join(out_dir, "save"),
                      "Conv_zscan_00.dax", cfg=cfg)
    counts = fov.process_image_to_spots()
    print("   regions processed:", counts)
    rerun = fov.process_image_to_spots()
    print("   resume check (expect zeros):", rerun)

    print("3) EM spot picking -> chromosome trace...")
    res = fov.pick_spots(method="EM", num_iters=8)
    trace = np.asarray(res.trace)
    print(f"   picked {int(np.asarray(res.sel_valid).sum())}"
          f"/{len(trace)} regions in {int(res.n_iters)} EM iterations")

    print("4) distance map + domain calling...")
    dm = fov.distance_map(trace)
    zxys = trace[:, 1:4] * np.array([200.0, 108.0, 108.0])
    try:
        starts = basic_domain_calling(zxys, min_domain_size=2)
    except Exception:
        starts = insulation_domain_calling(dm, min_domain_size=2)
    print("   domain starts:", list(starts))

    print("5) rendering figures...")
    fg.plot_distance_map(dm, color_limits=(0, float(np.nanmax(dm))),
                         save_path=os.path.join(out_dir, "distmap.png"))
    fg.plot_boundaries(dm, starts,
                       plot_limits=(0, float(np.nanmax(dm))),
                       save_path=os.path.join(out_dir, "domains.png"))
    print("   wrote", os.path.join(out_dir, "distmap.png"),
          "and domains.png")

    print("6) per-stage timing summary:")
    for stage, seconds in fov.driver.timings.summary().items():
        print(f"   {stage:16s} {seconds:7.3f}s")
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="ia3tpu_demo_"))
