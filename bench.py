"""Headline benchmark: corrected + fitted FOV stacks per second per chip.

BASELINE.json north star: >= 20 corrected+fitted 2048^2 x 60 uint16 FOV
stacks/sec on a v5e-8 (=> 2.5 stacks/sec/chip), spot centroids within
0.05 px of the CPU reference.  This script measures ONE chip processing the
full per-FOV step — fused corrections (hot-pixel, z-shift, illumination),
8-crop drift consensus vs a reference round, dynamic-threshold seeding, and
batched LM Gaussian fitting at 2048-spot capacity — and prints one JSON
line; `vs_baseline` is stacks/sec/chip divided by the 2.5 per-chip target.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                           FitConfig, CorrectionConfig)
    from imageanalysis3_tpu.pipeline import FovPipeline
    from imageanalysis3_tpu import synthetic as syn

    shape = (60, 2048, 2048)
    n_spots = 1800
    rng = np.random.default_rng(0)

    # one synthetic FOV: spots + vignetting + noise, uint16
    im, truth = syn.random_spot_field(shape, n_spots, rng,
                                      min_separation=8.0,
                                      height_range=(400.0, 3000.0))
    prof = syn.illumination_profile(shape[1:])
    raw = syn.poisson_camera_noise(im * prof[None], rng).astype(np.uint16)
    ref_raw = syn.poisson_camera_noise(im * prof[None], rng
                                       ).astype(np.uint16)

    cfg = ExperimentConfig(
        image_size=shape,
        correction=CorrectionConfig(),
        seed=SeedConfig(th_seed=300.0, max_num_seeds=2048,
                        cand_capacity=16384),
        fit=FitConfig(),
    )
    pipe = FovPipeline(cfg, n_channels=1, drift_channel_index=0,
                       fit_channel_indices=(0,),
                       illumination=prof[None].astype(np.float32),
                       image_shape=shape)

    ref_im = pipe.correct_reference(ref_raw[None])
    jax.block_until_ready(ref_im)

    ims_dev = jnp.asarray(raw[None])
    # compile
    res = pipe.process_round(ims_dev, ref_im)
    jax.block_until_ready(res)

    # timed: fresh device inputs each iteration (axon caches repeat calls)
    n_iter = 3
    variants = [jnp.asarray((raw.astype(np.int32) + k) .astype(np.uint16)[None])
                for k in range(n_iter)]
    for v in variants:
        jax.block_until_ready(v)
    t0 = time.time()
    outs = []
    for v in variants:
        outs.append(pipe.process_round(v, ref_im))
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n_iter
    stacks_per_sec = 1.0 / dt

    # accuracy spot-check vs planted truth
    res = outs[-1]
    spots = np.asarray(res.spots[0])
    valid = np.asarray(res.valid[0])
    got = spots[valid][:, 1:4]
    errs = []
    for c in truth["centers"][:500]:
        d = np.linalg.norm(got - c, axis=1).min()
        if d < 1.0:
            errs.append(d)
    med_err = float(np.median(errs)) if errs else float("nan")

    target_per_chip = 20.0 / 8.0
    out = {
        "metric": "corrected+fitted 2048^2x60 uint16 FOV stacks/sec/chip",
        "value": round(stacks_per_sec, 4),
        "unit": "stacks/s/chip",
        "vs_baseline": round(stacks_per_sec / target_per_chip, 4),
        "extra": {
            "seconds_per_stack": round(dt, 4),
            "n_valid_spots": int(valid.sum()),
            "median_centroid_err_px": round(med_err, 5),
            "n_devices": len(jax.devices()),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
