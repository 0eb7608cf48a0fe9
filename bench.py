"""Headline benchmark: corrected + fitted FOV stacks per second per chip.

BASELINE.json north star: >= 20 corrected+fitted 2048^2 x 60 uint16 FOV
stacks/sec on a v5e-8 (=> 2.5 stacks/sec/chip), spot centroids within
0.05 px of the CPU reference.  This script measures ONE chip processing the
full per-FOV step — fused corrections (hot-pixel, z-shift, illumination),
8-crop drift consensus vs a reference round, dynamic-threshold seeding, and
batched LM Gaussian fitting at 2048-spot capacity — and prints one JSON
line; `vs_baseline` is stacks/sec/chip divided by the 2.5 per-chip target.

Transfer discipline (the axon tunnel moves MBs/s, not GB/s): the synthetic
FOV is rendered ON DEVICE from ~50 KB of uploaded spot parameters
(synthetic.render_spots_device), so the benchmark uploads kilobytes, not
4 x 0.5 GB stacks.  Every timed call consumes a distinct pre-rendered
variant (fresh noise seed per variant) so no tunnel-level result caching
can fake a timing.

HBM discipline (round-1 failure was RESOURCE_EXHAUSTED): one FOV program
in flight at a time in the latency loop; the raw stack buffer is donated
to the program (pipeline/fov.py donate_argnums).
"""

import json
import time

import numpy as np

SHAPE = (60, 2048, 2048)
N_SPOTS = 1800


def _device_inputs(n_variants):
    """Render ref + `n_variants` noisy FOV stacks on device; returns
    (variants list, ref_raw, truth, illumination profile on device)."""
    import jax
    import jax.numpy as jnp

    from imageanalysis3_tpu import synthetic as syn

    rng = np.random.default_rng(0)
    truth = syn.sample_spot_params(SHAPE, N_SPOTS, rng,
                                   min_separation=8.0,
                                   height_range=(400.0, 3000.0),
                                   sigma_jitter=0.0)
    base = syn.render_spots_device(SHAPE, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    # vignetting profile computed on device (16 MB upload avoided)
    x = jnp.linspace(-1, 1, SHAPE[1])[:, None]
    y = jnp.linspace(-1, 1, SHAPE[2])[None, :]
    prof = jnp.clip(1.0 - 0.35 * (x * x + y * y) / 2.0, 0.2, 1.0)
    ref_raw = syn.noisy_uint16_device(base, seed=1, illumination=prof)
    variants = [syn.noisy_uint16_device(base, seed=10 + k,
                                        illumination=prof)
                for k in range(n_variants)]
    jax.block_until_ready((ref_raw, variants))
    return variants, ref_raw, truth, prof


def _stage_breakdown(pipe, variants, ref_im):
    """Median wall time per pipeline stage, seconds.

    Each timing call consumes a different variant (the tunnel caches
    identical calls).  The drift/fit stages time against pre-corrected
    f32 stacks, so len(variants) 1 GB copies are live at once — fine at
    the 3 variants used here, but the raw uint16 variants are deleted
    first and n_iter must stay small (HBM budget ~16 GB).
    variants[-1] only warms each compile."""
    import jax

    th = pipe.seed_thresholds

    def timed(fn, inputs):
        jax.block_until_ready(fn(inputs[-1]))      # compile/warm on spare
        ts = []
        for a in inputs[:-1]:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(a))
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts)), 4)

    out = {"correct": timed(lambda v: pipe.correct_jit(v[None]), variants)}
    corrected = [pipe.correct_jit(v[None])[0] for v in variants]
    del variants
    jax.block_until_ready(corrected)
    out["drift"] = timed(lambda c: pipe.drift_jit(c, ref_im), corrected)
    out["fit"] = timed(lambda c: pipe.fit_jit(c, th[0]), corrected)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                           FitConfig, CorrectionConfig)
    from imageanalysis3_tpu.pipeline import FovPipeline
    from imageanalysis3_tpu import synthetic as syn

    n_iter = 4
    variants, ref_raw, truth, prof = _device_inputs(n_iter)

    cfg = ExperimentConfig(
        image_size=SHAPE,
        correction=CorrectionConfig(),
        seed=SeedConfig(th_seed=300.0, max_num_seeds=2048,
                        cand_capacity=16384),
        fit=FitConfig(),
    )
    pipe = FovPipeline(cfg, n_channels=1, drift_channel_index=0,
                       fit_channel_indices=(0,),
                       illumination=np.asarray(prof)[None],
                       image_shape=SHAPE)

    ref_im = pipe.prepare_reference(pipe.correct_reference(ref_raw[None]))
    jax.block_until_ready(ref_im)
    del ref_raw

    # compile once on an extra rendered copy (donated input)
    warm = syn.noisy_uint16_device(
        syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                                background=truth["background"]),
        seed=99, illumination=prof)
    res = pipe.process_round(warm[None], ref_im)
    jax.block_until_ready(res)

    # accuracy spot-check vs planted truth
    spots = np.asarray(res.spots[0])
    valid = np.asarray(res.valid[0])
    got = spots[valid][:, 1:4]
    errs = []
    for c in truth["centers"][:500]:
        d = np.linalg.norm(got - c, axis=1).min()
        if d < 1.0:
            errs.append(d)
    med_err = float(np.median(errs)) if errs else float("nan")
    n_valid = int(valid.sum())
    del res, spots

    # timed (latency): one stack in flight at a time; inputs are distinct
    # device-resident variants (no host upload, no tunnel result caching)
    times = []
    for v in variants:
        t0 = time.perf_counter()
        out = pipe.process_round(v[None], ref_im)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        del out
    dt_latency = float(np.median(times))

    # timed (throughput): two stacks in flight — the driver's readahead
    variants2 = [syn.noisy_uint16_device(
        syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                                background=truth["background"]),
        seed=50 + k, illumination=prof) for k in range(n_iter)]
    jax.block_until_ready(variants2)
    t0 = time.perf_counter()
    outs = []
    for v in variants2:
        outs.append(pipe.process_round(v[None], ref_im))
        if len(outs) > 1:
            jax.block_until_ready(outs[-2])
    jax.block_until_ready(outs)
    dt_pipe = (time.perf_counter() - t0) / n_iter
    del outs, variants, variants2

    dt = min(dt_latency, dt_pipe)
    stacks_per_sec = 1.0 / dt

    # fresh variants for the stage breakdown (all prior ones were donated)
    variants3 = [syn.noisy_uint16_device(
        syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                                background=truth["background"]),
        seed=80 + k, illumination=prof) for k in range(3)]
    jax.block_until_ready(variants3)
    breakdown = _stage_breakdown(pipe, variants3, ref_im)

    target_per_chip = 20.0 / 8.0
    out = {
        "metric": "corrected+fitted 2048^2x60 uint16 FOV stacks/sec/chip",
        "value": round(stacks_per_sec, 4),
        "unit": "stacks/s/chip",
        "vs_baseline": round(stacks_per_sec / target_per_chip, 4),
        "extra": {
            "seconds_per_stack": round(dt, 4),
            "seconds_per_stack_latency": round(dt_latency, 4),
            "seconds_per_stack_pipelined": round(dt_pipe, 4),
            "stage_seconds": breakdown,
            "n_valid_spots": n_valid,
            "median_centroid_err_px": round(med_err, 5),
            # on-device accuracy bound (advisor r3: the TPU-only einsum
            # precision tradeoff is invisible to the CPU test suite, so
            # the chip bench carries the check): must stay within 0.02 px
            "accuracy_ok": bool(med_err <= 0.02),
            "n_devices": len(jax.devices()),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
