"""Round-5 fit-stage profile on the real chip, tunnel-cache-safe.

Times the bench fit stage's substages at bench shape/config, cycling
THREE independently rendered noise variants per timed loop so the axon
tunnel's result cache can't short-circuit any call (verify-skill
gotcha).  Also probes round-0 LM iteration scaling and a moment-based
center init to locate the r5 cut from 143 ms toward <= 110 ms.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import gaussian_fit, seeding

SHAPE = (60, 2048, 2048)
N_SPOTS = 1800
N_VAR = 3


def timed(label, fn, variants, n=6):
    jax.block_until_ready([fn(v) for v in variants])     # compile + warm
    ts = []
    for k in range(n):
        v = variants[k % len(variants)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(v))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{label:44s} {1e3 * med:8.2f} ms", flush=True)
    return med


def main():
    rng = np.random.default_rng(0)
    truth = syn.sample_spot_params(SHAPE, N_SPOTS, rng, min_separation=6.0)
    base = syn.render_spots_device(SHAPE, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    ims = [jax.block_until_ready(
        syn.noisy_uint16_device(base, seed=10 + k).astype(jnp.float32))
        for k in range(N_VAR)]
    print("device:", jax.devices()[0], flush=True)

    seed_fn = jax.jit(lambda x: seeding.get_seeds(
        x, max_num_seeds=2048, th_seed=300.0, pyramid_bg=True))
    t_seed = timed("get_seeds (pyramid, bench config)", seed_fn, ims)
    seeds = [jax.block_until_ready(seed_fn(im)) for im in ims]
    pairs = list(zip(ims, seeds))
    print(f"{'n_valid seeds':44s} {int(seeds[0].count):8d}", flush=True)

    def fit_args(p):
        im, sd = p
        return im, sd.coords.astype(jnp.float32), sd.valid

    nc = jax.jit(lambda c, v: jnp.sum(
        gaussian_fit.neighbor_lists(c, v, 12, 5)[1].any(axis=1)
        .astype(jnp.int32)))(seeds[0].coords.astype(jnp.float32),
                             seeds[0].valid)
    print(f"{'n_contested':44s} {int(nc):8d}", flush=True)

    timed("gather_blocks",
          lambda p: gaussian_fit.gather_blocks(
              p[0], p[1].coords.astype(jnp.float32), 5), pairs)
    timed("neighbor_lists",
          lambda p: gaussian_fit.neighbor_lists(
              p[1].coords.astype(jnp.float32), p[1].valid, 12, 5), pairs)

    for label, kw in [
        ("iter_fit FULL (bench: lm12, nmax6)", dict()),
        ("iter_fit round0 only (lm12)", dict(n_max_iter=0)),
        ("iter_fit round0 only (lm8)", dict(n_max_iter=0, lm_iters=8)),
        ("iter_fit round0 only (lm6)", dict(n_max_iter=0, lm_iters=6)),
        ("iter_fit FULL lm8", dict(lm_iters=8)),
        ("iter_fit 1 jacobi (lm12)", dict(n_max_iter=1)),
    ]:
        fn = jax.jit(lambda i, c, v, kw=kw:
                     gaussian_fit.iter_fit_seed_points(i, c, v, **kw))
        res = timed(label, lambda p, fn=fn: fn(*fit_args(p)), pairs)

    full = jax.jit(lambda i, c, v:
                   gaussian_fit.iter_fit_seed_points(i, c, v))
    r = jax.block_until_ready(full(*fit_args(pairs[0])))
    print(f"{'n_rounds executed (full)':44s} "
          f"{int(r.n_rounds):8d}", flush=True)

    # accuracy probe at reduced iterations (median err vs planted truth)
    for lm in (12, 8, 6):
        fn = jax.jit(lambda i, c, v, lm=lm:
                     gaussian_fit.iter_fit_seed_points(i, c, v,
                                                       lm_iters=lm))
        res = jax.block_until_ready(fn(*fit_args(pairs[0])))
        sp = np.asarray(res.spots)[np.asarray(res.valid)][:, 1:4]
        errs = [np.linalg.norm(sp - c, axis=1).min()
                for c in truth["centers"]]
        print(f"{'median err lm_iters=' + str(lm):44s} "
              f"{float(np.median(errs)):8.4f} px "
              f"(p95 {float(np.percentile(errs, 95)):.4f})", flush=True)


if __name__ == "__main__":
    main()
