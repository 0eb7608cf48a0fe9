"""A/B the fused Pallas LM kernel vs the vmapped XLA engine on the chip.

Bench-scene shapes (60x2048x2048, ~1.8k seeds), three rendered noise
variants per timed loop (tunnel result-cache safety).  Also asserts
center parity <= 1e-3 px between the two backends at bench config.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import gaussian_fit as gf
from imageanalysis3_tpu.ops import seeding

SHAPE = (60, 2048, 2048)
N_SPOTS = 1800
N_VAR = 3


def timed(label, fn, variants, n=6):
    jax.block_until_ready([fn(v) for v in variants])
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(variants[k % len(variants)]))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{label:46s} {1e3 * med:8.2f} ms", flush=True)
    return med


def main():
    rng = np.random.default_rng(0)
    truth = syn.sample_spot_params(SHAPE, N_SPOTS, rng, min_separation=8.0,
                                   height_range=(400.0, 3000.0),
                                   sigma_jitter=0.0)
    base = syn.render_spots_device(SHAPE, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    ims = [jax.block_until_ready(
        syn.noisy_uint16_device(base, seed=10 + k).astype(jnp.float32))
        for k in range(N_VAR)]
    print("device:", jax.devices()[0], flush=True)

    seed_fn = jax.jit(lambda x: seeding.get_seeds(
        x, max_num_seeds=2048, th_seed=300.0, pyramid_bg=True))
    seeds = [jax.block_until_ready(seed_fn(im)) for im in ims]
    pairs = list(zip(ims, seeds))
    print("n_valid seeds:", int(seeds[0].count), flush=True)

    results = {}
    for backend in ("xla", "pallas"):
        fn = jax.jit(lambda im, c, v, b=backend:
                     gf.iter_fit_seed_points(
                         im, c, v, lm_iters=8, n_max_iter=6,
                         lm_backend=b))
        wrapped = lambda p, f=fn: f(p[0], p[1].coords.astype(jnp.float32),
                                    p[1].valid)
        timed(f"iter_fit (lm8, nmax6) backend={backend}", wrapped, pairs)
        results[backend] = jax.block_until_ready(wrapped(pairs[0]))

    sx = np.asarray(results["xla"].spots)
    sp = np.asarray(results["pallas"].spots)
    vx = np.asarray(results["xla"].valid)
    vp = np.asarray(results["pallas"].valid)
    print("valid equal:", bool((vx == vp).all()), int(vx.sum()))
    both = vx & vp
    cen = float(np.abs(sx[both][:, 1:4] - sp[both][:, 1:4]).max())
    print(f"max center diff xla vs pallas: {cen:.2e} px")
    # truth accuracy for both
    for name, s, v in (("xla", sx, vx), ("pallas", sp, vp)):
        got = s[v][:, 1:4]
        errs = []
        for c in truth["centers"][:500]:
            d = np.linalg.norm(got - c, axis=1).min()
            if d < 1.0:
                errs.append(d)
        print(f"median err vs truth ({name}): "
              f"{float(np.median(errs)):.5f} px")
    assert cen < 5e-3, cen
    print("PASS")


if __name__ == "__main__":
    main()
