"""Substage profile of the fit stage with the fused Pallas LM kernel.

Locates the next cut after the r5 kernel landed: seeding vs gather vs
round-0 LM vs Jacobi rounds, bench shapes, tunnel-cache-safe variants.
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
    print(f"{label:52s} {1e3 * med:8.2f} ms", flush=True)
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
    timed("get_seeds (pyramid)", seed_fn, ims)
    seeds = [jax.block_until_ready(seed_fn(im)) for im in ims]
    pairs = list(zip(ims, seeds))

    timed("gather_blocks (r=5)",
          lambda p: gf.gather_blocks(
              p[0], p[1].coords.astype(jnp.float32), 5), pairs)
    timed("neighbor_lists",
          lambda p: gf.neighbor_lists(
              p[1].coords.astype(jnp.float32), p[1].valid, 12, 5), pairs)

    for label, kw in [
        ("iter_fit pallas nmax0 (round0 only)",
         dict(n_max_iter=0, lm_backend="pallas")),
        ("iter_fit pallas nmax6 (full)",
         dict(n_max_iter=6, lm_backend="pallas")),
        ("iter_fit pallas nmax1", dict(n_max_iter=1, lm_backend="pallas")),
        ("iter_fit xla nmax0", dict(n_max_iter=0, lm_backend="xla")),
    ]:
        fn = jax.jit(lambda im, c, v, kw=kw: gf.iter_fit_seed_points(
            im, c, v, lm_iters=8, **kw))
        timed(label, lambda p, f=fn: f(
            p[0], p[1].coords.astype(jnp.float32), p[1].valid), pairs)

    # raw kernel time on pre-gathered blocks
    g = [jax.block_until_ready(gf.gather_blocks(
        im, sd.coords.astype(jnp.float32), 5))
        for im, sd in pairs]
    from imageanalysis3_tpu.ops.pallas_lm import lm_fit_pallas

    def lm_only(args):
        (px, co, mk), sd = args
        ce = sd.coords.astype(jnp.float32)
        dl = jnp.full(ce.shape[0], 2.5, jnp.float32)
        p0 = jax.vmap(lambda a, b, c, d, e: gf.init_params(
            a, b, 0.5, 4.0, 1.5, coords=c, center_est=d, delta=e))(
            px, mk, co, ce, dl)
        return lm_fit_pallas(px, co, mk, ce, dl, p0, 0.5, 4.0, lm_iters=8)

    timed("lm_fit_pallas kernel only (lm8, 2048 spots)", lm_only,
          list(zip(g, seeds)))


if __name__ == "__main__":
    main()
