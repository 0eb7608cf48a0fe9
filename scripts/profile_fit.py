"""Per-substage timing of the fit path on the real chip.

Breaks the 204 ms 'fit' stage into: dual blur, stencil+classify, top-k
extraction, gather, round-0 LM, Jacobi rounds — to target round-4 work.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import seeding, gaussian_fit
from imageanalysis3_tpu.ops.filters import gaussian_filter

SHAPE = (60, 2048, 2048)
N_SPOTS = 1800


def timed(label, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:35s} {1e3 * float(np.median(ts)):8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    truth = syn.sample_spot_params(SHAPE, N_SPOTS, rng, min_separation=8.0,
                                  height_range=(400.0, 3000.0),
                                  sigma_jitter=0.0)
    base = syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                                   background=truth["background"])
    im = jax.block_until_ready(
        syn.noisy_uint16_device(base, seed=1).astype(jnp.float32))
    print("device:", jax.devices()[0])

    # --- seeding substages
    from imageanalysis3_tpu.ops.pallas_kernels import dual_gaussian_blur

    blur = jax.jit(lambda x: dual_gaussian_blur(x, 0.75, 7.5))
    mx, mn = timed("dual_gaussian_blur (z + pallas xy)", blur, im)

    classify = jax.jit(lambda a, b: seeding._classify_from_blurs(
        a, b, 300.0, 0, SHAPE[1], SHAPE, 3, 2, 10))
    qdiff, counts = timed("classify (stencil+qdiff+hist)", classify,
                          mx, mn)

    def extract(qdiff, counts):
        cum = jnp.cumsum(counts)
        reach = cum >= 1
        chosen = jnp.where(jnp.any(reach), jnp.argmax(reach), 9)
        sel = jnp.ceil((1.0 - qdiff / 300.0) * 10) <= chosen.astype(
            jnp.float32)
        xy_counts = jnp.sum(sel.astype(jnp.int32), axis=0)
        sel = sel & (xy_counts[None] < 3)
        masked = jnp.where(sel, qdiff, -jnp.inf)
        red = jax.lax.reduce_window(masked, -jnp.inf, jax.lax.max,
                                    (2, 2, 2), (2, 2, 2), "VALID").ravel()
        total = red.shape[0]
        rows = max(1, min(16384, total // 16))
        cols = -(-total // rows)
        flat = jnp.pad(red, (0, rows * cols - total),
                       constant_values=-jnp.inf)
        v1, i1 = jax.lax.top_k(flat.reshape(rows, cols), 16)
        hts, order = jax.lax.top_k(v1.ravel(), 2048)
        return hts

    timed("select+hotpx+reduce+topk extraction", jax.jit(extract), qdiff,
          counts)

    seeds = timed("get_seeds total", jax.jit(lambda x: seeding.get_seeds(
        x, max_num_seeds=2048, th_seed=300.0)), im)

    # --- fit substages
    coords = seeds.coords.astype(jnp.float32)
    timed("gather_blocks", lambda: gaussian_fit.gather_blocks(
        im, coords, 5))
    timed("neighbor_lists", lambda: gaussian_fit.neighbor_lists(
        coords, seeds.valid, 12, 5))

    n_contested = jax.jit(lambda c, v: jnp.sum(
        gaussian_fit.neighbor_lists(c, v, 12, 5)[1].any(axis=1)))(
        coords, seeds.valid)
    print(f"{'n_valid / n_contested':35s} {int(seeds.count):8d} "
          f"{int(n_contested):4d}")

    fit_full = jax.jit(lambda i, c, v: gaussian_fit.iter_fit_seed_points(
        i, c, v))
    res = timed("iter_fit_seed_points (full)", fit_full, im, coords,
                seeds.valid)
    print("n_rounds:", int(res.n_rounds))

    fit_r0 = jax.jit(lambda i, c, v: gaussian_fit.iter_fit_seed_points(
        i, c, v, n_max_iter=0))
    timed("iter_fit (round 0 only)", fit_r0, im, coords, seeds.valid)

    fit_r1 = jax.jit(lambda i, c, v: gaussian_fit.iter_fit_seed_points(
        i, c, v, n_max_iter=1))
    timed("iter_fit (1 jacobi round)", fit_r1, im, coords, seeds.valid)


if __name__ == "__main__":
    main()
