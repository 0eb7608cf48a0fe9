"""Bisect why gather_blocks is 49 ms in profile context, 0.1 ms in micro."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import seeding, gaussian_fit

SHAPE = (60, 2048, 2048)


def timed(label, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:45s} {1e3 * float(np.median(ts)):8.2f} ms", flush=True)
    return out


rng = np.random.default_rng(0)
truth = syn.sample_spot_params(SHAPE, 1800, rng, min_separation=8.0,
                               height_range=(400.0, 3000.0),
                               sigma_jitter=0.0)
base = syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                               background=truth["background"])
im = jax.block_until_ready(
    syn.noisy_uint16_device(base, seed=1).astype(jnp.float32))
print("device:", jax.devices()[0], flush=True)

# random coords, synthetic image, fresh process
rand_coords = jnp.asarray(
    np.stack([rng.integers(5, s - 5, 2048) for s in SHAPE], 1), jnp.float32)
timed("gather: random coords (fresh)", gaussian_fit.gather_blocks,
      im, rand_coords, 5)

# get_seeds coords
seeds = jax.block_until_ready(
    jax.jit(lambda x: seeding.get_seeds(x, max_num_seeds=2048,
                                        th_seed=300.0))(im))
coords = jax.block_until_ready(seeds.coords.astype(jnp.float32))
timed("gather: get_seeds coords", gaussian_fit.gather_blocks, im, coords, 5)
timed("gather: random coords (after seeding)", gaussian_fit.gather_blocks,
      im, rand_coords, 5)

# memory pressure: allocate what profile_fit had live
from imageanalysis3_tpu.ops.pallas_kernels import dual_gaussian_blur
mx, mn = jax.block_until_ready(
    jax.jit(lambda x: dual_gaussian_blur(x, 0.75, 7.5))(im))
timed("gather: after blur outputs live", gaussian_fit.gather_blocks,
      im, coords, 5)
timed("neighbors: after blur outputs live", gaussian_fit.neighbor_lists,
      coords, seeds.valid, 12, 5)
del mx, mn
timed("gather: blur outputs freed", gaussian_fit.gather_blocks,
      im, coords, 5)
timed("neighbors: blur outputs freed", gaussian_fit.neighbor_lists,
      coords, seeds.valid, 12, 5)
