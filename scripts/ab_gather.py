"""A/B: gather_blocks cube layouts on the real chip.

Hypothesis: the (10,10,10) per-spot dynamic_slice issues 100 rows of 40 B
per spot (2048 spots -> 200k sub-transaction DMAs, latency bound).  Padding
the minor (y) extent to a full 128-lane vector turns every row into one
512 B transaction; padding x to a sublane multiple may help too.  Extra
bytes read are ~100 MB, ~0.4 ms at the measured 260 GB/s -- cheap if it
kills the latency.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import seeding, gaussian_fit

SHAPE = (60, 2048, 2048)
N_SPOTS = 1800
RADIUS = 5


def timed(label, fn, *args, n=7):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {1e3 * float(np.median(ts)):8.2f} ms", flush=True)
    return out


@partial(jax.jit, static_argnames=("radius", "side_x", "side_y"))
def gather_blocks_padded(im, seeds_zxy, radius, side_x, side_y):
    """gather_blocks with x/y cube extents padded for aligned DMAs."""
    sz = min(2 * radius, int(im.shape[0]))
    sx = min(side_x, int(im.shape[1]))
    sy = min(side_y, int(im.shape[2]))
    sides = (sz, sx, sy)
    offs = jnp.asarray(gaussian_fit.ball_offsets(radius))
    base = seeds_zxy.astype(jnp.int32)
    pos = base[:, None, :] + offs[None, :, :]
    shape = jnp.asarray(im.shape, jnp.int32)
    inb = jnp.all((pos >= 0) & (pos < shape[None, None]), axis=-1)
    imf = im.astype(jnp.float32)
    sides_j = jnp.asarray(sides, jnp.int32)
    origin = jnp.clip(base - radius, 0, shape[None] - sides_j[None])
    # align the y origin down to a lane boundary (keeps rows 512B-aligned);
    # needs sy >= 128 + 2*radius + alignment slack to still cover the ball
    origin = origin.at[:, 2].set((origin[:, 2] // 128) * 128) if sy >= 256 \
        else origin
    origin = jnp.clip(origin, 0, shape[None] - sides_j[None])
    cubes = jax.vmap(
        lambda o: jax.lax.dynamic_slice(imf, o, sides))(origin)
    rel = jnp.clip(pos - origin[:, None, :], 0, sides_j[None, None] - 1)
    idx = (rel[..., 0] * sx + rel[..., 1]) * sy + rel[..., 2]
    pixels = jnp.take_along_axis(cubes.reshape(base.shape[0], -1), idx,
                                 axis=1)
    return pixels, pos.astype(jnp.float32), inb


def main():
    rng = np.random.default_rng(0)
    truth = syn.sample_spot_params(SHAPE, N_SPOTS, rng, min_separation=8.0,
                                   height_range=(400.0, 3000.0),
                                   sigma_jitter=0.0)
    base = syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                                   background=truth["background"])
    im = jax.block_until_ready(
        syn.noisy_uint16_device(base, seed=1).astype(jnp.float32))
    print("device:", jax.devices()[0], flush=True)

    seeds = jax.jit(lambda x: seeding.get_seeds(
        x, max_num_seeds=2048, th_seed=300.0))(im)
    coords = jax.block_until_ready(seeds.coords.astype(jnp.float32))

    ref = timed("current gather (10,10,10)",
                lambda: gaussian_fit.gather_blocks(im, coords, RADIUS))

    for sx, sy in [(10, 128), (16, 128), (10, 256), (16, 256), (10, 512)]:
        out = timed(f"padded gather ({sx},{sy}) y-aligned",
                    lambda sx=sx, sy=sy: gather_blocks_padded(
                        im, coords, RADIUS, sx, sy))
        same = bool(jnp.all(jnp.where(ref[2], ref[0], 0.0)
                            == jnp.where(out[2], out[0], 0.0)))
        print(f"    parity vs current: {same}", flush=True)


if __name__ == "__main__":
    main()
