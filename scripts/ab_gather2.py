"""A/B: Pallas DMA cube gather vs the XLA vmapped dynamic_slice gather.

The XLA gather costs ~35-44 ms for 2048 cubes (latency-bound: the vmapped
dynamic_slice lowers to a serialized gather).  A Pallas kernel issues the
cube copies as overlapped async DMAs.  Mosaic requires HBM DMA slices with
(8, 128)-aligned shapes AND offsets in the two minor dims, so each cube
fetch is an aligned (sz, 24, 256) window; the (sz, 10, 10) core is sliced
out in VMEM.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import seeding

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


def _aligned_kernel(orig_ref, im_ref, out_ref, win, sem):
    step = pl.program_id(0)
    b, sz, sx, sy = out_ref.shape
    _, _, sxw, syw = win.shape

    def get_dma(s):
        r = step * b + s
        return pltpu.make_async_copy(
            im_ref.at[pl.ds(orig_ref[0, r], sz),
                      pl.ds(pl.multiple_of(orig_ref[1, r], 8), sxw),
                      pl.ds(pl.multiple_of(orig_ref[2, r], 128), syw)],
            win.at[s], sem.at[s])

    for s in range(b):
        get_dma(s).start()
    for s in range(b):
        get_dma(s).wait()
        r = step * b + s
        w = pltpu.roll(win[s], shift=sxw - orig_ref[3, r], axis=1)
        w = pltpu.roll(w, shift=syw - orig_ref[4, r], axis=2)
        out_ref[s] = w[:, :sx, :sy]


@partial(jax.jit, static_argnames=("sides", "block", "interpret"))
def gather_aligned(im, starts, sides, block=16, interpret=False):
    """starts: (5, N) int32 [z0, x0_aligned, y0_aligned, dx, dy] rows."""
    n = starts.shape[1]
    sz, sx, sy = sides
    sxw = 24
    syw = 256
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, sz, sx, sy),
                               lambda i, s: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((block, sz, sxw, syw), im.dtype),
                        pltpu.SemaphoreType.DMA((block,))],
    )
    return pl.pallas_call(
        _aligned_kernel,
        out_shape=jax.ShapeDtypeStruct((n, sz, sx, sy), im.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, im)


def aligned_starts(origins, shape, sxw=24, syw=256):
    """[z0, aligned x0, aligned y0, dx, dy] per cube, windows in-bounds."""
    z0 = origins[:, 0]
    xa = jnp.minimum((origins[:, 1] // 8) * 8, shape[1] - sxw)
    ya = jnp.minimum((origins[:, 2] // 128) * 128, shape[2] - syw)
    return jnp.stack([z0, xa, ya, origins[:, 1] - xa, origins[:, 2] - ya],
                     axis=0).astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    truth = syn.sample_spot_params(SHAPE, N_SPOTS, rng, min_separation=8.0,
                                   height_range=(400.0, 3000.0),
                                   sigma_jitter=0.0)
    base = syn.render_spots_device(SHAPE, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    im = jax.block_until_ready(
        syn.noisy_uint16_device(base, seed=1).astype(jnp.float32))
    print("device:", jax.devices()[0], flush=True)

    seeds = jax.jit(lambda x: seeding.get_seeds(
        x, max_num_seeds=2048, th_seed=300.0))(im)
    coords = jax.block_until_ready(seeds.coords.astype(jnp.float32))

    r = RADIUS
    sides = tuple(min(2 * r, s) for s in SHAPE)
    base_i = coords.astype(jnp.int32)
    shape_j = jnp.asarray(SHAPE, jnp.int32)
    sides_j = jnp.asarray(sides, jnp.int32)
    origins = jax.block_until_ready(
        jnp.clip(base_i - r, 0, shape_j[None] - sides_j[None]))
    starts = jax.block_until_ready(
        jax.jit(partial(aligned_starts, shape=SHAPE))(origins))

    def xla_cubes(im, origins):
        return jax.vmap(
            lambda o: jax.lax.dynamic_slice(im, o, sides))(origins)

    ref = timed("XLA vmapped dynamic_slice cubes",
                lambda: jax.jit(xla_cubes)(im, origins))

    for block in (8, 16, 32):
        out = timed(f"pallas aligned-window cubes (block={block})",
                    lambda b=block: gather_aligned(im, starts, sides, b))
        print("    parity:", bool(jnp.all(out == ref)), flush=True)


if __name__ == "__main__":
    main()
