"""Micro-profile the seeding prep: pad, z-einsum, pooling, small convs."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops.filters import (CONV_PRECISION, _band_matrix,
                                            _conv1d_along_axis,
                                            gaussian_kernel1d)

SHAPE = (60, 2048, 2048)
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
    truth = syn.sample_spot_params(SHAPE, 1800, rng, min_separation=8.0)
    base = syn.render_spots_device(SHAPE, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    ims = [jax.block_until_ready(
        syn.noisy_uint16_device(base, seed=10 + k).astype(jnp.float32))
        for k in range(N_VAR)]
    print("device:", jax.devices()[0], flush=True)

    k_fg = gaussian_kernel1d(0.75)
    k_bg = gaussian_kernel1d(7.5)
    z = SHAPE[0]
    wz = jnp.asarray(_band_matrix(z, tuple(k_fg.tolist()), "reflect"))

    pad = jax.jit(lambda im: jnp.pad(im, ((0, 0), (40, 40), (64, 64)),
                                     mode="symmetric"))
    timed("pad symmetric (40/64)", pad, ims)
    imps = [jax.block_until_ready(pad(im)) for im in ims]

    timed("z einsum HIGHEST (padded)",
          jax.jit(lambda imp: jnp.einsum("zw,wxy->zxy", wz, imp,
                                         precision=CONV_PRECISION)), imps)
    timed("z einsum default precision",
          jax.jit(lambda imp: jnp.einsum("zw,wxy->zxy", wz, imp)), imps)
    timed("z einsum bf16x3",
          jax.jit(lambda imp: (
              jnp.einsum("zw,wxy->zxy", wz.astype(jnp.bfloat16),
                         imp.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32))), imps)

    timed("pool 4x4 mean (reshape)",
          jax.jit(lambda im: im.reshape(z, 512, 4, 512, 4)
                  .mean(axis=(2, 4))), ims)
    timed("pool 4x4 mean (reduce_window)",
          jax.jit(lambda im: jax.lax.reduce_window(
              im, 0.0, jax.lax.add, (1, 4, 4), (1, 4, 4), "VALID")
              / 16.0), ims)

    def small_convs(im):
        pooled = im.reshape(z, 512, 4, 512, 4).mean(axis=(2, 4))
        k_bgs = gaussian_kernel1d(7.5 / 4.0)
        bgs = _conv1d_along_axis(pooled, k_bg, 0, "reflect")
        bgs = _conv1d_along_axis(bgs, k_bgs, 1, "reflect")
        return _conv1d_along_axis(bgs, k_bgs, 2, "reflect")

    timed("pool + 3 small convs", jax.jit(small_convs), ims)


if __name__ == "__main__":
    main()
