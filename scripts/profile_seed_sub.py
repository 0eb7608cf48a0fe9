"""Seeding-stage substage profile: prep einsum vs pyramid kernel vs
extraction, bench shapes, tunnel-cache-safe variants."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import seeding
from imageanalysis3_tpu.ops.pallas_kernels import \
    fused_seed_classify_pyramid

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
    truth = syn.sample_spot_params(SHAPE, 1800, rng, min_separation=8.0,
                                   height_range=(400.0, 3000.0),
                                   sigma_jitter=0.0)
    base = syn.render_spots_device(SHAPE, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    ims = [jax.block_until_ready(
        syn.noisy_uint16_device(base, seed=10 + k).astype(jnp.float32))
        for k in range(N_VAR)]
    print("device:", jax.devices()[0], flush=True)

    timed("get_seeds full (pyramid)",
          jax.jit(lambda x: seeding.get_seeds(
              x, max_num_seeds=2048, th_seed=300.0, pyramid_bg=True)), ims)

    timed("fused_seed_classify_pyramid",
          jax.jit(partial(fused_seed_classify_pyramid,
                          sigma_fg=0.75, sigma_bg=7.5, th_seed=300.0,
                          n_lvl=10, min_edge_distance=2)), ims)

    # prep replica: the z-pass einsum + pooled bg pyramid (the XLA work
    # in front of the pallas_call inside fused_seed_classify_pyramid)
    from imageanalysis3_tpu.ops.filters import (CONV_PRECISION,
                                                _band_matrix,
                                                _conv1d_along_axis,
                                                gaussian_kernel1d)

    def prep(imf):
        z, x, y = imf.shape
        k_fg = gaussian_kernel1d(0.75)
        k_bg = gaussian_kernel1d(7.5)
        imp = jnp.pad(imf, ((0, 0), (40, 40), (64, 64)), mode="symmetric")
        wz = _band_matrix(z, tuple(k_fg.tolist()), "reflect")
        fgz = jnp.einsum("zw,wxy->zxy", jnp.asarray(wz), imp,
                         precision=CONV_PRECISION)
        pooled = imf.reshape(z, x // 4, 4, y // 4, 4).mean(axis=(2, 4))
        k_bgs = gaussian_kernel1d(7.5 / 4.0)
        bgs = _conv1d_along_axis(pooled, k_bg, 0, "reflect")
        bgs = _conv1d_along_axis(bgs, k_bgs, 1, "reflect")
        bgs = _conv1d_along_axis(bgs, k_bgs, 2, "reflect")
        return fgz, bgs

    timed("prep only (z-pass einsum + pooled bg)", jax.jit(prep), ims)

    # extraction-only: classifier outputs precomputed, rest of get_seeds
    cls = jax.jit(partial(fused_seed_classify_pyramid,
                          sigma_fg=0.75, sigma_bg=7.5, th_seed=300.0,
                          n_lvl=10, min_edge_distance=2))
    outs = [jax.block_until_ready(cls(im)) for im in ims]

    def extract(args):
        qdiff, counts = args
        return seeding._extract_from_qdiff(
            qdiff, counts, 300.0, 10, 500, 2048, True, 4)

    if hasattr(seeding, "_extract_from_qdiff"):
        timed("extraction only", jax.jit(extract), outs)
    else:
        print("(_extract_from_qdiff not split out; extraction = full - "
              "classifier)")


if __name__ == "__main__":
    main()
