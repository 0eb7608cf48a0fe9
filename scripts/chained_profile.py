"""Tunnel-proof timings: K distinct variants through lax.map in ONE
dispatch; per-item time = (t_K - t_1) / (K - 1) cancels dispatch latency.
Inputs stay uint16 (0.5 GB each) and promote inside the mapped fn."""
import time
import jax, jax.numpy as jnp, numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import seeding, gaussian_fit

SHAPE = (60, 2048, 2048)
N_SPOTS = 1800
K = 4

rng = np.random.default_rng(0)
truth = syn.sample_spot_params(SHAPE, N_SPOTS, rng, min_separation=8.0,
                               height_range=(400.0, 3000.0),
                               sigma_jitter=0.0)

def stacked(k0):
    base = syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                                   background=truth["background"])
    vs = jnp.stack([syn.noisy_uint16_device(base, seed=k0 + k)
                    for k in range(K)])
    return jax.block_until_ready(vs)

def per_item(label, fn):
    f1 = jax.jit(lambda xs: jax.lax.map(fn, xs))
    vK = stacked(100)
    jax.block_until_ready(f1(vK[:1])); jax.block_until_ready(f1(vK))
    del vK
    vK2 = stacked(200)
    t0 = time.perf_counter(); jax.block_until_ready(f1(vK2[K-1:])); t1 = time.perf_counter()
    t2 = time.perf_counter(); jax.block_until_ready(f1(vK2)); t3 = time.perf_counter()
    del vK2
    per = ((t3 - t2) - (t1 - t0)) / (K - 1)
    print(f"{label:40s} {1e3*per:8.2f} ms/item  (1: {1e3*(t1-t0):.1f}, {K}: {1e3*(t3-t2):.1f})", flush=True)

print("device:", jax.devices()[0], flush=True)

def seeds_of(im):
    s = seeding.get_seeds(im.astype(jnp.float32), max_num_seeds=2048,
                          th_seed=300.0)
    return s.coords.sum() + s.count

per_item("get_seeds", seeds_of)

def fit_of(im):
    imf = im.astype(jnp.float32)
    s = seeding.get_seeds(imf, max_num_seeds=2048, th_seed=300.0)
    r = gaussian_fit.iter_fit_seed_points(imf, s.coords.astype(jnp.float32),
                                          s.valid)
    return r.spots.sum() + r.n_rounds + r.n_contested

per_item("get_seeds + iter_fit", fit_of)
