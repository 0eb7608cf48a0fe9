"""A/B: exact fused classify vs pyramid-background classify on chip."""
import time
import jax, jax.numpy as jnp, numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops.pallas_kernels import (fused_seed_classify,
                                                   fused_seed_classify_pyramid)

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
    print(f"{label:46s} {1e3*per:8.2f} ms/item", flush=True)

print("device:", jax.devices()[0], flush=True)

def exact_of(im):
    q, c = fused_seed_classify(im.astype(jnp.float32), 0.75, 7.5, 300.0, 10,
                               min_edge_distance=2)
    return q[0, 0, 0] + c.sum()

def pyr_of(im):
    q, c = fused_seed_classify_pyramid(im.astype(jnp.float32), 0.75, 7.5,
                                       300.0, 10, min_edge_distance=2)
    return q[0, 0, 0] + c.sum()

def pyr128_of(im):
    q, c = fused_seed_classify_pyramid(im.astype(jnp.float32), 0.75, 7.5,
                                       300.0, 10, min_edge_distance=2,
                                       block_x=128)
    return q[0, 0, 0] + c.sum()

per_item("exact fused classify", exact_of)
per_item("pyramid classify bx=64", pyr_of)
per_item("pyramid classify bx=128", pyr128_of)

# accuracy on-chip at full scale: level-0 set identity
base = syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                               background=truth["background"])
im = syn.noisy_uint16_device(base, seed=7).astype(jnp.float32)
qe, ce = fused_seed_classify(im, 0.75, 7.5, 300.0, 10, min_edge_distance=2)
qp, cp = fused_seed_classify_pyramid(im, 0.75, 7.5, 300.0, 10,
                                     min_edge_distance=2)
ce, cp = np.asarray(ce), np.asarray(cp)
print("counts exact  ", ce, flush=True)
print("counts pyramid", cp, flush=True)
