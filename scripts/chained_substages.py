"""Chained (dispatch-latency-free) substage breakdown of seed+fit."""
import time
import jax, jax.numpy as jnp, numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import seeding, gaussian_fit
from imageanalysis3_tpu.ops.pallas_kernels import fused_seed_classify

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
    print(f"{label:42s} {1e3*per:8.2f} ms/item", flush=True)

print("device:", jax.devices()[0], flush=True)

def classify_of(im):
    q, c = fused_seed_classify(im.astype(jnp.float32), 0.75, 7.5, 300.0, 10,
                               min_edge_distance=2)
    return q[0, 0, 0] + c.sum()          # tiny output, keeps all work

per_item("fused_seed_classify", classify_of)

def classify_sum_of(im):
    # same + a full reduction over qdiff (one extra 1GB read)
    q, c = fused_seed_classify(im.astype(jnp.float32), 0.75, 7.5, 300.0, 10,
                               min_edge_distance=2)
    return jnp.sum(jnp.where(jnp.isfinite(q), q, 0.0)) + c.sum()

per_item("classify + 1 full reduce", classify_sum_of)

coords_np = np.stack([np.random.default_rng(1).integers(5, s - 5, 2048)
                      for s in SHAPE], 1).astype(np.float32)
coords_fixed = jnp.asarray(coords_np)
valid_fixed = jnp.ones(2048, bool)

def r0_of(im):
    r = gaussian_fit.iter_fit_seed_points(
        im.astype(jnp.float32), coords_fixed, valid_fixed, n_max_iter=0)
    return r.spots.sum()

per_item("iter_fit n_max_iter=0 (fixed seeds)", r0_of)

def r2_of(im):
    r = gaussian_fit.iter_fit_seed_points(
        im.astype(jnp.float32), coords_fixed, valid_fixed, n_max_iter=2)
    return r.spots.sum()

per_item("iter_fit n_max_iter=2 (fixed seeds)", r2_of)

def gather_of(im):
    px, co, mk = gaussian_fit.gather_blocks(im.astype(jnp.float32),
                                            coords_fixed, 5)
    return px.sum()

per_item("gather_blocks (fixed seeds)", gather_of)

def neigh_of(im):
    c = coords_fixed + 0.0 * im[0, 0, 0]
    i, m = gaussian_fit.neighbor_lists(c, valid_fixed, 12, 5)
    return i.sum() + m.sum()

per_item("neighbor_lists", neigh_of)
