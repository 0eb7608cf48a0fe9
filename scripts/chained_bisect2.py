"""Chained bisect: what inside iter_fit round-0 and extraction is slow."""
import time
from functools import partial
import jax, jax.numpy as jnp, numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import seeding, gaussian_fit

SHAPE = (60, 2048, 2048)
K = 4
rng = np.random.default_rng(0)
truth = syn.sample_spot_params(SHAPE, 1800, rng, min_separation=8.0,
                               height_range=(400.0, 3000.0), sigma_jitter=0.0)

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
coords_fixed = jnp.asarray(np.stack(
    [np.random.default_rng(1).integers(5, s - 5, 2048) for s in SHAPE], 1
    ).astype(np.float32))
valid_fixed = jnp.ones(2048, bool)

def prep_of(im):
    imf = im.astype(jnp.float32)
    px, co, mk = gaussian_fit.gather_blocks(imf, coords_fixed, 5)
    nidx, nm = gaussian_fit.neighbor_lists(coords_fixed, valid_fixed, 12, 5)
    own = jax.vmap(gaussian_fit.ownership_mask)(
        co, coords_fixed, coords_fixed[nidx], nm)
    p0 = jax.vmap(lambda p, m: gaussian_fit.init_params(p, m, 0.5, 4.0, 1.5))(
        px, mk & own)
    return px.sum() + own.sum() + p0.sum()

per_item("gather+neighbors+ownership+init", prep_of)

def lmN(im, iters):
    imf = im.astype(jnp.float32)
    px, co, mk = gaussian_fit.gather_blocks(imf, coords_fixed, 5)
    fit0 = jax.vmap(lambda p, c, m, ce: gaussian_fit.lm_fit_single(
        p, c, m, ce, 1.0, 0.5, 4.0, 1.5, iters))
    params, eps = fit0(px, co, mk, coords_fixed)
    return params.sum() + eps.sum()

per_item("gather + LM x2", lambda im: lmN(im, 2))
per_item("gather + LM x30", lambda im: lmN(im, 30))

# extraction bisect
from imageanalysis3_tpu.ops.pallas_kernels import fused_seed_classify

def ext_stage(im, stage):
    q, counts = fused_seed_classify(im.astype(jnp.float32), 0.75, 7.5,
                                    300.0, 10, min_edge_distance=2)
    cum = jnp.cumsum(counts)
    chosen = jnp.where(jnp.any(cum >= 1), jnp.argmax(cum >= 1), 9)
    sel = jnp.ceil((1.0 - q / 300.0) * 10) <= chosen.astype(jnp.float32)
    if stage == 0:
        return jnp.sum(sel)
    xyc = jnp.sum(sel.astype(jnp.int32), axis=0)
    sel = sel & (xyc[None] < 3)
    masked = jnp.where(sel, q, -jnp.inf)
    red = jax.lax.reduce_window(masked, -jnp.inf, jax.lax.max,
                                (2, 2, 2), (2, 2, 2), "VALID").ravel()
    if stage == 1:
        return jnp.sum(jnp.where(jnp.isfinite(red), red, 0.0))
    rows = 16384; cols = -(-red.shape[0] // rows)
    flat = jnp.pad(red, (0, rows * cols - red.shape[0]),
                   constant_values=-jnp.inf)
    v1, i1 = jax.lax.top_k(flat.reshape(rows, cols), 16)
    if stage == 2:
        return v1.sum()
    hts, order = jax.lax.top_k(v1.ravel(), 2048)
    return hts.sum()

per_item("classify+sel reduce           (st0)", lambda im: ext_stage(im, 0))
per_item("classify+hot+reduce_window    (st1)", lambda im: ext_stage(im, 1))
per_item("classify+...+rowtopk          (st2)", lambda im: ext_stage(im, 2))
per_item("classify+...+final topk       (st3)", lambda im: ext_stage(im, 3))
