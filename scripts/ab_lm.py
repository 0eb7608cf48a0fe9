"""A/B: deferred-linearize LM vs eval-at-accepted LM, chained timing."""
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import gaussian_fit as gf

SHAPE = (60, 2048, 2048)
N_SPOTS = 1800
K = 4
LM_ITERS = 20

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

coords_np = np.stack([np.random.default_rng(1).integers(5, s - 5, 2048)
                      for s in SHAPE], 1).astype(np.float32)
coords_fixed = jnp.asarray(coords_np)

def lm_old_single(pixels, coords, mask, center_est, delta, min_w, max_w,
                  init_w, lm_iters):
    params0 = gf.init_params(pixels, mask, min_w, max_w, init_w)
    maskf = mask.astype(jnp.float32)
    def residual(p):
        f = gf.gaussian_model(p, coords, center_est, delta, min_w, max_w)
        return (f - pixels) * maskf
    def step(i, state):
        params, lam, cost = state
        r, f_jvp = jax.linearize(residual, params)
        basis = jnp.eye(10, dtype=params.dtype) + 0.0 * params[None]
        Jt = jax.vmap(f_jvp)(basis)
        g = jnp.einsum("ip,p->i", Jt, r, precision=gf._HIGH)
        H = jnp.einsum("ip,jp->ij", Jt, Jt, precision=gf._HIGH)
        A = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-8 * jnp.eye(10)
        dp = gf._cg_solve_spd(A, -g)
        newp = params + dp
        newc = jnp.sum(residual(newp) ** 2)
        ok = (newc < cost) & jnp.all(jnp.isfinite(newp))
        params = jnp.where(ok, newp, params)
        cost = jnp.where(ok, newc, cost)
        lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-7),
                        jnp.minimum(lam * 3.0, 1e7))
        return params, lam, cost
    cost0 = jnp.sum(residual(params0) ** 2)
    params, _, _ = jax.lax.fori_loop(0, lm_iters, step,
                                     (params0, cost0 * 0 + 1e-3, cost0))
    return params

def run_old(im):
    imf = im.astype(jnp.float32)
    px, co, mk = gf.gather_blocks(imf, coords_fixed, 5)
    fit = jax.vmap(lambda p, c, m, ce: lm_old_single(
        p, c, m, ce, 1.0, 0.5, 4.0, 1.5, LM_ITERS))
    params = fit(px, co, mk, coords_fixed)
    return params.sum()

def run_new(im):
    imf = im.astype(jnp.float32)
    px, co, mk = gf.gather_blocks(imf, coords_fixed, 5)
    fit = jax.vmap(lambda p, c, m, ce: gf.lm_fit_single(
        p, c, m, ce, 1.0, 0.5, 4.0, 1.5, LM_ITERS)[0])
    params = fit(px, co, mk, coords_fixed)
    return params.sum()

per_item(f"gather + LM old ({LM_ITERS} iters)", run_old)
per_item(f"gather + LM new ({LM_ITERS} iters)", run_new)
per_item(f"gather + LM old ({LM_ITERS} iters) rep2", run_old)
