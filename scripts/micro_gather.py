"""Microbenchmark gather_blocks / neighbor_lists alternatives on TPU.

Tunnel discipline: inputs are device-rendered, every timed call consumes a
DISTINCT input variant (the tunnel caches identical calls), and parity
checks reduce on device (device->host moves MBs/s).
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (60, 2048, 2048)
N = 2048
R = 5


def timed(label, fn, variants):
    jax.block_until_ready(fn(*variants[-1]))
    ts = []
    for v in variants[:-1]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*v))
        ts.append(time.perf_counter() - t0)
    print(f"{label:42s} {1e3 * float(np.median(ts)):8.2f} ms", flush=True)


from imageanalysis3_tpu.ops.gaussian_fit import (ball_offsets, gather_blocks,
                                                 neighbor_lists)

rng = np.random.default_rng(0)
im = jax.block_until_ready(
    jax.random.uniform(jax.random.PRNGKey(0), SHAPE, jnp.float32))
seed_vars = [jnp.asarray(
    np.stack([rng.integers(5, s - 5, N) for s in SHAPE], 1), jnp.float32)
    for _ in range(6)]
valid = jnp.ones(N, bool)
print("device:", jax.devices()[0], flush=True)

gv = [(im, s) for s in seed_vars]
timed("gather_blocks (current, cube dyn-slice)",
      lambda i, s: gather_blocks(i, s, R), gv)


@partial(jax.jit, static_argnames=("radius",))
def gather_aligned(im, seeds_zxy, radius):
    sides = (min(2 * radius, SHAPE[0]), min(2 * radius, SHAPE[1]), 256)
    offs = jnp.asarray(ball_offsets(radius))
    base = seeds_zxy.astype(jnp.int32)
    pos = base[:, None, :] + offs[None, :, :]
    shape = jnp.asarray(im.shape, jnp.int32)
    inb = jnp.all((pos >= 0) & (pos < shape[None, None]), axis=-1)
    imf = im.astype(jnp.float32)
    sides_j = jnp.asarray(sides, jnp.int32)
    oz = jnp.clip(base[:, 0] - radius, 0, shape[0] - sides[0])
    ox = jnp.clip(base[:, 1] - radius, 0, shape[1] - sides[1])
    oy = jnp.clip(((base[:, 2] - radius) // 128) * 128, 0,
                  shape[2] - sides[2])
    origin = jnp.stack([oz, ox, oy], 1)
    cubes = jax.vmap(
        lambda o: jax.lax.dynamic_slice(imf, o, sides))(origin)
    rel = jnp.clip(pos - origin[:, None, :], 0, sides_j[None, None] - 1)
    idx = (rel[..., 0] * sides[1] + rel[..., 1]) * sides[2] + rel[..., 2]
    pixels = jnp.take_along_axis(cubes.reshape(N, -1), idx, axis=1)
    return pixels, pos.astype(jnp.float32), inb


timed("gather aligned-256", lambda i, s: gather_aligned(i, s, R), gv)


@partial(jax.jit, static_argnames=("radius",))
def gather_flat(im, seeds_zxy, radius):
    offs = jnp.asarray(ball_offsets(radius))
    base = seeds_zxy.astype(jnp.int32)
    pos = base[:, None, :] + offs[None, :, :]
    shape = jnp.asarray(im.shape, jnp.int32)
    inb = jnp.all((pos >= 0) & (pos < shape[None, None]), axis=-1)
    cl = jnp.clip(pos, 0, shape[None, None] - 1)
    flat = (cl[..., 0] * SHAPE[1] + cl[..., 1]) * SHAPE[2] + cl[..., 2]
    pixels = jnp.take(im.reshape(-1), flat, axis=0)
    return pixels, pos.astype(jnp.float32), inb


timed("gather flat take", lambda i, s: gather_flat(i, s, R), gv)


@jax.jit
def sort_seeds(s):
    key = (s[:, 0] * SHAPE[1] + s[:, 1]) * SHAPE[2] + s[:, 2]
    return s[jnp.argsort(key)]


gvs = [(im, sort_seeds(s)) for s in seed_vars]
jax.block_until_ready(gvs)
timed("gather cube, sorted seeds",
      lambda i, s: gather_blocks(i, s, R), gvs)
timed("gather aligned-256, sorted seeds",
      lambda i, s: gather_aligned(i, s, R), gvs)

p0 = gather_blocks(im, seed_vars[0], R)
pa = gather_aligned(im, seed_vars[0], R)
same = jnp.all(jnp.where(p0[2], p0[0], 0.0) == jnp.where(pa[2], pa[0], 0.0))
print("aligned parity:", bool(same), flush=True)

# --- neighbor lists
nv = [(s,) for s in seed_vars]
timed("neighbor_lists (current, top_k)",
      lambda s: neighbor_lists(s, valid, 12, R), nv)


@partial(jax.jit, static_argnames=("max_neighbors", "radius"))
def neighbor_iter(seeds_zxy, valid, max_neighbors=12, radius=5):
    n = seeds_zxy.shape[0]
    d2 = jnp.sum((seeds_zxy[:, None].astype(jnp.float32)
                  - seeds_zxy[None].astype(jnp.float32)) ** 2, axis=-1)
    both = valid[:, None] & valid[None, :]
    d2 = jnp.where(both, d2, jnp.inf)
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    d2 = jnp.where(d2 <= (2.0 * radius) ** 2, d2, jnp.inf)
    idxs, masks = [], []
    cur = d2
    rows = jnp.arange(n)
    for _ in range(max_neighbors):
        j = jnp.argmin(cur, axis=1)
        v = cur[rows, j]
        idxs.append(j)
        masks.append(jnp.isfinite(v))
        cur = cur.at[rows, j].set(jnp.inf)
    return jnp.stack(idxs, 1), jnp.stack(masks, 1)


timed("neighbor iterative argmin x12",
      lambda s: neighbor_iter(s, valid, 12, R), nv)


@partial(jax.jit, static_argnames=("max_neighbors", "radius"))
def neighbor_mm(seeds_zxy, valid, max_neighbors=12, radius=5):
    s = seeds_zxy.astype(jnp.float32)
    sq = jnp.sum(s * s, axis=1)
    g = jnp.dot(s, s.T, precision=jax.lax.Precision.HIGHEST)
    d2 = sq[:, None] + sq[None, :] - 2 * g
    n = seeds_zxy.shape[0]
    both = valid[:, None] & valid[None, :]
    d2 = jnp.where(both & ~jnp.eye(n, dtype=bool), d2, jnp.inf)
    within = d2 <= (2.0 * radius) ** 2
    neg = jnp.where(within, -d2, -jnp.inf)
    vals, idx = jax.lax.top_k(neg, max_neighbors)
    return idx, jnp.isfinite(vals)


timed("neighbor matmul-d2 + top_k",
      lambda s: neighbor_mm(s, valid, 12, R), nv)

n0 = neighbor_lists(seed_vars[0], valid, 12, R)
n1 = neighbor_iter(seed_vars[0], valid, 12, R)


def canon(idx, msk):
    return jnp.sort(jnp.where(msk, idx, N + 1), axis=1)


print("iter parity:", bool(jnp.all(canon(*n0) == canon(*n1))), flush=True)
