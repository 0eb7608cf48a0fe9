"""A/B: neighbor_lists implementations on the real chip.

Current: broadcast-subtract d2 (N,N,3 intermediate) + lax.top_k(k=12) per
row (lowers to a full row sort on TPU).  Candidates: Gram-matrix d2 on the
MXU, iterative masked argmax extraction (k passes over the 16 MB matrix),
and approx_max_k.
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
K = 12


def timed(label, fn, *args, n=7):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {1e3 * float(np.median(ts)):8.2f} ms", flush=True)
    return out


def _d2_gram(pts):
    """Pairwise squared distances via the MXU: |a|^2 + |b|^2 - 2 a.b."""
    sq = jnp.sum(pts * pts, axis=1)
    gram = pts @ pts.T
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    return jnp.maximum(d2, 0.0)


@partial(jax.jit, static_argnames=("max_neighbors", "radius"))
def neighbors_gram_topk(seeds_zxy, valid, max_neighbors=K, radius=RADIUS):
    n = seeds_zxy.shape[0]
    pts = seeds_zxy.astype(jnp.float32)
    d2 = _d2_gram(pts)
    both = valid[:, None] & valid[None, :]
    d2 = jnp.where(both, d2, jnp.inf)
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    within = d2 <= (2.0 * radius) ** 2
    neg = jnp.where(within, -d2, -jnp.inf)
    vals, idx = jax.lax.top_k(neg, min(max_neighbors, n))
    return idx, jnp.isfinite(vals)


@partial(jax.jit, static_argnames=("max_neighbors", "radius"))
def neighbors_gram_iter(seeds_zxy, valid, max_neighbors=K, radius=RADIUS):
    n = seeds_zxy.shape[0]
    pts = seeds_zxy.astype(jnp.float32)
    d2 = _d2_gram(pts)
    both = valid[:, None] & valid[None, :]
    d2 = jnp.where(both, d2, jnp.inf)
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    neg = jnp.where(d2 <= (2.0 * radius) ** 2, -d2, -jnp.inf)
    idxs, masks = [], []
    for _ in range(min(max_neighbors, n)):
        i = jnp.argmax(neg, axis=1)
        v = jnp.take_along_axis(neg, i[:, None], axis=1)[:, 0]
        idxs.append(i)
        masks.append(jnp.isfinite(v))
        neg = jnp.where(jnp.arange(n)[None] == i[:, None], -jnp.inf, neg)
    return jnp.stack(idxs, 1), jnp.stack(masks, 1)


@partial(jax.jit, static_argnames=("max_neighbors", "radius"))
def neighbors_gram_approx(seeds_zxy, valid, max_neighbors=K, radius=RADIUS):
    n = seeds_zxy.shape[0]
    pts = seeds_zxy.astype(jnp.float32)
    d2 = _d2_gram(pts)
    both = valid[:, None] & valid[None, :]
    d2 = jnp.where(both, d2, jnp.inf)
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    neg = jnp.where(d2 <= (2.0 * radius) ** 2, -d2, -jnp.inf)
    vals, idx = jax.lax.approx_max_k(neg, min(max_neighbors, n),
                                     recall_target=0.99)
    return idx, jnp.isfinite(vals)


def canon(idx, mask):
    """Sorted valid-neighbor sets per row for order-insensitive parity."""
    big = jnp.where(mask, idx, 1 << 20)
    return jnp.sort(big, axis=1)


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
    valid = seeds.valid

    ref = timed("current neighbor_lists (bcast + top_k)",
                lambda: gaussian_fit.neighbor_lists(coords, valid, K,
                                                    RADIUS))
    ref_c = canon(*ref)
    for label, fn in [("gram + top_k", neighbors_gram_topk),
                      ("gram + iterative argmax", neighbors_gram_iter),
                      ("gram + approx_max_k", neighbors_gram_approx)]:
        out = timed(label, lambda fn=fn: fn(coords, valid))
        same = bool(jnp.all(canon(*out) == ref_c))
        print(f"    neighbor-set parity: {same}", flush=True)


if __name__ == "__main__":
    main()
