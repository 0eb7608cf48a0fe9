"""Pad/pool construction shootout for the pyramid classifier prep.

The measured jnp.pad(symmetric) at 60x2048x2048 is ~31 ms vs a ~8 ms
copy roofline, and reshape/reduce_window 4x4 pooling is ~25-32 ms vs
~4 ms — both lower badly on TPU.  Candidates here keep the semantics
the classifier actually needs (min_edge_distance >= 2 makes edge
replication exact for every non-discarded voxel at fg radius 3).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis3_tpu import synthetic as syn

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
    z, x, y = SHAPE

    timed("pad symmetric (40/64)",
          jax.jit(lambda im: jnp.pad(im, ((0, 0), (40, 40), (64, 64)),
                                     mode="symmetric")), ims)
    timed("pad edge (40/64)",
          jax.jit(lambda im: jnp.pad(im, ((0, 0), (40, 40), (64, 64)),
                                     mode="edge")), ims)
    timed("pad constant (40/64)",
          jax.jit(lambda im: jnp.pad(im, ((0, 0), (40, 40), (64, 64)))),
          ims)

    def dus_only(im):
        buf = jnp.zeros((z, x + 80, y + 128), jnp.float32)
        return jax.lax.dynamic_update_slice(buf, im, (0, 40, 64))

    timed("zeros + DUS interior (lane off 64)", jax.jit(dus_only), ims)

    def dus_edge(im):
        # edge-replicate pad built from one aligned interior copy plus
        # four broadcast strips (edge == symmetric at pad index -1, the
        # only index qualifying voxels reach at fg radius 3)
        buf = jnp.zeros((z, x + 80, y + 128), jnp.float32)
        buf = jax.lax.dynamic_update_slice(buf, im, (0, 40, 64))
        left = jnp.broadcast_to(im[:, :, :1], (z, x, 64))
        right = jnp.broadcast_to(im[:, :, -1:], (z, x, 64))
        buf = jax.lax.dynamic_update_slice(buf, left, (0, 40, 0))
        buf = jax.lax.dynamic_update_slice(buf, right, (0, 40, y + 64))
        top = jnp.broadcast_to(buf[:, 40:41], (z, 40, y + 128))
        bot = jnp.broadcast_to(buf[:, x + 39:x + 40], (z, 40, y + 128))
        buf = jax.lax.dynamic_update_slice(buf, top, (0, 0, 0))
        return jax.lax.dynamic_update_slice(buf, bot, (0, x + 40, 0))

    timed("DUS + broadcast strips (edge)", jax.jit(dus_edge), ims)

    def concat_pad(im):
        xl = im[:, 39::-1]
        xr = im[:, :-41:-1]
        v = jnp.concatenate([xl, im, xr], axis=1)
        yl = v[:, :, 63::-1]
        yr = v[:, :, :-65:-1]
        return jnp.concatenate([yl, v, yr], axis=2)

    timed("concat of flipped slices (symmetric)", jax.jit(concat_pad), ims)

    # ---- pooling ----
    xs, ys = x // 4, y // 4
    timed("pool reshape-mean", jax.jit(
        lambda im: im.reshape(z, xs, 4, ys, 4).mean(axis=(2, 4))), ims)
    timed("pool reduce_window", jax.jit(
        lambda im: jax.lax.reduce_window(
            im, 0.0, jax.lax.add, (1, 4, 4), (1, 4, 4), "VALID") / 16.0),
        ims)

    py = np.zeros((y, ys), np.float32)
    for c in range(y):
        py[c, c // 4] = 0.25
    pxm = np.zeros((xs, x), np.float32)
    for r in range(x):
        pxm[r // 4, r] = 0.25
    pyj = jnp.asarray(py)
    pxj = jnp.asarray(pxm)

    def pool_mxu(im):
        # 4x4 mean pooling as two exact-weight matmuls (0.25 is exact in
        # bf16; values split hi/lo for ~f32 accuracy)
        def split(v):
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        vh, vl = split(im)
        t = (jnp.einsum("zxc,cy->zxy", vh, pyj.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
             + jnp.einsum("zxc,cy->zxy", vl, pyj.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32))
        th_, tl = split(t)
        return (jnp.einsum("rx,zxy->zry", pxj.astype(jnp.bfloat16), th_,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("rx,zxy->zry", pxj.astype(jnp.bfloat16), tl,
                             preferred_element_type=jnp.float32))

    timed("pool via MXU matmuls", jax.jit(pool_mxu), ims)

    p_ref = np.asarray(ims[0].reshape(z, xs, 4, ys, 4).mean(axis=(2, 4)))
    p_mxu = np.asarray(pool_mxu(ims[0]))
    print("pool MXU max rel err:",
          float(np.max(np.abs(p_mxu - p_ref)
                       / np.maximum(np.abs(p_ref), 1.0))))


if __name__ == "__main__":
    main()
