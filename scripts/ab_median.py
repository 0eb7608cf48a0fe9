"""A/B: counting binary-search median vs two-level histogram median."""
import time
import jax, jax.numpy as jnp, numpy as np

from imageanalysis3_tpu.ops.filters import counting_median_layers_and_global

SHAPE = (60, 2048, 2048)
K = 4
SUB = 4


def stacked(k0):
    outs = []
    for k in range(K):
        key = jax.random.PRNGKey(k0 + k)
        outs.append(jax.random.randint(key, SHAPE, 100, 10000, jnp.uint16))
    return jax.block_until_ready(jnp.stack(outs))


def per_item(label, fn):
    f1 = jax.jit(lambda xs: jax.lax.map(fn, xs))
    vK = stacked(100)
    jax.block_until_ready(f1(vK[:1])); jax.block_until_ready(f1(vK))
    del vK
    vK2 = stacked(200)
    t0 = time.perf_counter(); jax.block_until_ready(f1(vK2[K - 1:])); t1 = time.perf_counter()
    t2 = time.perf_counter(); jax.block_until_ready(f1(vK2)); t3 = time.perf_counter()
    del vK2
    per = ((t3 - t2) - (t1 - t0)) / (K - 1)
    print(f"{label:46s} {1e3 * per:8.2f} ms/item", flush=True)


def hist_median_layers_and_global(im, subsample=SUB):
    """Two-level 512-bin histogram median over quarter-integer codes.

    Same semantics as counting_median_layers_and_global: lower median
    m = min{v : count(<= v) >= ceil(N/2)} on the 1/4-integer grid.
    """
    imf = im.astype(jnp.float32)
    if subsample > 1:
        imf = imf[:, ::subsample, ::subsample]
    z = imf.shape[0]
    flat = imf.reshape(z, -1)
    n_layer = flat.shape[1]
    n_all = flat.size
    codes = jnp.floor(flat * 4.0 + 0.5).astype(jnp.int32)   # 18-bit codes
    coarse = codes >> 9                                     # 512 coarse bins
    bins = jnp.arange(512, dtype=jnp.int32)
    # pass 1: per-layer coarse histogram (one data read, 512-wide acc)
    h1 = jnp.sum((coarse[:, :, None] == bins[None, None, :]).astype(jnp.float32),
                 axis=1)                                    # (z, 512)
    c1 = jnp.cumsum(h1, axis=1)
    half_l = (n_layer + 1) // 2
    b1 = jnp.argmax(c1 >= half_l, axis=1).astype(jnp.int32)         # (z,)
    # rank of the median within its coarse bin
    below = jnp.where(b1 > 0, jnp.take_along_axis(
        c1, jnp.maximum(b1 - 1, 0)[:, None], axis=1)[:, 0], 0.0)
    k_l = half_l - below                                    # 1-based rank in bin
    # global: same trick on the layer-summed histogram
    hg = jnp.sum(h1, axis=0)
    cg = jnp.cumsum(hg)
    half_g = (n_all + 1) // 2
    bg = jnp.argmax(cg >= half_g).astype(jnp.int32)
    below_g = jnp.where(bg > 0, cg[jnp.maximum(bg - 1, 0)], 0.0)
    k_g = half_g - below_g
    # pass 2: fine histograms inside the selected coarse bins
    fine = codes & 511
    in1 = coarse == b1[:, None]
    h2 = jnp.sum(jnp.where(in1[:, :, None], (fine[:, :, None] == bins[None, None, :])
                           .astype(jnp.float32), 0.0), axis=1)      # (z, 512)
    c2 = jnp.cumsum(h2, axis=1)
    f1 = jnp.argmax(c2 >= k_l[:, None], axis=1).astype(jnp.int32)
    layer_med = ((b1 << 9) | f1).astype(jnp.float32) / 4.0
    ing = coarse == bg
    h2g = jnp.sum(jnp.where(ing[:, :, None], (fine[:, :, None] == bins[None, None, :])
                            .astype(jnp.float32), 0.0), axis=(0, 1))
    c2g = jnp.cumsum(h2g)
    fg = jnp.argmax(c2g >= k_g).astype(jnp.int32)
    global_med = ((bg << 9) | fg).astype(jnp.float32) / 4.0
    return layer_med, global_med


# correctness first (CPU-ish small shapes are fine on device too)
rng = np.random.default_rng(0)
small = np.clip(np.round(rng.normal(500, 40, (6, 256, 256)) * 4) / 4, 0, 65535
                ).astype(np.float32)
el, eg = counting_median_layers_and_global(jnp.asarray(small), subsample=1)
hl, hg_ = hist_median_layers_and_global(jnp.asarray(small), subsample=1)
print("layer match:", np.allclose(np.asarray(el), np.asarray(hl)),
      "global match:", np.allclose(float(eg), float(hg_)))

print("device:", jax.devices()[0], flush=True)


def count_of(im):
    l, g = counting_median_layers_and_global(im.astype(jnp.float32),
                                             subsample=SUB)
    return l.sum() + g


per_item("counting median (sub=4)", count_of)


def hist_of(im):
    l, g = hist_median_layers_and_global(im)
    return l.sum() + g


per_item("two-level histogram median (sub=4)", hist_of)


def sort_of(im):
    imf = im.astype(jnp.float32)[:, ::SUB, ::SUB]
    s = jnp.sort(imf.reshape(imf.shape[0], -1), axis=1)
    n = s.shape[1]
    l = s[:, (n + 1) // 2 - 1]
    return l.sum()


per_item("sort median (sub=4, layers only)", sort_of)
