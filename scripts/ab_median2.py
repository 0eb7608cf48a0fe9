"""A/B: 2-way vs 8-way vs 16-way counting-median search."""
import time
from functools import partial
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


def kway_median_layers_and_global(im, subsample=SUB, bits=18, log2_ways=3):
    """Lower median via a 2**log2_ways-way counting search (exact on the
    quarter-integer code grid, identical result to the binary version)."""
    imf = im.astype(jnp.float32)
    if subsample > 1:
        imf = imf[:, ::subsample, ::subsample]
    z = imf.shape[0]
    codes = jnp.floor(imf.reshape(z, -1) * 4.0 + 0.5).astype(jnp.int32)
    # materialize the strided subsample once: without the barrier XLA fuses
    # the stride-4 gather into every loop iteration
    codes = jax.lax.optimization_barrier(codes)
    n_layer = codes.shape[1]
    n_all = codes.size
    half_l = (n_layer + 1) // 2
    half_g = (n_all + 1) // 2
    ways = 1 << log2_ways
    n_iter = -(-bits // log2_ways)
    j = jnp.arange(1, ways, dtype=jnp.int32)            # (ways-1,) split points

    lo_l = jnp.zeros((z,), jnp.int32)
    lo_g = jnp.zeros((), jnp.int32)
    # round the searched range up so the final pass lands on width 1
    width = jnp.int32(1 << (n_iter * log2_ways))

    def body(_, state):
        lo_l, lo_g, width = state
        w = width >> log2_ways                           # sub-bucket width
        # layer thresholds: t_{z,j} = lo_l + j*w - 1  (count of <= t)
        t_l = lo_l[:, None] + j[None, :] * w             # (z, ways-1) boundaries
        cnt_l = jnp.sum((codes[:, :, None] < t_l[:, None, :]).astype(jnp.float32),
                        axis=1)                          # (z, ways-1)
        # first bucket whose cumulative count reaches half: number of
        # boundaries with count < half = bucket index
        idx_l = jnp.sum((cnt_l < half_l).astype(jnp.int32), axis=1)
        lo_l = lo_l + idx_l * w
        t_g = lo_g + j * w
        cnt_g = jnp.sum((codes[:, :, None] < t_g[None, None, :])
                        .astype(jnp.float32), axis=(0, 1))
        idx_g = jnp.sum((cnt_g < half_g).astype(jnp.int32))
        lo_g = lo_g + idx_g * w
        return lo_l, lo_g, w

    lo_l, lo_g, _ = jax.lax.fori_loop(0, n_iter, body, (lo_l, lo_g, width))
    return lo_l.astype(jnp.float32) / 4.0, lo_g.astype(jnp.float32) / 4.0


rng = np.random.default_rng(0)
small = np.clip(np.round(rng.normal(500, 40, (6, 256, 256)) * 4) / 4, 0, 65535
                ).astype(np.float32)
el, eg = counting_median_layers_and_global(jnp.asarray(small), subsample=1)
for lw in (2, 3, 4):
    hl, hg = kway_median_layers_and_global(jnp.asarray(small), subsample=1,
                                           log2_ways=lw)
    print(f"ways=2^{lw} layer match:",
          np.allclose(np.asarray(el), np.asarray(hl)),
          "global:", np.isclose(float(eg), float(hg)))

print("device:", jax.devices()[0], flush=True)


def count_of(im):
    l, g = counting_median_layers_and_global(im.astype(jnp.float32),
                                             subsample=SUB)
    return l.sum() + g


per_item("binary counting median (sub=4)", count_of)

for lw in (2, 3, 4):
    def kway_of(im, lw=lw):
        l, g = kway_median_layers_and_global(im, log2_ways=lw)
        return l.sum() + g
    per_item(f"{1 << lw}-way counting median (sub=4)", kway_of)
