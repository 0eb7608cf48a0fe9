"""Chained (dispatch-latency-free) substage breakdown of the correct stage."""
import time
import jax, jax.numpy as jnp, numpy as np

from imageanalysis3_tpu.ops import corrections
from imageanalysis3_tpu.ops.filters import counting_median_layers_and_global

SHAPE = (60, 2048, 2048)
K = 4


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
    print(f"{label:44s} {1e3 * per:8.2f} ms/item", flush=True)


print("device:", jax.devices()[0], flush=True)

flat = jnp.ones((1, 2048, 2048), jnp.float32)


def full_of(im):
    out = corrections.correct_channel_stack(im[None], illumination_profile=flat,
                                            median_subsample=4)
    return out[0, 0, 0, 0]


per_item("full correct chain (sub=4)", full_of)


def cast_of(im):
    return im.astype(jnp.float32).sum()


per_item("astype(f32) + full reduce", cast_of)


def hot_of(im):
    out = corrections.remove_hot_pixels(im)
    return out[0, 0, 0]


per_item("hot-pixel only", hot_of)


def zshift_of(im):
    out = corrections.z_shift_correct(im, median_subsample=4)
    return out[0, 0, 0]


per_item("z-shift only (sub=4)", zshift_of)


def zshift1_of(im):
    out = corrections.z_shift_correct(im)
    return out[0, 0, 0]


per_item("z-shift only (exact)", zshift1_of)


def med_of(im):
    l, g = counting_median_layers_and_global(im.astype(jnp.float32), subsample=4)
    return l.sum() + g


per_item("median search only (sub=4)", med_of)


def illum_of(im):
    out = im.astype(jnp.float32) / flat[0][None]
    return jnp.clip(out, 0, 65535)[0, 0, 0]


per_item("illum divide + clip", illum_of)
