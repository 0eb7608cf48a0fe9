"""Decompose seeding cost on the TPU (scratch)."""
import time
from functools import partial
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from imageanalysis3_tpu.ops.seeding import _level_diff_hist

    rng = np.random.default_rng(0)
    shape = (60, 2048, 2048)
    raw = (rng.integers(0, 3000, size=shape).astype(np.uint16))

    def t(name, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])   # force full round trip
        ts = []
        for k in range(2):
            a2 = jnp.asarray(raw + np.uint16(k + 1)).astype(jnp.float32)
            jax.block_until_ready(a2)
            t0 = time.perf_counter()
            out = fn(a2, *args[1:])
            np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts):.3f}s", flush=True)
        return out

    im = jnp.asarray(raw).astype(jnp.float32)

    slab, halo = 256, 33

    @jax.jit
    def level_only(imf):
        n_slab = shape[1] // slab
        padded = jnp.pad(imf, ((0, 0), (halo, halo), (0, 0)),
                         mode="symmetric")

        def one(i):
            tile = jax.lax.dynamic_slice(
                padded, (0, i * slab, 0), (shape[0], slab + 2 * halo,
                                           shape[2]))
            return _level_diff_hist(tile, 300.0, i * slab, slab, shape,
                                    0.75, 7.5, 3, 2, 10)

        lvl, diff, hists = jax.lax.map(one, jnp.arange(n_slab))
        return lvl.sum(), diff.sum(), hists.sum()

    t("level+diff+hist (8 slabs)", level_only, im)

    from imageanalysis3_tpu.ops.filters import gaussian_filter

    @jax.jit
    def blur_small(imf):
        return gaussian_filter(imf, 0.75).sum()

    @jax.jit
    def blur_big(imf):
        return gaussian_filter(imf, 7.5).sum()

    t("gaussian(0.75) full image", blur_small, im)
    t("gaussian(7.5) full image", blur_big, im)

    from imageanalysis3_tpu.ops.filters import maximum_filter

    @jax.jit
    def maxf(imf):
        return maximum_filter(imf, 3).sum()

    t("max_filter(3) full image", maxf, im)

    @jax.jit
    def bcount(imf):
        lvl = jnp.clip(imf, 0, 10).astype(jnp.int32)
        return jnp.bincount(lvl.ravel(), length=11)

    t("bincount(11) full image", bcount, im)

    @jax.jit
    def csum(imf):
        sel = imf > 2000
        zc, xc, yc = jnp.nonzero(sel, size=16384, fill_value=-1)
        return zc.sum() + xc.sum() + yc.sum()

    t("nonzero(size=16k) full image", csum, im)


if __name__ == "__main__":
    main()
