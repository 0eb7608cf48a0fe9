"""Decompose fit cost on the TPU (scratch)."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.ops.seeding import get_seeds
    from imageanalysis3_tpu.ops.gaussian_fit import iter_fit_seed_points

    rng = np.random.default_rng(0)
    shape = (60, 2048, 2048)
    im, truth = syn.random_spot_field(shape, 1800, rng, min_separation=8.0,
                                      height_range=(400.0, 3000.0))
    raw = syn.poisson_camera_noise(im, rng).astype(np.uint16)
    del im

    imd = jnp.asarray(raw).astype(jnp.float32)
    s = get_seeds(imd, max_num_seeds=2048, th_seed=300.0)
    np.asarray(s.count)
    print("seeds:", int(s.count), flush=True)
    seeds_zxy = s.coords.astype(jnp.float32)

    def t(name, fn):
        out = fn(imd)
        np.asarray(jax.tree.leaves(out)[0])
        ts = []
        for k in range(2):
            im2 = jnp.asarray(raw + np.uint16(k + 1)).astype(jnp.float32)
            jax.block_until_ready(im2)
            t0 = time.perf_counter()
            out = fn(im2)
            np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts):.3f}s", flush=True)

    t("seeding", lambda x: get_seeds(x, max_num_seeds=2048, th_seed=300.0))
    for li, ri in [(30, 10), (15, 5)]:
        t(f"iter_fit lm={li} rounds={ri}",
          lambda x, li=li, ri=ri: iter_fit_seed_points(
              x, seeds_zxy, s.valid, lm_iters=li, n_max_iter=ri))
    t("iter_fit rounds=0 (firstfit only)",
      lambda x: iter_fit_seed_points(x, seeds_zxy, s.valid, lm_iters=30,
                                     n_max_iter=0))


if __name__ == "__main__":
    main()
