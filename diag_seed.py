"""Seeding + fit timing on the real TPU (scratch diagnostic)."""
import time
import numpy as np

def log(m):
    print(m, flush=True)

def main():
    import jax
    import jax.numpy as jnp
    from imageanalysis3_tpu.ops.seeding import get_seeds
    from imageanalysis3_tpu.ops.gaussian_fit import iter_fit_seed_points

    rng = np.random.default_rng(0)
    shape = (60, 2048, 2048)
    raw = rng.integers(0, 3000, size=shape).astype(np.uint16)
    im = jnp.asarray(raw)
    jax.block_until_ready(im)
    log("uploaded")

    t0 = time.perf_counter()
    s = get_seeds(im, max_num_seeds=2048, th_seed=300.0, cand_capacity=16384)
    jax.block_until_ready(s)
    log(f"seeding compile+run: {time.perf_counter()-t0:.2f}s")
    for _ in range(2):
        im2 = jnp.asarray(raw + np.uint16(1))
        jax.block_until_ready(im2)
        t0 = time.perf_counter()
        s = get_seeds(im2, max_num_seeds=2048, th_seed=300.0,
                      cand_capacity=16384)
        jax.block_until_ready(s)
        log(f"seeding run: {time.perf_counter()-t0:.3f}s count={int(s.count)}")

    seeds_zxy = s.coords.astype(jnp.float32)
    t0 = time.perf_counter()
    f = iter_fit_seed_points(im, seeds_zxy, s.valid)
    jax.block_until_ready(f)
    log(f"fit compile+run: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    f = iter_fit_seed_points(im2, seeds_zxy, s.valid)
    jax.block_until_ready(f)
    log(f"fit run: {time.perf_counter()-t0:.3f}s")

if __name__ == "__main__":
    main()
