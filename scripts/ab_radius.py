"""Accuracy + time vs fit-ball radius (and LM einsum precision) on the
bench scene with planted truth.  Radius sets P (in-ball pixels): r=5 ->
515, r=4 -> 257; round-0 LM cost is ~linear in P."""
import sys
import time, os
import jax, jax.numpy as jnp, numpy as np

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.ops import gaussian_fit as gf
from imageanalysis3_tpu.ops import seeding

SHAPE = (60, 2048, 2048)
N_SPOTS = 1800
K = 3
BASE = int.from_bytes(os.urandom(2), 'big')

rng = np.random.default_rng(0)
truth = syn.sample_spot_params(SHAPE, N_SPOTS, rng, min_separation=8.0,
                               height_range=(400.0, 3000.0), sigma_jitter=0.0)
centers_true = np.asarray(truth["centers"])


def stacked(k0):
    base = syn.render_spots_device(SHAPE, truth["centers"], truth["heights"],
                                   background=truth["background"])
    vs = jnp.stack([syn.noisy_uint16_device(base, seed=BASE + k0 + k)
                    for k in range(K)])
    return jax.block_until_ready(vs)


def per_item(label, fn, tag):
    f1 = jax.jit(lambda xs: jax.lax.map(fn, xs))
    sync = lambda o: jax.tree_util.tree_map(np.asarray, o)
    vK = stacked(tag * 1000 + 100)
    sync(f1(vK[:1])); sync(f1(vK))
    del vK
    vK2 = stacked(tag * 1000 + 200)
    t0 = time.perf_counter(); sync(f1(vK2[K - 1:])); t1 = time.perf_counter()
    t2 = time.perf_counter(); out = sync(f1(vK2)); t3 = time.perf_counter()
    del vK2
    per = ((t3 - t2) - (t1 - t0)) / (K - 1)
    print(f"{label:46s} {1e3 * per:8.2f} ms/item", flush=True)
    return out


print("device:", jax.devices()[0], flush=True)


def fit_of(im, radius):
    imf = im.astype(jnp.float32)
    sd = seeding.get_seeds(imf, max_num_seeds=2048)
    res = gf.iter_fit_seed_points(imf, sd.coords.astype(jnp.float32),
                                  sd.valid, radius=radius,
                                  lm_iters=12, n_max_iter=6)
    return res.spots, res.valid


for tag, r in enumerate([int(a) for a in sys.argv[1:]] or (5, 4, 3)):
    spots, valid = per_item(f"seed+iter_fit radius={r}",
                            lambda im, r=r: fit_of(im, r), tag + 1)
    sp = spots[0][np.asarray(valid[0])]
    cent = sp[:, 1:4]
    d = np.linalg.norm(cent[:, None] - centers_true[None], axis=2)
    err = d.min(1)
    print(f"    n={len(cent)} median err {np.median(err):.4f} px  "
          f"p95 {np.percentile(err, 95):.4f}", flush=True)
