"""Spatial sharding: one FOV across 8 virtual devices equals one device.

SURVEY §2.11's CP analog: halo exchange via ppermute, global stats via
psum, seed selection via all_gather — validated by bit-comparing against
the single-device correction + seeding path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imageanalysis3_tpu.parallel import make_mesh
from imageanalysis3_tpu.parallel.spatial import (halo_exchange,
                                                 sharded_correct_and_seed)
from imageanalysis3_tpu.ops.corrections import correct_channel_stack
from imageanalysis3_tpu.ops.seeding import get_seeds
from imageanalysis3_tpu import synthetic as syn

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_halo_exchange_matches_symmetric_pad():
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64, 8)).astype(np.float32)
    halo = 3

    @partial(shard_map, mesh=mesh, in_specs=P(None, "data", None),
             out_specs=P(None, "data", None))
    def prog(local):
        return halo_exchange(local, halo, "data")

    out = np.asarray(prog(jnp.asarray(x)))          # (4, 64 + 8*2*halo, 8)
    want = np.pad(x, ((0, 0), (halo, halo), (0, 0)), mode="symmetric")
    # shard 0's halo-extended tile must equal the globally padded slice
    tile0 = out[:, :8 + 2 * halo]
    np.testing.assert_allclose(tile0, want[:, :8 + 2 * halo], rtol=1e-6)
    # an interior shard (3): global columns [24-halo, 32+halo)
    tile3 = out[:, 3 * (8 + 2 * halo):4 * (8 + 2 * halo)]
    np.testing.assert_allclose(tile3, want[:, 24:32 + 2 * halo], rtol=1e-6)


def test_sharded_correct_and_seed_matches_single_device():
    rng = np.random.default_rng(1)
    shape = (10, 128, 64)
    im, truth = syn.random_spot_field(shape, 12, rng, min_separation=10.0,
                                      height_range=(800.0, 2500.0))
    prof = syn.illumination_profile(shape[1:])
    raw = syn.poisson_camera_noise(im * prof[None], rng).astype(np.uint16)

    mesh = make_mesh(8)
    corrected_sh, seeds_sh = sharded_correct_and_seed(
        jnp.asarray(raw), mesh, illumination=jnp.asarray(prof),
        th_seed=300.0, max_num_seeds=32, background_gfilt_size=3.0)

    corrected_1 = correct_channel_stack(
        jnp.asarray(raw)[None], illumination_profile=jnp.asarray(prof)[None],
        do_bleedthrough=False, do_highpass=False)[0]
    seeds_1 = get_seeds(corrected_1, max_num_seeds=32, th_seed=300.0,
                        background_gfilt_size=3.0)

    np.testing.assert_allclose(np.asarray(corrected_sh),
                               np.asarray(corrected_1), rtol=2e-5,
                               atol=0.25)
    got = {tuple(c) for c in np.asarray(seeds_sh.coords)[
        np.asarray(seeds_sh.valid)]}
    want = {tuple(c) for c in np.asarray(seeds_1.coords)[
        np.asarray(seeds_1.valid)]}
    assert got == want
    assert int(seeds_sh.count) == int(seeds_1.count)
