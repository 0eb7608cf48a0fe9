"""End-to-end slice: multi-round synthetic FOV -> corrections -> drift ->
fit -> picked trace -> distance map, single-device and on an 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from imageanalysis3_tpu.config import ExperimentConfig, SeedConfig, FitConfig
from imageanalysis3_tpu.pipeline import FovPipeline
from imageanalysis3_tpu.parallel import make_mesh
from imageanalysis3_tpu.decode import naive_pick_spots
from imageanalysis3_tpu.analysis import distance_map
from imageanalysis3_tpu import synthetic as syn


SHAPE = (12, 128, 128)


@pytest.fixture(scope="module")
def fov():
    return syn.make_synthetic_fov(shape=SHAPE, n_rounds=4, n_channels=2,
                                  n_spots=12, seed=42, drift_scale=2.5,
                                  apply_illumination=True, noise=True)


@pytest.fixture(scope="module")
def small_cfg():
    return ExperimentConfig(
        image_size=SHAPE,
        seed=SeedConfig(th_seed=200.0, max_num_seeds=32, cand_capacity=512),
        fit=FitConfig(lm_iters=20, n_max_iter=5),
    )


@pytest.fixture(scope="module")
def pipe(small_cfg, fov):
    return FovPipeline(small_cfg, n_channels=2, drift_channel_index=1,
                       fit_channel_indices=(0,),
                       illumination=fov.illumination,
                       image_shape=SHAPE)


def test_single_round_recovers_truth(pipe, fov):
    ref_im = pipe.correct_reference(fov.ims[0])
    res = pipe.process_round(fov.ims[1], ref_im)
    # drift recovered: content shifted by +d means phase corr returns -d;
    # spot coords then get 'coords + drift' restoring round-0 frame
    got_drift = np.asarray(res.drift)
    np.testing.assert_allclose(got_drift, -fov.drifts[1], atol=0.15)
    # corrected spot coords should match ROUND-0 spot positions
    truth0 = [t for t in fov.truth if t["round"] == 0 and t["channel"] == 0][0]
    spots = np.asarray(res.spots[0])
    valid = np.asarray(res.valid[0])
    got = spots[valid][:, 1:4]
    matched = 0
    for c in truth0["centers"]:
        d = np.linalg.norm(got - c, axis=1).min()
        if d < 0.3:
            matched += 1
    assert matched >= len(truth0["centers"]) - 2


def test_multi_round_traces_and_distmap(pipe, fov):
    ref_im = pipe.correct_reference(fov.ims[0])
    res = pipe.process_rounds(fov.ims, ref_im)
    spots = np.asarray(res.spots)       # (R, C, N, 11)
    valid = np.asarray(res.valid)
    assert spots.shape[:2] == (4, 1)
    # build per-round candidate tables for channel 0, pick brightest
    cands = jnp.asarray(spots[:, 0])
    cvalid = jnp.asarray(valid[:, 0])
    trace, picked = naive_pick_spots(cands, cvalid, use_center_dist=False)
    assert bool(np.asarray(picked).all())
    # all rounds should pick (roughly) the same brightest spot at the same
    # corrected position -> tiny pairwise distances
    zxy = np.asarray(trace)[:, 1:4]
    dm = np.asarray(distance_map(jnp.asarray(zxy)))
    off_diag = dm[~np.eye(4, dtype=bool)]
    assert off_diag.max() < 1.0, dm


def test_sharded_matches_single_device(pipe, fov):
    """Same program on 1 device vs 8-device mesh: identical results."""
    assert len(jax.devices()) >= 8
    ref_im = pipe.correct_reference(fov.ims[0])
    res1 = pipe.process_rounds(fov.ims, ref_im)
    mesh = make_mesh(8)
    res8 = pipe.process_rounds(fov.ims, ref_im, mesh=mesh)
    np.testing.assert_allclose(np.asarray(res1.drift),
                               np.asarray(res8.drift), atol=1e-4)
    s1, s8 = np.asarray(res1.spots), np.asarray(res8.spots)
    v1, v8 = np.asarray(res1.valid), np.asarray(res8.valid)
    np.testing.assert_array_equal(v1, v8)
    np.testing.assert_allclose(s1[v1], s8[v8], rtol=1e-3, atol=1e-3)
