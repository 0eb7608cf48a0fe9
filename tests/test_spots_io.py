"""Spot-table interchange round trips (reference io_tools/spots.py)."""

import numpy as np
import pandas as pd
import jax.numpy as jnp

from imageanalysis3_tpu.io import spots as SIO
from imageanalysis3_tpu.decode.merfish import SpotGroups


def _spots(n, rng):
    s = rng.uniform(0, 100, (n, 11)).astype(np.float32)
    return s


def test_spots_dataframe_roundtrip():
    rng = np.random.default_rng(0)
    spots = _spots(8, rng)
    bits = np.arange(1, 9)
    channels = ["750"] * 4 + ["647"] * 4
    valid = np.ones(8, bool)
    valid[5] = False
    df = SIO.spots_to_dataframe(spots, bits, channels, valid=valid,
                                fov_id=3, cell_id=7)
    assert len(df) == 7
    assert set(SIO.SPOT3D_COLUMNS) <= set(df.columns)
    back, bbits, bch, px = SIO.dataframe_to_cand_spots(df)
    np.testing.assert_allclose(back, spots[valid], rtol=1e-6)
    np.testing.assert_array_equal(bbits, bits[valid])
    assert list(bch) == [c for c, v in zip(channels, valid) if v]
    np.testing.assert_allclose(px, [200.0, 108.0, 108.0])


def test_spot_groups_dataframe_roundtrip():
    rng = np.random.default_rng(1)
    spots = _spots(12, rng)
    bits = rng.integers(0, 16, 12)
    groups = SpotGroups(
        spot_idx=jnp.asarray(np.array([[0, 1, 2, -1], [3, 4, -1, -1],
                                       [-1, -1, -1, -1]], np.int32)),
        region=jnp.asarray(np.array([101, 102, -1], np.int32)),
        n_spots=jnp.asarray(np.array([3, 2, 0], np.int32)),
        ok=jnp.asarray(np.array([True, True, False])),
        spot_usage=jnp.zeros(12, jnp.int32))
    df = SIO.spot_groups_to_dataframe(groups, spots, bits, fov_id=1,
                                      cell_id=2)
    assert len(df) == 5
    assert set(df["region_id"]) == {101, 102}
    back = SIO.dataframe_to_spot_groups(df, capacity=4)
    bidx = np.asarray(back.spot_idx)
    assert list(bidx[0][bidx[0] >= 0]) == [0, 1, 2]
    assert list(bidx[1][bidx[1] >= 0]) == [3, 4]
    assert list(np.asarray(back.region)) == [101, 102]


def test_hdf5_dataframe_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    df = SIO.spots_to_dataframe(_spots(5, rng), np.arange(5),
                                ["647"] * 5, fov_id=0, cell_id=1)
    path = str(tmp_path / "spots.h5")
    SIO.save_dataframe_hdf5(df, path, "cand_spots")
    back = SIO.load_dataframe_hdf5(path, "cand_spots")
    assert list(back.columns) == list(df.columns)
    np.testing.assert_allclose(back[SIO.SPOT3D_COLUMNS].to_numpy(float),
                               df[SIO.SPOT3D_COLUMNS].to_numpy(float),
                               rtol=1e-6)
    assert list(back["channel"]) == ["647"] * 5
