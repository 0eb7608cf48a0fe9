"""Figure rendering smoke tests (headless Agg): files are produced and
contain sane pixel content (reference figure_tools/)."""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu import figures as FG
from imageanalysis3_tpu.decode.merfish import SpotGroups


def test_plot_distance_map_and_boundaries(tmp_path):
    rng = np.random.default_rng(0)
    dm = rng.uniform(100, 1200, (30, 30))
    dm = (dm + dm.T) / 2
    np.fill_diagonal(dm, 0)
    p1 = str(tmp_path / "dm.png")
    ax = FG.plot_distance_map(dm, save_path=p1)
    assert ax is not None
    p2 = str(tmp_path / "bd.png")
    FG.plot_boundaries(dm, [0, 10, 20], save_path=p2)
    import os
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_plot_projection_with_spots(tmp_path):
    rng = np.random.default_rng(1)
    im = rng.uniform(0, 100, (8, 32, 32))
    spots = np.zeros((3, 11))
    spots[:, 1:4] = [[4, 10, 10], [4, 20, 5], [4, 15, 25]]
    p = str(tmp_path / "proj.png")
    FG.plot_spot_overlay(im, spots, valid=np.array([True, True, False]),
                         save_path=p)
    import os
    assert os.path.getsize(p) > 1000


def test_plot_decode_stats_and_labels(tmp_path):
    groups = SpotGroups(
        spot_idx=jnp.asarray(np.array([[0, 1, -1], [2, 3, 4]], np.int32)),
        region=jnp.asarray(np.array([101, 102], np.int32)),
        n_spots=jnp.asarray(np.array([2, 3], np.int32)),
        ok=jnp.asarray(np.array([True, True])),
        spot_usage=jnp.zeros(5, jnp.int32))
    p = str(tmp_path / "decode.png")
    FG.plot_decode_stats(groups, save_path=p)
    labels = np.zeros((4, 16, 16), np.int32)
    labels[:, 2:8, 2:8] = 1
    labels[:, 9:14, 9:14] = 2
    p2 = str(tmp_path / "seg.png")
    FG.plot_segmentation_labels(labels, save_path=p2)
    import os
    assert os.path.getsize(p) > 1000 and os.path.getsize(p2) > 1000
