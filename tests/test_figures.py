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


def _polymer_spots(n=40, seed=0, missing=(7, 8, 21)):
    rng = np.random.default_rng(seed)
    zxy = np.cumsum(rng.normal(0, 120, (n, 3)), axis=0)
    zxy -= zxy.mean(0)
    spots = np.column_stack([rng.uniform(500, 2000, n), zxy / 108.0])
    spots[list(missing)] = np.nan
    return spots


def test_normalize_center_spots_pca():
    spots = _polymer_spots()
    out = FG.normalize_center_spots(spots, pca_align=True)
    valid = ~np.isnan(out).any(1)
    # centered
    np.testing.assert_allclose(np.nanmean(out[valid], 0), 0, atol=1e-6)
    # PCA-aligned: covariance is diagonal with descending variance
    cov = np.cov(out[valid].T)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6 * np.diag(cov).max()
    d = np.diag(cov)
    assert d[0] >= d[1] >= d[2]
    # NaN rows preserved
    assert np.isnan(out[7]).all()


def test_chromosome_3d_rendering_smoke(tmp_path):
    import os
    import matplotlib.pyplot as plt
    spots = _polymer_spots()
    p = str(tmp_path / "trace3d.png")
    ax, cb = FG.chromosome_structure_3d_rendering(
        spots, image_radius=1500.0, save_path=p)
    assert os.path.getsize(p) > 1000
    # the trace must actually be rendered: a real image has thousands of
    # colored (non-black, non-white) pixels; a collapsed/empty rendering
    # (e.g. wrong unit scaling) has almost none beyond the colorbar
    img = plt.imread(p)[..., :3]
    colored = ((img.max(-1) - img.min(-1)) > 0.08).sum()
    assert colored > 4000, f"only {colored} colored pixels rendered"
    # domain-colored variant via explicit colors
    colors = np.tile([[1.0, 0, 0], [0, 0, 1.0]], (20, 1))[:40]
    p2 = str(tmp_path / "trace3d_dom.png")
    FG.chromosome_structure_3d_rendering(
        spots, colors=colors, add_colorbar=False, save_path=p2)
    assert os.path.getsize(p2) > 1000


def test_chromosome_3d_cloud(tmp_path):
    import os
    rng = np.random.default_rng(3)
    # two well-separated compartments
    a = rng.normal([-800, -800, 0], 150, (25, 3))
    b = rng.normal([800, 800, 0], 150, (25, 3))
    zxy = np.concatenate([a, b])
    comp = {"A": np.arange(25), "B": np.arange(25, 50)}
    p = str(tmp_path / "cloud.png")
    ax, den = FG.visualize_chromosome_3d_cloud(
        zxy, comp, im_radius=16, voxel_nm=150.0, center=False,
        save_path=p, return_density=True)
    assert os.path.getsize(p) > 1000
    # each compartment's density peaks on its own side
    ca = np.unravel_index(np.argmax(den["A"]), den["A"].shape)
    cb_ = np.unravel_index(np.argmax(den["B"]), den["B"].shape)
    assert ca[1] < 16 <= cb_[1]


def test_plot_cell_spot_counts(tmp_path):
    import os
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 80, (12, 16))
    p = str(tmp_path / "partition.png")
    FG.plot_cell_spot_counts(counts, expected_count=60, save_path=p)
    assert os.path.getsize(p) > 1000


def test_colormap_helpers():
    import matplotlib.pyplot as plt
    # transparent_cmap: new object, alpha ramp, source untouched
    src = plt.get_cmap("viridis")
    t = FG.transparent_cmap(src, N=64, max_alpha=0.8)
    assert t is not src
    cols = t(np.linspace(0, 1, 64))
    assert cols[0, 3] < 1e-6 and abs(cols[-1, 3] - 0.8) < 0.02
    assert src(1.0)[3] == 1.0
    # black_gradient: starts at black, ends at the color
    g = FG.black_gradient((1.0, 0.5, 0.0))
    assert np.allclose(g(0.0)[:3], 0, atol=0.01)
    assert np.allclose(g(1.0)[:3], (1.0, 0.5, 0.0), atol=0.01)
    # transparent_gradient: constant color, ramped alpha
    tg = FG.transparent_gradient((0.2, 0.4, 0.9))
    assert np.allclose(tg(0.3)[:3], (0.2, 0.4, 0.9), atol=0.01)
    assert tg(0.0)[3] < tg(1.0)[3]
    # white->primary ramps
    assert np.allclose(FG.myReds(1.0), (1, 0, 0, 1), atol=0.01)
    assert np.allclose(FG.myReds_r(0.0), (1, 0, 0, 1), atol=0.01)


def test_normalize_color_clips_and_scales():
    m = np.array([[0.0, 5.0], [10.0, np.nan]])
    out = FG.normalize_color(m, vmin=2.0, vmax=8.0)
    assert out[0, 0] == 0.0 and out[1, 0] == 1.0
    assert abs(out[0, 1] - 0.5) < 1e-9
    assert np.isnan(out[1, 1])


def test_remove_cap_and_spot_crops(tmp_path):
    """Display cap + fitted-spot QC panels (visual_tools.py:2615-2712,
    3317-3330)."""
    from imageanalysis3_tpu.figures import (remove_cap, extract_spot_crops,
                                            plot_spot_crops)
    rng = np.random.default_rng(11)
    im = rng.normal(100, 5, size=(12, 40, 40))
    im[3, 7, 9] = 10000.0
    capped = remove_cap(im, 99.5)
    assert np.isnan(capped[3, 7, 9])
    capped2 = remove_cap(im, 99.5, fill_nan=False)
    assert capped2[3, 7, 9] <= np.percentile(im, 99.6)

    centers = np.array([[5.2, 10.4, 20.1],
                        [1.0, 2.0, 38.0],       # clipped at borders
                        [np.nan, 3.0, 3.0]])    # dropped
    crops = extract_spot_crops(im, centers, radius=4)
    assert crops.shape == (2, 9, 9, 9)
    np.testing.assert_allclose(crops[0][4, 4, 4], im[5, 10, 20])
    # border crop: out-of-image voxels filled with the block median
    assert np.isfinite(crops[1]).all()

    fig = plot_spot_crops(im, centers, radius=4,
                          save_path=str(tmp_path / "crops.png"))
    assert (tmp_path / "crops.png").exists()
    import matplotlib.pyplot as plt
    plt.close(fig)
    assert plot_spot_crops(im, np.full((1, 3), np.nan)) is None
