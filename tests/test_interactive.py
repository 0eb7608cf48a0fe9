"""Interactive curation tools driven headlessly (Agg backend).

Behavior targets: reference visual_tools.py:510-905 (imshow_mark_3d_v2)
and domain_tools/manual.py:13-233 (mark_boundaries).  Events are
synthesized through matplotlib's real event pipeline where wiring
matters, and the programmatic core methods are exercised directly.
"""

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg", force=True)
from matplotlib.backend_bases import MouseEvent, MouseButton

from imageanalysis3_tpu import synthetic as syn
from imageanalysis3_tpu.figures import SpotBrowser, BoundaryMarker


def _spot_stack(shape=(8, 48, 48), centers=None):
    if centers is None:
        centers = np.array([[4.0, 15.0, 20.0], [4.0, 33.0, 30.0]])
    heights = np.full(len(centers), 4000.0)
    sigmas = np.tile([1.5, 1.6, 1.6], (len(centers), 1))
    im = syn.render_gaussian_spots(shape, centers, heights, sigmas,
                                   background=120.0)
    return np.asarray(im, np.float32), centers


def _right_click(browser, ax, xdata, ydata):
    """Dispatch a genuine right-click through the canvas pipeline."""
    px, py = ax.transData.transform((xdata, ydata))
    MouseEvent("button_press_event", browser.fig.canvas, px, py,
               button=MouseButton.RIGHT)._process()


# ---------------------------------------------------------------------------
# SpotBrowser
# ---------------------------------------------------------------------------


def test_spot_browser_click_add_and_delete():
    im, _ = _spot_stack()
    b = SpotBrowser([im, im * 0.5])
    b.fig.canvas.draw()                       # realize transforms
    _right_click(b, b.ax_xy, 20.0, 15.0)      # xdata=col(y), ydata=row(x)
    assert len(b.points) == 1
    z, x, y = b.points[0]
    assert abs(x - 15.0) < 1e-6 and abs(y - 20.0) < 1e-6
    assert 0 <= z <= im.shape[0]
    # z reassignment via the z panel: xdata=y, ydata=z
    b.on_click(type("E", (), {"button": 3, "inaxes": b.ax_z,
                              "xdata": 20.0, "ydata": 6.0})())
    assert abs(b.points[0, 0] - 6.0) < 1e-6
    # shift arms delete mode; right-click removes the nearest point
    b.on_key(type("E", (), {"key": "shift"})())
    assert b.delete_mode
    _right_click(b, b.ax_xy, 20.0, 15.0)
    assert len(b.points) == 0
    b.on_key_release(type("E", (), {"key": "shift"})())
    assert not b.delete_mode


def test_spot_browser_image_cycling_scopes_points():
    im, _ = _spot_stack()
    b = SpotBrowser([im, im])
    b.add_point(4, 10, 10)                    # image 0
    b.on_key(type("E", (), {"key": "d"})())   # -> image 1
    assert b.index_im == 1
    b.add_point(4, 20, 20)
    assert len(b.image_points(0)) == 1 and len(b.image_points(1)) == 1
    # marks shown are only the current image's
    assert len(b._marks_xy.get_xdata()) == 1
    b.on_key(type("E", (), {"key": "a"})())   # back to image 0
    assert b.index_im == 0


def test_spot_browser_seed_and_fit_recover_planted_spots():
    im, centers = _spot_stack()
    b = SpotBrowser([im], seed_kwargs=dict(max_num_seeds=8, th_seed=500.0,
                                           use_dynamic_th=False))
    seeds = b.seed_view()
    assert len(seeds) == 2
    rows = b.fit_view(radius=5)
    assert rows.shape[1] == 11
    got = rows[:, 1:4]
    for c in centers:
        err = np.abs(got - c).sum(axis=1).min()
        assert err < 0.2, (got, c)
    # fitted rows are retained per image
    assert 0 in b.fits and len(b.fits[0]) == len(rows)


def test_spot_browser_autoscale_and_persistence(tmp_path):
    im, _ = _spot_stack()
    path = str(tmp_path / "picks.npz")
    b = SpotBrowser([im], save_file=path)
    b.add_point(4, 15, 20)
    lo, hi = b.autoscale()
    assert lo < hi
    b.fits[0] = np.zeros((1, 11), np.float32)
    b.save()
    b2 = SpotBrowser([im], save_file=path)
    assert len(b2.points) == 1
    assert np.allclose(b2.points[0], [4, 15, 20])
    assert 0 in b2.fits


# ---------------------------------------------------------------------------
# BoundaryMarker
# ---------------------------------------------------------------------------


def test_boundary_marker_click_records_diagonal_position():
    maps = [np.random.default_rng(0).uniform(0, 900, (40, 40))
            for _ in range(2)]
    m = BoundaryMarker(maps)
    m.fig.canvas.draw()
    px, py = m.ax.transData.transform((10.0, 14.0))
    MouseEvent("button_press_event", m.fig.canvas, px, py,
               button=MouseButton.RIGHT)._process()
    assert len(m.positions) == 1
    assert abs(m.positions[0] - 12.0) < 1e-6   # (10 + 14) / 2
    # staircase: 0 -> b -> n steps
    xs, ys = m.staircase()
    assert xs[0] == 0 and xs[-1] == 40
    assert np.isclose(xs, 12.0, atol=1e-5).any()
    assert np.isclose(ys, 12.0, atol=1e-5).any()


def test_boundary_marker_domain_starts_and_delete():
    maps = [np.zeros((30, 30))]
    m = BoundaryMarker(maps)
    m.add_boundary(9.6, 10.0)                  # 9.8 -> rounds to 10
    m.add_boundary(20.0, 20.0)
    assert list(m.domain_starts()) == [0, 10, 20]
    m.delete_nearest(20.0, 20.0)
    assert list(m.domain_starts()) == [0, 10]
    m.pop_boundary()
    assert list(m.domain_starts()) == [0]


def test_boundary_marker_navigation_contrast_persistence(tmp_path):
    maps = [np.full((20, 20), float(i)) for i in range(25)]
    path = str(tmp_path / "bounds.npz")
    m = BoundaryMarker(maps, save_file=path)
    m.on_key(type("E", (), {"key": "e"})())    # +20
    assert m.index_im == 20
    m.on_key(type("E", (), {"key": "w"})())    # -20
    assert m.index_im == 0
    m.add_boundary(5.0, 5.0)
    m.on_key(type("E", (), {"key": "d"})())
    m.add_boundary(7.0, 9.0)                   # map 1
    assert len(m.boundaries(0)) == 1 and len(m.boundaries(1)) == 1
    m.scale(1.1)
    lo, hi = m._clim_memory[1]
    m2 = BoundaryMarker(maps, save_file=path)
    assert len(m2.boundaries(0)) == 1 and len(m2.boundaries(1)) == 1


def test_boundary_marker_autoscale_percentile():
    rng = np.random.default_rng(3)
    mp = rng.uniform(0, 1000, (50, 50))
    mp[0, 0] = np.nan
    m = BoundaryMarker([mp], scale_percentile=90.0)
    lo, hi = m.autoscale()
    vals = mp[np.isfinite(mp)]
    assert abs(lo - np.percentile(vals, 10.0)) < 1e-9
    assert abs(hi - np.percentile(vals, 90.0)) < 1e-9


def test_spot_browser_mutations_persist_without_explicit_save(tmp_path):
    # every mutation must hit disk immediately (crash-safe curation),
    # and non-mutating redraws must not be the thing that saves
    im, _ = _spot_stack()
    path = str(tmp_path / "picks.npz")
    b = SpotBrowser([im], save_file=path)
    b.add_point(4, 15, 20)
    assert len(SpotBrowser([im], save_file=path).points) == 1
    b.pop_point()
    assert len(SpotBrowser([im], save_file=path).points) == 0


def test_spot_browser_view_resets_on_image_size_change():
    im, _ = _spot_stack()                       # (8, 48, 48)
    b = SpotBrowser([im, im[:, :24, :24]])
    b.set_image(1)
    assert b.ax_xy.get_xlim() == (-0.5, 23.5)
    b.set_image(0)
    assert b.ax_xy.get_xlim() == (-0.5, 47.5)


def test_boundary_marker_npz_loads_without_pickle(tmp_path):
    path = str(tmp_path / "bnd.npz")
    m = BoundaryMarker([np.eye(20)], names=["chr1"], save_file=path)
    m.add_boundary(4.2, 4.8)
    data = np.load(path)                        # allow_pickle defaults False
    assert list(data["positions"]) == [4.5]
    assert str(data["names"][0]) == "chr1"
