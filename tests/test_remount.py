"""Re-mount alignment, RNA->DNA matching, relabelling, metadata loaders.

Behavior targets: correction_tools/alignment.py:7-77 (align_manual_points),
spot_tools/translating.py:95-149, spot_tools/matching.py:6-88,
spot_tools/relabelling.py:6-31, get_img_info.py:526-631.
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.ops import matching as MT
from imageanalysis3_tpu.io.color_usage import (load_encoding_scheme,
                                               load_region_positions)


def test_rigid_transform_roundtrip():
    rng = np.random.default_rng(0)
    before = rng.uniform(0, 1000, (10, 2))
    theta = 0.3
    r_true = np.array([[np.cos(theta), np.sin(theta)],
                       [-np.sin(theta), np.cos(theta)]])
    t_true = np.array([12.0, -30.0])
    after = before @ r_true + t_true
    r, t = MT.rigid_transform_from_points(before, after)
    np.testing.assert_allclose(before @ r + t, after, atol=1e-8)
    np.testing.assert_allclose(r, r_true, atol=1e-8)


def test_rigid_transform_3d_random_motion():
    """Kabsch form must recover an arbitrary 3D rigid motion (the
    pre-fix (Vt U.T).T form failed with ~500-unit reconstruction
    error on exactly this case)."""
    rng = np.random.default_rng(5)
    before = rng.uniform(0, 1000, (12, 3))
    # random proper rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    t_true = np.array([40.0, -15.0, 88.0])
    after = before @ q + t_true
    r, t = MT.rigid_transform_from_points(before, after)
    np.testing.assert_allclose(before @ r + t, after, atol=1e-8)
    assert np.linalg.det(r) > 0.999


def test_align_manual_points_files(tmp_path):
    rng = np.random.default_rng(1)
    before = rng.uniform(0, 500, (6, 2))
    after = before + np.array([5.0, -7.0])
    np.savetxt(tmp_path / "before.txt", before, delimiter=",")
    np.savetxt(tmp_path / "after.txt", after, delimiter=",")
    r, t = MT.align_manual_points(str(tmp_path / "before.txt"),
                                  str(tmp_path / "after.txt"))
    np.testing.assert_allclose(r, np.eye(2), atol=1e-8)
    np.testing.assert_allclose(t, [5.0, -7.0], atol=1e-8)


def test_translate_spot_coordinates():
    spots = np.zeros((2, 11), np.float32)
    spots[0, 1:4] = [3.0, 10.0, 0.0]
    spots[1, 1:4] = [1.0, 0.0, 10.0]
    center = jnp.asarray([0.0, 0.0])
    rot90 = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])   # (x,y) -> (y, -x)... row@R
    out = np.asarray(MT.translate_spot_coordinates(
        jnp.asarray(spots), rot90, center, jnp.asarray([1.0, 0.0, 0.0])))
    # [10, 0] @ R = [0, 10]; z += 1
    np.testing.assert_allclose(out[0, 1:4], [4.0, 0.0, 10.0], atol=1e-5)
    np.testing.assert_allclose(out[1, 1:4], [2.0, -10.0, 0.0], atol=1e-5)


def test_select_matched_spots():
    cand = np.zeros((3, 11))
    cand[:, 0] = [100.0, 500.0, 900.0]
    cand[:, 1:4] = [[5, 10, 10], [5, 10.5, 10.5], [5, 40, 40]]
    row, found = MT.select_matched_spots(cand, [5, 10, 10], dist_th_nm=300)
    assert found and row[0] == 500.0       # brightest within threshold
    row2, found2 = MT.select_matched_spots(cand, [5, 80, 80],
                                           dist_th_nm=300)
    assert not found2 and np.isnan(row2[1])


def test_generate_recombined_spots():
    orig = [np.full((2, 11), i, float) for i in range(3)]
    repeat = [np.full((4, 11), 99.0)]
    out = MT.generate_recombined_spots(repeat, [1], orig, [0, 1, 2])
    assert out[1].shape == (4, 11) and (out[1] == 99.0).all()
    assert (out[0] == 0).all() and (out[2] == 2).all()


def test_load_encoding_scheme_and_positions(tmp_path):
    with open(tmp_path / "Encoding_Scheme.csv", "w") as fh:
        fh.write("Hyb,750,647\n")
        fh.write("num_hyb,3,\n")
        fh.write("num_reg,6,\n")
        fh.write("H1R1,1,2\n")
        fh.write("H2R2,3,\n")
    scheme, info = load_encoding_scheme(str(tmp_path))
    assert info == {"num_hyb": 3, "num_reg": 6}
    assert scheme["H1R1"] == [1, 2]
    assert scheme["H2R2"] == [3, -1]

    with open(tmp_path / "Region_Positions.csv", "w") as fh:
        fh.write("region,chr,start,end\n")
        fh.write("1,chr21,1000,2000\n")
        fh.write("2,chr21,3000,4000\n")
    pos = load_region_positions(str(tmp_path))
    assert pos[1]["chr"] == "chr21" and pos[2]["start"] == 3000.0
