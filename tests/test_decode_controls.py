"""Invalid-pair negative controls, channel prep, coordinate intensities.

Behavior targets: reference classes/decode.py:641-691 (seeding groups,
unused spots, invalid pairs, group reference metrics), :1087-1117
(calculate_self_scores), :1314-1342 (generate_random_invalid_pairs),
:1832-1898 (channel normalization + chromatic recentering), and
classes/partition_spots.py:212-236 (find_coordinate_intensities).
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.decode import merfish as M
from imageanalysis3_tpu.analysis import partition as PT

RNG = np.random.default_rng


def _groups(spot_idx, n_spots_total):
    spot_idx = np.asarray(spot_idx, np.int32)
    p, t = spot_idx.shape
    ok = np.any(spot_idx >= 0, axis=1)
    usage = np.zeros(n_spots_total, np.int32)
    for row in spot_idx:
        for s in row:
            if s >= 0:
                usage[s] += 1
    return M.SpotGroups(
        spot_idx=jnp.asarray(spot_idx),
        region=jnp.asarray(np.where(ok, np.arange(p), -1), jnp.int32),
        n_spots=jnp.asarray((spot_idx >= 0).sum(1), jnp.int32),
        ok=jnp.asarray(ok),
        spot_usage=jnp.asarray(usage))


def test_seeding_and_unused_spots():
    # 6 spots; group0 uses {0,1}, group1 uses {1,2}, group2 uses {3,4}
    g = _groups([[0, 1], [1, 2], [3, 4]], 6)
    seed1 = np.asarray(M.find_seeding_groups(g, 1))
    # spot 1 is used twice -> groups 0 and 1 are not seeding at cap 1
    assert list(seed1) == [False, False, True]
    seed2 = np.asarray(M.find_seeding_groups(g, 2))
    assert list(seed2) == [True, True, True]
    unused = np.asarray(M.find_unused_spots(g, jnp.ones(6, bool)))
    assert list(unused) == [False, False, False, False, False, True]


def test_collect_invalid_pairs_nearest_unused():
    rng = RNG(0)
    pos = rng.uniform(0, 100, (20, 3)).astype(np.float32)
    unused = np.zeros(20, bool)
    unused[[2, 5, 9, 14]] = True
    i, j, ok = M.collect_invalid_pairs(jnp.asarray(pos),
                                       jnp.asarray(unused))
    i, j, ok = np.asarray(i), np.asarray(j), np.asarray(ok)
    assert np.array_equal(ok, unused)
    for a in np.flatnonzero(unused):
        others = [b for b in np.flatnonzero(unused) if b != a]
        want = others[int(np.argmin([np.linalg.norm(pos[a] - pos[b])
                                     for b in others]))]
        assert j[a] == want


def test_group_reference_metrics():
    spots = np.zeros((6, 11), np.float32)
    spots[:, 0] = [100, 200, 300, 400, 500, 600]
    pos = np.zeros((6, 3), np.float32)
    pos[:, 0] = [0, 1, 5, 8, 8.5, 20]
    g = _groups([[0, 1, -1], [2, 3, 4], [5, -1, -1]], 6)
    ints, dists, ok = M.group_reference_metrics(
        g, jnp.asarray(spots), jnp.asarray(pos))
    assert np.allclose(np.asarray(ints)[:2], [150.0, 400.0])
    assert abs(float(dists[0]) - 1.0) < 1e-5
    assert abs(float(dists[1]) - 0.5) < 1e-5       # min of (3, 3.5, 0.5)
    # single-spot group has no internal distance -> excluded
    assert list(np.asarray(ok)) == [True, True, False]


def test_tuple_self_scores_separate_true_from_noise():
    """Tight bright pairs (valid) vs spread dim invalid pairs: with the
    invalid-pair control, every valid group outscores the control-free
    ranking spread (reference calculate_self_scores log-odds)."""
    rng = RNG(1)
    n_groups = 40
    spots = np.zeros((2 * n_groups, 11), np.float32)
    pos = rng.uniform(0, 5000, (2 * n_groups, 3)).astype(np.float32)
    rows = []
    for k in range(n_groups):
        a, b = 2 * k, 2 * k + 1
        pos[b] = pos[a] + rng.normal(0, 80, 3)      # tight pair (nm)
        spots[a, 0] = spots[b, 0] = rng.uniform(800, 1500)
        rows.append([a, b])
    g = _groups(rows, 2 * n_groups)
    # invalid controls: random far-apart dim pairs
    inv_i = jnp.asarray(rng.integers(0, 2 * n_groups, 100), jnp.int32)
    inv_j = jnp.asarray(rng.integers(0, 2 * n_groups, 100), jnp.int32)
    inv_ok = jnp.asarray(np.asarray(inv_i) != np.asarray(inv_j))
    sc = np.asarray(M.tuple_self_scores(
        g, jnp.asarray(spots), jnp.asarray(pos),
        invalid_i=inv_i, invalid_j=inv_j, invalid_ok=inv_ok))
    assert np.all(np.isfinite(sc))
    # controls are far apart -> the distance log-odds term rewards the
    # tight valid pairs: mean score must be clearly positive
    assert np.mean(sc) > 0.0
    sc_nc = np.asarray(M.tuple_self_scores(
        g, jnp.asarray(spots), jnp.asarray(pos)))
    assert np.all(np.isfinite(sc_nc))


def test_generate_random_invalid_pairs_only_invalid_bits():
    rng = RNG(2)
    n_bits = 6
    pair_region = -np.ones((n_bits, n_bits), np.int32)
    pair_region[0, 1] = pair_region[1, 0] = 7      # the only valid pair
    bit_index = rng.integers(0, n_bits, 600).astype(np.int32)
    valid = np.ones(600, bool)
    i, j = M.generate_random_invalid_pairs(bit_index, valid, pair_region,
                                           total_num=200, rng=rng)
    assert len(i) == 200 and len(j) == 200
    for a, b in zip(bit_index[i], bit_index[j]):
        lo, hi = min(a, b), max(a, b)
        assert pair_region[lo, hi] < 0


def test_channel_normalization_and_recentering():
    rng = RNG(3)
    n = 400
    spots = np.zeros((n, 11), np.float32)
    chan = (np.arange(n) % 3).astype(np.int32)
    base_int = np.array([100.0, 800.0, 300.0])
    spots[:, 0] = base_int[chan] * rng.uniform(0.5, 1.5, n)
    true_pos = rng.uniform(10, 50, (n, 3))
    shift = np.array([[0, 0, 0], [0.8, -0.5, 0.3], [-0.4, 0.2, -0.9]])
    spots[:, 1:4] = true_pos + shift[chan]
    valid = jnp.ones(n, bool)

    out = np.asarray(M.normalize_intensities_by_channel(
        jnp.asarray(spots), jnp.asarray(chan), valid, 3))
    for c in range(3):
        assert abs(out[chan == c, 0].mean() - 1.0) < 1e-3

    adj = np.asarray(M.adjust_spots_by_chromatic_center(
        jnp.asarray(spots), jnp.asarray(chan), valid, 3,
        ref_channel_idx=0))
    # every channel's centroid is forced onto the reference channel's
    c0 = adj[chan == 0, 1:4].mean(0)
    for c in (1, 2):
        assert np.allclose(adj[chan == c, 1:4].mean(0), c0, atol=1e-3)
    # and the synthetic shift was actually removed: adjusted channel-c
    # coords differ from their unshifted truth by a constant, not by
    # shift[c]
    resid = adj[chan == 1, 1:4] - true_pos[chan == 1]
    assert np.allclose(resid, resid.mean(0), atol=1e-4)
    assert not np.allclose(resid.mean(0), shift[1], atol=0.05)
    # channel 0 (reference) untouched
    assert np.allclose(adj[chan == 0, 1:4], spots[chan == 0, 1:4])


def test_find_coordinate_intensities_clamps_edges():
    rng = RNG(4)
    im = rng.uniform(0, 100, (8, 12, 12)).astype(np.float32)
    coords = np.array([[0.0, 0.0, 0.0], [4.0, 6.0, 6.0], [7.0, 11.0, 11.0]])
    got = np.asarray(PT.find_coordinate_intensities(
        jnp.asarray(im), jnp.asarray(coords, jnp.float32),
        search_radius=2))
    r = 2
    offs = np.indices([2 * r + 1] * 3).reshape(3, -1).T - r
    for k, c in enumerate(coords):
        base = np.round(c).astype(int)
        for p, o in enumerate(offs):
            q = np.clip(base + o, 0, np.array(im.shape) - 1)
            assert got[k, p] == im[q[0], q[1], q[2]]
