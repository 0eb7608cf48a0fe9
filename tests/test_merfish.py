"""MERFISH decoding on synthetic codebooks with planted tuples.

Behavior target: reference classes/decode.py Merfish_Decoder
(codebook pair tables :177-205, radius pair search :207-241, greedy
usage-capped tuple selection + completion :372-531).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from imageanalysis3_tpu.decode import merfish as M

PX = np.array([200.0, 108.0, 108.0])


def _random_codebook(rng, n_genes=14, n_bits=24, n_on=4):
    """Codebook of 4-on-bit codes with pairwise-disjoint bit pairs (so a
    pair uniquely identifies a gene), built by bounded greedy sampling."""
    codes, used_pairs = [], set()
    for _ in range(20000):
        if len(codes) >= n_genes:
            break
        on = tuple(sorted(rng.choice(n_bits, n_on, replace=False)))
        pairs = {(a, b) for ai, a in enumerate(on) for b in on[ai + 1:]}
        if pairs & used_pairs:
            continue
        used_pairs |= pairs
        codes.append(on)
    assert len(codes) >= 10, "codebook construction failed"
    m = np.zeros((len(codes), n_bits), np.int8)
    for g, on in enumerate(codes):
        m[g, list(on)] = 1
    return m


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(11)
    matrix = _random_codebook(rng)
    cb = M.build_codebook(matrix, ids=np.arange(len(matrix)) + 100)
    n_genes = len(matrix)

    spots, bits, truth = [], [], []
    # planted tuples: all on-bits of a gene clustered within ~120 nm
    for t in range(30):
        g = rng.integers(0, n_genes)
        center = rng.uniform(2000, 18000, 3)
        on_bits = cb.bit_values[matrix[g] > 0]
        first_idx = len(spots)
        for b in on_bits:
            pos = center + rng.normal(0, 40.0, 3)
            row = np.zeros(11)
            row[0] = rng.uniform(800, 2000)
            row[1:4] = pos / PX
            spots.append(row)
            bits.append(b)
        truth.append({"region": int(cb.ids[g]), "center": center,
                      "spot_range": (first_idx, len(spots))})
    # noise spots, far from everything
    for _ in range(150):
        row = np.zeros(11)
        row[0] = rng.uniform(500, 2500)
        row[1:4] = rng.uniform(25000, 60000, 3) / PX
        spots.append(row)
        bits.append(int(rng.integers(0, matrix.shape[1])))
    return cb, np.asarray(spots, np.float32), np.asarray(bits), truth


def test_build_codebook_pair_table():
    m = np.array([[1, 1, 1, 0], [0, 1, 1, 1]], np.int8)
    cb = M.build_codebook(m, ids=[5, 9])
    assert cb.pair_region[0, 1] == 5 and cb.pair_region[1, 0] == 5
    assert cb.pair_region[2, 3] == 9
    # shared pair (1,2): first code wins (reference first-seen dict insert)
    assert cb.pair_region[1, 2] == 5
    assert cb.pair_region[0, 3] == -1
    assert cb.n_on_bits == 3
    np.testing.assert_array_equal(cb.on_bits_of(9), [1, 2, 3])


def test_find_neighbors_radius_semantics():
    pos = jnp.asarray(np.array([[0, 0, 0], [0, 0, 100], [0, 0, 199],
                                [0, 0, 600]], np.float32))
    idx, ok = M.find_neighbors(pos, jnp.ones(4, bool), radius=250.0, k=3)
    nb0 = set(np.asarray(idx)[0][np.asarray(ok)[0]].tolist())
    assert nb0 == {1, 2}
    nb3 = np.asarray(ok)[3]
    assert not nb3.any()


def test_decode_recovers_planted_tuples(planted):
    cb, spots, bits, truth = planted
    dec = M.MerfishDecoder(cb)
    groups = dec.decode(spots, bits)
    ok = np.asarray(groups.ok)
    regions = np.asarray(groups.region)[ok]
    spot_idx = np.asarray(groups.spot_idx)[ok]
    n_sp = np.asarray(groups.n_spots)[ok]

    recovered = 0
    for t in truth:
        lo, hi = t["spot_range"]
        # a group counts as recovering this tuple if it decodes the right
        # region and >= 3 of its spots come from the planted range
        for reg, row in zip(regions, spot_idx):
            members = row[row >= 0]
            inside = np.sum((members >= lo) & (members < hi))
            if reg == t["region"] and inside >= 3:
                recovered += 1
                break
    assert recovered >= 0.9 * len(truth), f"only {recovered}/{len(truth)}"
    # completion upgraded pairs toward full 4-bit codes
    assert (n_sp >= 3).mean() >= 0.9


def test_decode_respects_max_usage(planted):
    cb, spots, bits, truth = planted
    dec = M.MerfishDecoder(cb)
    groups = dec.decode(spots, bits, max_usage=1)
    sel = np.asarray(groups.spot_idx)[np.asarray(groups.ok)]
    members = sel[sel >= 0]
    # no spot appears in two groups
    assert len(members) == len(np.unique(members))
